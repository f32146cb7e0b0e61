package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GoldenConfig._
import graft.functions.TextHash.tokens

/** Generalized suffix-array substring pass (SURVEY §2 B6): find document
  * pairs sharing a run of >= l consecutive tokens by sorting all token
  * suffixes and scanning equal-LCP intervals — the reference-named
  * "suffix-array pass [that] catches long exact caption substring overlaps"
  * (BASELINE.json north_star).
  *
  * Spark shape: explode token suffixes (prefix-capped), hash-partition by
  * the l-token prefix (an interval with LCP >= l is exactly an equal
  * l-prefix interval at token granularity, so no interval ever straddles a
  * partition), sortWithinPartitions, then ONE partition-local sorted scan
  * in mapPartitions — the only imperative per-partition code in the engine
  * (everything else is Catalyst-planned).
  *
  * Semantics are provably identical to [[TextAnalysis.substringPairs]]
  * (the l-gram equi-join): a common >=l-token run exists iff some l-gram is
  * shared iff two suffixes share an l-token prefix. The equi-join is the
  * high-throughput path (salted, AQE-planned); this operator exists for the
  * suffix-array semantics of the north rule and as the base for LCP-style
  * extensions. Equality of the two is unit-tested.
  */
object SuffixArrayPass {

  /** Distinct unordered (a, b) pairs of `idCol` values whose `textCol`
    * share >= l consecutive tokens. Output columns (a, b) keep the id type. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            l: Int = SubstringL): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType

    // (prefix = l tokens from position i, id) for every suffix position
    val sfx = df.select(col(idCol).cast("string").as("id"), tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= l)
      .select(col("id"),
        explode(transform(sequence(lit(0), size(col("t")) - l),
          i => concat_ws(" ", slice(col("t"), i + 1, lit(l))))).as("pfx"))
      .distinct()

    // all rows of one LCP>=l interval share pfx → hash-partitioning by pfx
    // keeps intervals partition-local; the scan below is then exact
    val scanned: Dataset[(String, String)] = sfx
      .repartition(col("pfx"))
      .sortWithinPartitions(col("pfx"), col("id"))
      .select(col("pfx"), col("id")).as[(String, String)]
      .mapPartitions { it =>
        // sorted scan: emit pairs within each equal-prefix interval
        new Iterator[(String, String)] {
          private var curPfx: String = null
          private val group = scala.collection.mutable.ArrayBuffer.empty[String]
          private var pending: Iterator[(String, String)] = Iterator.empty
          private def flush(): Iterator[(String, String)] = {
            val out = for {
              i <- group.indices.iterator
              j <- (i + 1) until group.size
            } yield (group(i), group(j))
            val materialized = out.toVector.iterator
            group.clear()
            materialized
          }
          private def advance(): Unit = {
            while (!pending.hasNext && it.hasNext) {
              val (pfx, id) = it.next()
              if (pfx != curPfx) { pending = flush(); curPfx = pfx }
              group += id
            }
            if (!pending.hasNext && !it.hasNext && group.nonEmpty) pending = flush()
          }
          def hasNext: Boolean = { advance(); pending.hasNext }
          def next(): (String, String) = { advance(); pending.next() }
        }
      }

    scanned.toDF("x", "y")
      .select(col("x").cast(idType).as("xa"), col("y").cast(idType).as("yb"))
      .select(least(col("xa"), col("yb")).as("a"), greatest(col("xa"), col("yb")).as("b"))
      .where(col("a") =!= col("b"))
      .dropDuplicates("a", "b")
  }
}
