package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling for bucket self-joins (north rule: "explicit
  * salting/repartitioning of skewed LSH buckets").
  *
  * The reference's only skew control is dropping blocks larger than
  * maxBlockSize (R:.../deduplication/Blocking.scala, SURVEY §2 A10) — which
  * silently loses recall. Here oversized buckets keep ALL their pairs but
  * the quadratic work is spread over `fanout` salted sub-buckets:
  *
  * Pair-preserving self-join salting: each row in a hot bucket gets a
  * deterministic salt s ∈ [0, fanout); the left side keeps its salt, the
  * right side is replicated to every salt. The join key becomes
  * (bucket, salt_left) so one mega-bucket becomes `fanout` tasks, and every
  * pair (i, j) still meets exactly once (at s = salt(i)).
  *
  * Cold buckets take the fast path (no replication). AQE skew-join handles
  * residual imbalance (enabled in session conf).
  */
object SkewSalting {

  /** Distinct unordered pairs (a < b) of `idCol` values sharing the bucket
    * key columns, skew-salted.
    *
    * @param df       rows with bucket key columns + id column
    * @param keyCols  bucket key column names
    * @param idCol    orderable id column name
    * @param cap      bucket size above which salting kicks in
    * @param fanout   number of salt partitions for hot buckets
    */
  def selfJoinPairs(df: DataFrame, keyCols: Seq[String], idCol: String,
                    cap: Int, fanout: Int): DataFrame =
    selfJoinPairsVerified(df, keyCols, idCol, Nil, cap, fanout)

  /** Like [[selfJoinPairs]], but each pair must ALSO agree on `verifyCols` —
    * which are NOT part of the bucket/salt key. Use when the bucket key is a
    * hash and exactness requires comparing the underlying value within the
    * bucket (e.g. the suffix-array pass: bucket by l-gram HASH — longs
    * shuffle and compare cheaply — then verify the l-token prefix string
    * only against same-bucket rows, so a hash collision can never produce a
    * false pair). */
  def selfJoinPairsVerified(df: DataFrame, keyCols: Seq[String], idCol: String,
                            verifyCols: Seq[String], cap: Int, fanout: Int): DataFrame = {
    val keys = keyCols.map(col)
    val payload = verifyCols.map(col)
    // Hot-bucket detection as a window count over the bucket key: ONE
    // shuffle annotates every row with its bucket size (no groupBy+join
    // pass, no collect+broadcast, no extra driver action). Materialized
    // once (lazily) — reused by the cold join (both sides) and the hot
    // join; without this every consumer recomputes the whole upstream
    // signature pipeline.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    val flagged = df.select(keys ++ payload :+ col(idCol).as("id"): _*)
      .withColumn("hot", count(lit(1)).over(w) > cap)
      .localCheckpoint(false)

    val cold = flagged.where(!col("hot")).drop("hot")
    val coldPairs = pairJoin(cold, cold, keyCols, verifyCols)

    val hotRows = flagged.where(col("hot")).drop("hot")
    val salted = hotRows.withColumn("salt", pmod(xxhash64(col("id")), lit(fanout)))
    val replicated = hotRows
      .withColumn("salt", explode(sequence(lit(0L), lit(fanout - 1L))))
    val hotPairs = pairJoin(salted, replicated, keyCols :+ "salt", verifyCols)

    coldPairs.unionByName(hotPairs).dropDuplicates("a", "b")
  }

  private def pairJoin(l: DataFrame, r: DataFrame, joinCols: Seq[String],
                       verifyCols: Seq[String]): DataFrame = {
    val lhs = l.select(joinCols.map(col) ++
      verifyCols.map(c => col(c).as(s"${c}_l")) :+ col("id").as("a"): _*)
    val rhs = r.select(joinCols.map(col) ++
      verifyCols.map(c => col(c).as(s"${c}_r")) :+ col("id").as("b"): _*)
    val verified = verifyCols.foldLeft(lhs.join(rhs, joinCols)) { (d, c) =>
      d.where(col(s"${c}_l") === col(s"${c}_r"))
    }
    verified.where(col("a") < col("b")).select(col("a"), col("b"))
  }
}
