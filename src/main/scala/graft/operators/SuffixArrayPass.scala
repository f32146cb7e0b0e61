package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.config.GoldenConfig._
import graft.functions.TextHash.tokens

/** Generalized suffix-array substring pass (SURVEY §2 B6): find document
  * pairs sharing a run of >= l consecutive tokens — the reference-named
  * "suffix-array pass [that] catches long exact caption substring overlaps"
  * (BASELINE.json north_star). Two suffixes share an LCP >= l tokens iff
  * they share an exact l-token prefix, so the equal-LCP intervals of the
  * sorted suffix array are exactly the equal l-prefix groups.
  *
  * Spark shape (skew-safe): each suffix position is keyed by the HASH of
  * its l-token prefix (one rolling-hash kernel pass per doc — longs, not
  * strings, drive the shuffle and the join), the prefix-group self-join
  * runs through [[SkewSalting.selfJoinPairsVerified]] — a viral prefix
  * shared by millions of docs becomes `fanout` salted tasks instead of one
  * mega-partition — and EXACTNESS is preserved by verifying the actual
  * l-token prefix string within each hash bucket, so a 31-bit hash
  * collision can never emit a false pair. Semantics are therefore exactly
  * those of a suffix-array LCP>=l interval scan, and identical to
  * [[TextAnalysis.substringPairs]] up to that operator's (unverified)
  * hash-collision candidates — equality is unit-tested.
  */
object SuffixArrayPass {

  /** Distinct unordered (a, b) pairs of `idCol` values whose `textCol`
    * share >= l consecutive tokens. Output columns (a, b) keep the id type. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            l: Int = SubstringL,
            saltCap: Int = SaltCap, saltFanout: Int = SaltFanout): DataFrame = {
    // (id, gh = hash of the l-token prefix at i, pfx = the prefix string)
    // for every suffix position i; distinct per doc — a doc repeats a gram
    // only once per group
    val sfx = df.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= l)
      .select(col("id"), col("t"),
        posexplode(graft.functions.GraftExpressions.gramHashes(col("t"), l)))
      .select(col("id"), col("col").as("gh"),
        concat_ws(" ", slice(col("t"), col("pos") + 1, lit(l))).as("pfx"))
      .distinct()

    SkewSalting.selfJoinPairsVerified(sfx, Seq("gh"), "id", Seq("pfx"),
      saltCap, saltFanout)
  }
}
