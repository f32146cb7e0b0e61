package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's similarity-measure family re-expressed for Spark
  * (SURVEY.md §2 A29–A36; path-level citations, e.g.
  * R:.../deduplication/similarity/JaroWinkler.scala — standard published
  * formulas, unit-tested against the classic vectors).
  *
  * Set measures (Jaccard/Dice/Overlap) and RelativeNumbers are pure Column
  * expressions (codegen'd — these run on the hot verify path). Character
  * measures (Jaro-Winkler, Monge-Elkan) are pure-Scala + `udf` wrappers —
  * they only ever run on candidate pairs, never at scan scale.
  */
object SimilarityMeasures {

  // ---- Column (codegen) measures over array columns -----------------------

  /** ExactMatch (A29): 1.0 iff equal. */
  def exactMatch(a: Column, b: Column): Column =
    when(a === b, 1.0).otherwise(0.0)

  /** Jaccard (A32) over distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Dice-Sørensen (A33). */
  def dice(a: Column, b: Column): Column =
    lit(2.0) * size(array_intersect(a, b)) / (size(a) + size(b))

  /** Overlap coefficient (A34). */
  def overlap(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / least(size(a), size(b))

  /** RelativeNumbers (A35): min/max closeness of two non-negative numbers. */
  def relativeNumbers(a: Column, b: Column): Column =
    least(a, b).cast("double") / greatest(a, b)

  // ---- Pure Scala measures (verify-stage only) -----------------------------

  /** Jaro similarity — standard definition. */
  def jaro(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val (a, b) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    if (a.isEmpty) return 0.0
    val window = math.max(b.length / 2 - 1, 0)
    val bUsed = new Array[Boolean](b.length)
    val aMatch = new Array[Boolean](a.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bUsed(j) && a.charAt(i) == b.charAt(j)) {
          bUsed(j) = true; aMatch(i) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: compare matched chars in order
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatch(i)) {
        while (!bUsed(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler (A30): jaro + prefix boost (scale 0.1, prefix cap 4). */
  def jaroWinkler(s1: String, s2: String, prefixScale: Double = 0.1): Double = {
    val j = jaro(s1, s2)
    var l = 0
    val cap = math.min(4, math.min(s1.length, s2.length))
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * prefixScale * (1.0 - j)
  }

  /** Monge-Elkan (A31): mean over tokens of a of max inner sim vs tokens of b. */
  def mongeElkan(a: Seq[String], b: Seq[String],
                 inner: (String, String) => Double = jaroWinkler(_, _)): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else a.map(t => b.map(inner(t, _)).max).sum / a.length

  /** Weighted-mean score fold (A20): Σ w_i·s_i / Σ w_i over present scores. */
  def weightedMean(scores: Seq[(Double, Double)]): Double = {
    val wsum = scores.map(_._2).sum
    if (wsum == 0.0) 0.0 else scores.map { case (s, w) => s * w }.sum / wsum
  }

  // UDF wrappers (candidate pairs only — never on the full scan)
  val jaroWinklerUdf = udf((a: String, b: String) =>
    if (a == null || b == null) null.asInstanceOf[java.lang.Double]
    else java.lang.Double.valueOf(jaroWinkler(a, b)))
  val mongeElkanUdf = udf((a: Seq[String], b: Seq[String]) =>
    if (a == null || b == null) null.asInstanceOf[java.lang.Double]
    else java.lang.Double.valueOf(mongeElkan(a, b)))
}
