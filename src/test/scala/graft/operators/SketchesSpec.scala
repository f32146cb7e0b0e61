package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.config.GoldenConfig

class SketchesSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  // plain-Scala reference of the register algebra over host-side hashes
  private def refRegisters(keys: Seq[String]): Map[Long, Long] =
    keys.map { k =>
      val h = GoldenConfig.mix31(GoldenConfig.strHash(k))
      val w = h >> Sketches.HllP
      val rho = if (w == 0L) Sketches.HllMaxRho.toLong
                else java.lang.Long.numberOfTrailingZeros(w) + 1L
      (h % Sketches.HllRegisters, rho)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }

  private val keys = (0 until 5000).map(i => s"tok$i")

  "hllRegisters" should "match the plain-Scala register algebra" in {
    val df = keys.map(("g", _)).toDF("grp", "tok")
      .withColumn("h", graft.functions.TextHash.strHash(col("tok")))
    val regs = Sketches.hllRegisters(df, "grp", col("h"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    regs shouldBe refRegisters(keys)
  }

  it should "merge slices to exactly the whole-corpus registers and ignore duplicates" in {
    def regsOf(ks: Seq[String]) = Sketches.hllRegisters(
      ks.map(("g", _)).toDF("grp", "tok")
        .withColumn("h", graft.functions.TextHash.strHash(col("tok"))),
      "grp", col("h"))
    val (a, b) = keys.splitAt(2000)
    val merged = Sketches.hllMerge(regsOf(a), regsOf(b ++ a.take(500))) // overlap too
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    merged shouldBe refRegisters(keys)
  }

  "countMin" should "never underestimate and be exact for heavy hitters on a sparse sketch" in {
    // 3000 occurrences of "hot", 1..3 of 300 cold tokens
    val items = Seq.fill(3000)("hot") ++ (0 until 300).flatMap(i => Seq.fill(i % 3 + 1)(s"cold$i"))
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = items.toDF("tok")
      .withColumn("h", graft.functions.TextHash.strHash(col("tok")))
    val sketch = Sketches.countMin(df, col("h"))
    val probes = truth.keys.toSeq.toDF("probe")
      .withColumn("h", graft.functions.TextHash.strHash(col("probe")))
    val est = Sketches.cmEstimate(sketch, probes, "probe", "h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) => est(k) should be >= n } // CM guarantee
    est("hot") shouldBe 3000L // far above any collision noise at 4x4096
    // total mass per depth is the corpus size
    sketch.groupBy("d").agg(sum("cnt")).collect()
      .foreach(r => r.getLong(1) shouldBe items.size.toLong)
  }

  "hllEstimate" should "estimate 5000 distinct keys within 5%" in {
    val df = (keys ++ keys.take(1234)).map(("g", _)).toDF("grp", "tok") // dups free
      .withColumn("h", graft.functions.TextHash.strHash(col("tok")))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "grp", col("h")))
      .collect().head.getDouble(1)
    est shouldBe 5000.0 +- 250.0
  }
}
