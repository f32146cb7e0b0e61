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

  "hllEstimate" should "estimate 5000 distinct keys within 5%" in {
    val df = (keys ++ keys.take(1234)).map(("g", _)).toDF("grp", "tok") // dups free
      .withColumn("h", graft.functions.TextHash.strHash(col("tok")))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "grp", col("h")))
      .collect().head.getDouble(1)
    est shouldBe 5000.0 +- 250.0
  }
}
