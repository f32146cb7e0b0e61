package graft.functions

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.SimilarityMeasures._

/** Standard published vectors (FIXTURES.md §4) — stand-ins for the
  * reference's similarity goldens until /root/reference is populated. */
class SimilarityMeasuresSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "jaroWinkler" should "reproduce the classic vectors" in {
    jaroWinkler("MARTHA", "MARHTA") shouldBe 0.9611 +- 0.0001
    jaroWinkler("DIXON", "DICKSONX") shouldBe 0.8133 +- 0.0001
    jaroWinkler("DWAYNE", "DUANE") shouldBe 0.84 +- 0.0001
    jaroWinkler("same", "same") shouldBe 1.0
    jaroWinkler("abc", "xyz") shouldBe 0.0
  }

  "jaro" should "handle empty and single-char strings" in {
    jaro("", "") shouldBe 1.0 // equal strings short-circuit
    jaro("", "a") shouldBe 0.0
    jaro("a", "a") shouldBe 1.0
  }

  "mongeElkan" should "be mean-of-max token similarity" in {
    mongeElkan(Seq("martha"), Seq("marhta")) shouldBe jaroWinkler("martha", "marhta")
    mongeElkan(Seq("a", "b"), Seq("a", "b")) shouldBe 1.0
    mongeElkan(Nil, Seq("a")) shouldBe 0.0
  }

  "weightedMean" should "combine per-attribute scores (A20)" in {
    weightedMean(Seq((1.0, 2.0), (0.5, 2.0))) shouldBe 0.75
    weightedMean(Nil) shouldBe 0.0
  }

  "set measures" should "match hand-computed values on 'a rose is a rose' shingles" in {
    import spark.implicits._
    // token sets: {a, rose, is} vs {a, rose, is, not}
    val df = Seq((Seq("a", "rose", "is"), Seq("a", "rose", "is", "not"))).toDF("x", "y")
    val r = df.select(
      jaccard(col("x"), col("y")).as("j"),
      dice(col("x"), col("y")).as("d"),
      overlap(col("x"), col("y")).as("o"),
      exactMatch(col("x"), col("y")).as("e")).head()
    r.getDouble(0) shouldBe 3.0 / 4.0
    r.getDouble(1) shouldBe 6.0 / 7.0
    r.getDouble(2) shouldBe 1.0
    r.getDouble(3) shouldBe 0.0
  }

  "relativeNumbers" should "be min/max" in {
    import spark.implicits._
    val r = Seq((32, 64)).toDF("w", "h")
      .select(relativeNumbers(col("w"), col("h"))).head().getDouble(0)
    r shouldBe 0.5
  }
}
