package graft.functions

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase
import graft.config.GoldenConfig

class GraftExtensionsSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  "GraftExtensions.register" should "expose the kernels as SQL functions" in {
    GraftExtensions.register(spark)
    spark.sql("SELECT graft_str_hash('abc') AS h").head().getLong(0) shouldBe 96354L
    val sig = spark.sql(
      "SELECT graft_minhash_shingles(split('one two three four', ' ')) AS sig")
      .head().getSeq[Long](0)
    sig should have length GoldenConfig.NumHashes
    // SQL path must equal the Column-API path exactly
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val viaColumn = Seq("one two three four").toDF("t")
      .select(GraftExpressions.minhashShingles(
        graft.functions.TextHash.tokens(col("t")), GoldenConfig.ShingleK))
      .head().getSeq[Long](0)
    sig shouldBe viaColumn
  }

  it should "register gram and shingle hash functions consistently" in {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_shingle_hashes(split('a b c d e', ' ')) AS sh,
                graft_gram_hashes(split('a b c d e f g h i', ' ')) AS gh""").head()
    r.getSeq[Long](0) should not be empty
    r.getSeq[Long](1) should have length 2 // 9 tokens, l=8 → 2 windows
  }

  it should "expose the bounded top-k aggregate in SQL" in {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 30L, 300L), (1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 50L))
      .toDF("g", "key", "id").createOrReplaceTempView("btk_in")
    val rows = spark.sql(
      "SELECT g, graft_bounded_topk(key, id, 2) AS top FROM btk_in GROUP BY g ORDER BY g")
      .collect()
    rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq((10L, 100L), (20L, 200L))
    rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq((5L, 50L))
  }

  "the extensions class" should "inject the same functions via SparkSessionExtensions" in {
    // the injection path is exercised directly against an extensions object
    // (a second SparkSession in one JVM would just return the shared one)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // registry construction must not throw and must carry all functions
    GraftExtensions.functions.map(_._1).toSet shouldBe Set(
      "graft_str_hash", "graft_minhash", "graft_minhash_shingles",
      "graft_shingle_hashes", "graft_gram_hashes",
      "graft_dot_f", "graft_hyperplane_bucket", "graft_bounded_topk")
  }

  it should "expose the ANN kernels in SQL" in {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot_f(array(CAST(1.0 AS float), CAST(2.0 AS float)),
                            array(CAST(3.0 AS float), CAST(4.0 AS float))) AS d,
                graft_hyperplane_bucket(array(CAST(0.5 AS float), CAST(-0.25 AS float))) AS b""")
      .head()
    r.getDouble(0) shouldBe 11.0
    r.getLong(1) should (be >= 0L and be < (1L << graft.config.GoldenConfig.AnnHyperplanes))
  }
}
