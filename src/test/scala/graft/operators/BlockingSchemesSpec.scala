package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BlockingSchemesSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private val names = Seq(
    (1L, "Audi AG", 100.0),
    (2L, "audi motors", 250.0),
    (3L, "BMW Group", 199.99),
    (4L, "bmw", 200.0)
  ).toDF("id", "name", "price")

  "simpleKey" should "take the first n lowercased chars (short values whole)" in {
    val keys = names.select(BlockingSchemes.simpleKey(col("name")))
      .collect().map(_.getString(0))
    keys shouldBe Array("aud", "aud", "bmw", "bmw")
    Seq(("ab")).toDF("name").select(BlockingSchemes.simpleKey(col("name")))
      .head().getString(0) shouldBe "ab"
  }

  "lastLettersKey" should "take the last n lowercased chars (short values whole)" in {
    val keys = names.select(BlockingSchemes.lastLettersKey(col("name")))
      .collect().map(_.getString(0))
    keys shouldBe Array(" ag", "ors", "oup", "bmw")
    Seq(("ab")).toDF("name").select(BlockingSchemes.lastLettersKey(col("name")))
      .head().getString(0) shouldBe "ab"
  }

  "tokenKeys" should "emit one key per lowercased token" in {
    val keys = names.where(col("id") === 1)
      .select(explode(BlockingSchemes.tokenKeys(col("name"))))
      .collect().map(_.getString(0))
    keys shouldBe Array("audi", "ag")
  }

  "gridKey" should "band numeric values into cells" in {
    val keys = names.select(BlockingSchemes.gridKey(col("price"), 100.0))
      .collect().map(_.getString(0))
    keys shouldBe Array("1", "2", "1", "2")
  }

  "randomKey" should "be deterministic and bounded" in {
    val k1 = names.select(BlockingSchemes.randomKey(col("id")))
      .collect().map(_.getString(0))
    val k2 = names.select(BlockingSchemes.randomKey(col("id")))
      .collect().map(_.getString(0))
    k1 shouldBe k2
    all(k1.map(_.toInt)) should (be >= 0 and be < 100)
  }

  "blockingStatsOneScan" should "equal the per-scheme variant" in {
    val scalar = Seq(
      "simple" -> BlockingSchemes.simpleKey(col("name")),
      "grid" -> BlockingSchemes.gridKey(col("price"), 100.0))
    val list = Seq("list_token" -> BlockingSchemes.tokenKeys(col("name")))
    val perScheme = BlockingSchemes.blockingStats(names,
      scalar :+ ("list_token" -> explode(BlockingSchemes.tokenKeys(col("name")))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val oneScan = BlockingSchemes.blockingStatsOneScan(names, scalar, list)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    oneScan shouldBe perScheme
  }

  "groupBlocks" should "materialize sorted capped members with true block_size" in {
    val blocks = BlockingSchemes.groupBlocks(names,
      BlockingSchemes.simpleKey(col("name")), col("id"), maxMembers = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).sortBy(_._1)
    blocks shouldBe Array(
      ("aud", 2L, Seq(1L)),  // capped at 1 member, true size 2
      ("bmw", 2L, Seq(3L)))
  }

  "MinHashLsh.bandingFor" should "pick (b, r) whose threshold is nearest tau" in {
    val (b, r) = MinHashLsh.bandingFor(0.42, 128)
    (b * r) shouldBe 128
    // pinned config (32, 4) has threshold (1/32)^(1/4) ≈ 0.420 — must win
    (b, r) shouldBe ((32, 4))
    val (b2, r2) = MinHashLsh.bandingFor(0.9, 128)
    math.pow(1.0 / b2, 1.0 / r2) shouldBe 0.9 +- 0.12
  }

  "blockingStats" should "aggregate (scheme, bkey, block_size) across schemes" in {
    val stats = BlockingSchemes.blockingStats(names, Seq(
      "simple" -> BlockingSchemes.simpleKey(col("name")),
      "list_token" -> explode(BlockingSchemes.tokenKeys(col("name")))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    stats should contain(("simple", "aud", 2L))
    stats should contain(("simple", "bmw", 2L))
    stats should contain(("list_token", "bmw", 2L))
    stats should contain(("list_token", "group", 1L))
  }
}
