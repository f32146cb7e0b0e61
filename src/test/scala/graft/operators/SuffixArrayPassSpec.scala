package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase

class SuffixArrayPassSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  "SuffixArrayPass" should "equal the l-gram equi-join on real documents" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaSa = SuffixArrayPass.pairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaGram = TextAnalysis.substringPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    viaSa shouldBe viaGram
    viaSa should not be empty
  }

  it should "find pairs with shared runs and skip short overlaps" in {
    val run8 = "one two three four five six seven eight"
    val d = Seq(
      (10L, s"alpha beta gamma $run8 tail tokens here"),
      (20L, s"$run8 completely different continuation words"),
      (30L, "one two three four five only shares five tokens x y z"),
      (40L, "nothing in common whatsoever with the others at all")
    ).toDF("doc_id", "text")
    val got = SuffixArrayPass.pairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((10L, 20L))
  }

  it should "handle an interval with many members (all pairs emitted)" in {
    val run = "a b c d e f g h"
    val d = (0L until 6L).map(i => (i, s"prefix$i $run suffix$i")).toDF("doc_id", "text")
    val got = SuffixArrayPass.pairs(d, "doc_id", "text").count()
    got shouldBe 15L // C(6,2)
  }

  it should "survive a viral prefix (salted path ≡ unsalted, no mega-partition)" in {
    // 1,000 docs all sharing one 8-token run — the exact skew shape that
    // used to land a whole LCP interval on one partition. With cap forced
    // below the group size the salted path must emit every C(1000,2) pair.
    val run = "v1 v2 v3 v4 v5 v6 v7 v8"
    val d = (0L until 1000L).map(i => (i, s"doc$i $run tail$i")).toDF("doc_id", "text")
    val salted = SuffixArrayPass.pairs(d, "doc_id", "text",
      saltCap = 64, saltFanout = 8).count()
    salted shouldBe 499500L // C(1000,2)
  }

  it should "verify prefix strings within a hash bucket (collisions never pair)" in {
    // Force a fake collision: same gram-hash bucket can only pair docs whose
    // actual l-token prefix strings are equal — distinct strings that
    // happened to share a 31-bit hash must NOT pair. We can't synthesize a
    // real 31-bit collision cheaply, so assert the contract on the operator
    // SkewSalting.selfJoinPairsVerified directly with a forced shared key.
    val rows = Seq(
      (1L, 42L, "one two three"),
      (2L, 42L, "one two three"),   // same bucket, same string → pair
      (3L, 42L, "four five six")    // same bucket, different string → no pair
    ).toDF("id", "gh", "pfx")
    val got = SkewSalting.selfJoinPairsVerified(rows, Seq("gh"), "id", Seq("pfx"),
      cap = 4096, fanout = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 2L))
  }

  it should "work with string ids" in {
    val run = "p q r s t u v w"
    val d = Seq(("img_b", s"$run x"), ("img_a", s"$run y")).toDF("image_id", "caption")
    val got = SuffixArrayPass.pairs(d, "image_id", "caption")
      .collect().map(r => (r.getString(0), r.getString(1)))
    got shouldBe Array(("img_a", "img_b"))
  }
}
