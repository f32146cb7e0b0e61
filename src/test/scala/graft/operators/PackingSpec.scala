package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Sequence packing: the bounded two-level prefix sum must equal the
  * single-window reference exactly — offsets, chunk ranges, empty docs,
  * bucket boundaries, any layout. */
class PackingSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private def norm(d: org.apache.spark.sql.DataFrame) =
    d.select("id", "n_tokens", "tok_offset", "chunk_first", "chunk_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  "Packing.sequencePack" should "equal the window formulation (random sizes, any layout)" in {
    val rnd = new scala.util.Random(7071)
    (1 to 3).foreach { trial =>
      // sparse non-contiguous ids; sizes include 0
      val rows = (0 until 300).map(i =>
        (i.toLong * 3L + rnd.nextInt(3), rnd.nextInt(40).toLong))
        .distinctBy(_._1)
      val df = rows.toDF("doc_id", "n_tokens").repartition(7)
      withClue(s"trial $trial") {
        norm(Packing.sequencePack(df, "doc_id", "n_tokens", ctxLen = 64L)) shouldBe
          norm(Packing.sequencePackWindow(df, "doc_id", "n_tokens", ctxLen = 64L))
      }
    }
  }

  it should "equal the window formulation on HASHED sparse 63-bit ids" in {
    // the id shape that broke the old `id div 2^16` bucketing (round-5
    // verdict): nearly every row in its own bucket — the range-partition
    // formulation must stay balanced AND exact
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 500).map { _ =>
      (rnd.nextLong() & Long.MaxValue, rnd.nextInt(40).toLong)
    }.distinctBy(_._1)
    val df = rows.toDF("doc_id", "n_tokens").repartition(5)
    norm(Packing.sequencePack(df, "doc_id", "n_tokens", ctxLen = 64L)) shouldBe
      norm(Packing.sequencePackWindow(df, "doc_id", "n_tokens", ctxLen = 64L))
  }

  it should "assign chunk ranges that tile the token stream" in {
    val df = Seq((1L, 100L), (2L, 0L), (3L, 2000L), (4L, 50L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.sequencePack(df, "doc_id", "n_tokens", ctxLen = 1024L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    out(0) shouldBe ((1L, 0L, 0L, 0L))      // tokens [0, 100)
    out(1) shouldBe ((2L, 100L, 0L, 0L))    // empty doc sits at its offset
    out(2) shouldBe ((3L, 100L, 0L, 2L))    // [100, 2100) spans chunks 0..2
    out(3) shouldBe ((4L, 2100L, 2L, 2L))
  }
}
