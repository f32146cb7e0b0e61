package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ZOrderSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  // plain-Scala Morton reference
  private def morton(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L)((z, i) =>
      z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))

  "zKey" should "match the bit-interleave golden on known and random points" in {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0x5555L, 0xAAAAL), (70000L, 3L)) ++ // 70000 masks to 70000-65536
      (0 until 50).map(i => ((i * 7919L) % 65536, (i * 104729L) % 65536))
    val out = pts.toDF("a", "b").withColumn("z", ZOrder.zKey(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (a, b, z) => z shouldBe morton(a & 65535L, b & 65535L) }
  }

  it should "equal the per-bit fold formulation on random points" in {
    val pts = (0 until 500).map(i =>
      ((i * 48271L) % 70000, (i * 16807L) % 70000))
    val both = pts.toDF("a", "b")
      .withColumn("fast", ZOrder.zKey(col("a"), col("b")))
      .withColumn("slow", ZOrder.zKeyFold(col("a"), col("b")))
    both.where(col("fast") =!= col("slow")).count() shouldBe 0L
  }

  it should "keep spatially close points close in key order (locality)" in {
    // points on a 256x256 grid; a 16x16 query box should map to few key runs
    val pts = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val keyed = pts.map { case (x, y) => (x, y, morton(x, y)) }.sortBy(_._3)
    val inBox = keyed.zipWithIndex.filter { case ((x, y, _), _) =>
      x >= 64 && x < 80 && y >= 128 && y < 144 }
    // the 256 box points occupy ONE contiguous run for an aligned box
    val idxs = inBox.map(_._2)
    idxs.size shouldBe 256
    (idxs.max - idxs.min + 1) shouldBe 256
  }

  "cluster" should "range-partition by z with sorted partitions" in {
    val df = (0 until 1000).map(i => ((i * 37) % 256, (i * 91) % 256)).toDF("a", "b")
    val out = ZOrder.cluster(df, "a", "b", partitions = 4)
    out.rdd.getNumPartitions shouldBe 4
    // per-partition z ranges must not overlap and be internally sorted
    val parts = out.select("z").rdd.mapPartitionsWithIndex { (i, it) =>
      val zs = it.map(_.getLong(0)).toSeq
      if (zs.isEmpty) Iterator.empty
      else Iterator((i, zs.min, zs.max, zs == zs.sorted))
    }.collect().sortBy(_._1)
    parts.foreach(_._4 shouldBe true)
    parts.sliding(2).foreach {
      case Array((_, _, max1, _), (_, min2, _, _)) => max1 should be <= min2
      case _ =>
    }
  }
}
