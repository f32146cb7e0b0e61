package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RangeJoinSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private val chunk = 100L

  // (pid, key, t) points; (iid, key, start, end) intervals
  private val points = Seq(
    (1L, 7L, 150L),  // inside [100, 200)
    (2L, 7L, 100L),  // AT start → included
    (3L, 7L, 200L),  // AT end → excluded
    (4L, 7L, 95L),   // chunk 0 probing an interval starting in chunk 1? no — before start
    (5L, 7L, 249L),  // inside the boundary-crossing [160, 260)
    (6L, 9L, 150L),  // right time, wrong key
    (7L, 7L, -42L),  // negative time inside [-50, 50)
    (8L, 7L, 55L)    // in no interval
  ).toDF("pid", "k", "t")

  private val intervals = Seq(
    (10L, 7L, 100L, 200L),
    (11L, 7L, 160L, 260L), // crosses the 100-boundary: needs both chunks
    (12L, 7L, -50L, 50L)   // negative start: floor-division chunking
  ).toDF("iid", "ik", "s", "e")

  "pointInInterval" should "match the brute-force inequality join with half-open bounds" in {
    val out = RangeJoin.pointInInterval(points, "k", "t", intervals, "ik", "s", "e", chunk)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.crossJoin(intervals)
      .where(col("k") === col("ik") && col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out shouldBe brute
    out should contain((2L, 10L))  // start inclusive
    out should not contain ((3L, 10L)) // end exclusive
    out should contain((5L, 11L))  // interval crossing a chunk boundary
    out should contain((7L, 12L))  // negative-time chunking
    out.map(_._1) should not contain 6L
  }

  it should "fail loudly on an interval longer than the chunk" in {
    val bad = Seq((20L, 7L, 0L, 150L)).toDF("iid", "ik", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "k", "t", bad, "ik", "s", "e", chunk)
        .count()
    }
    ex.getMessage should include("longer than chunk")
  }
}
