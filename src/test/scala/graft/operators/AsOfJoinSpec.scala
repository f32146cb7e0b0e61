package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase

class AsOfJoinSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  // (id, key, t) events; (key, t, okey, price) state rows
  private val left = Seq(
    (1L, 10L, 100L), // before any right row for key 10
    (2L, 10L, 205L), // between rights at 200 and 300
    (3L, 10L, 300L), // EXACTLY at a right row's time → visible
    (4L, 10L, 999L), // after everything
    (5L, 77L, 500L)  // key with no right rows at all
  ).toDF("event_id", "k", "t")

  private val right = Seq(
    (10L, 200L, 21L, 2.5), // two rights at the same (key, time):
    (10L, 200L, 22L, 9.0), //   the greater tie (okey 22) must win
    (10L, 300L, 31L, 7.0)
  ).toDF("k", "t", "okey", "price")

  "asOf" should "pick the latest right row at-or-before each left time with max-tie break" in {
    val out = AsOfJoin.asOf(left, right, "k", "t", "k", "t", "okey",
        Seq("okey", "price"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    out(1L) shouldBe ((None, None))            // no prior state
    out(2L) shouldBe ((Some(22L), Some(9.0)))  // equal-time tie → max okey
    out(3L) shouldBe ((Some(31L), Some(7.0)))  // right AT t is visible (≤)
    out(4L) shouldBe ((Some(31L), Some(7.0)))
    out(5L) shouldBe ((None, None))            // key absent from right
  }

  it should "preserve every left column and emit one row per left row" in {
    val out = AsOfJoin.asOf(left, right, "k", "t", "k", "t", "okey", Seq("okey"))
    out.columns.toSeq shouldBe Seq("event_id", "k", "t", "asof_okey")
    out.count() shouldBe left.count()
    out.select("event_id", "k", "t").collect().toSet shouldBe left.collect().toSet
  }
}
