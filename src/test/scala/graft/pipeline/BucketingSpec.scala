package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bucketed tables must make key-joins shuffle-free: the whole point of
  * writing the corpus-keyed artifacts bucketed is that later joins on the
  * key read co-located buckets instead of re-shuffling the corpus. */
class BucketingSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  "Bucketing" should "join two same-bucketed tables without any shuffle Exchange" in {
    val n = 10000L
    val left = spark.range(0L, n).select(col("id"), (col("id") % 97L).as("v"))
    val right = spark.range(0L, n, 2L).select(col("id"), (col("id") % 31L).as("w"))
    // force the shuffle-join path: at test scale the planner would
    // broadcast these tiny tables and never consult the bucket spec (at
    // corpus scale neither side broadcasts — that regime is the point)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(left, "bk_left", "id", 8)
      Bucketing.writeBucketed(right, "bk_right", "id", 8)

      val joined = Bucketing.read(spark, "bk_left")
        .join(Bucketing.read(spark, "bk_right"), "id")
      // correctness first
      joined.count() shouldBe n / 2
      // plan property: no Exchange anywhere — both sides read pre-hashed
      // buckets (an unbucketed join of these inputs shuffles both sides)
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange"

      // and a key-aggregation over one bucketed table is exchange-free too
      val agg = Bucketing.read(spark, "bk_left").groupBy("id").agg(sum("v"))
      agg.queryExecution.executedPlan.toString should not include "Exchange"

      // control: the same join over plain (unbucketed) data DOES shuffle —
      // proving the assertion above is the bucketing, not plan printing
      val plain = left.localCheckpoint().join(right.localCheckpoint(), "id")
      plain.queryExecution.executedPlan.toString should include("Exchange")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
