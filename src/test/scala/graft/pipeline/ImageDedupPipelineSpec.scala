package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.images.SyntheticImages
import graft.Main
import java.nio.file.Files

/** End-to-end north-rule checks on the synthetic input_hint table:
  * dup-pair recall >= 0.99 per planted class, precision guards, and
  * checkpoint/resume semantics. */
class ImageDedupPipelineSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val n = 600L
  private lazy val dir = Files.createTempDirectory("graft_pipe_spec").toString
  private lazy val input = SyntheticImages.generate(spark, n).toDF().localCheckpoint()
  private lazy val clusters = {
    val ckpt = new StageCheckpoint(spark, dir)
    ImageDedupPipeline.run(spark, input, ckpt).localCheckpoint()
  }
  private lazy val truth = SyntheticImages.truth(spark, n).toDF().localCheckpoint()

  "pipeline" should "achieve dup-pair recall >= 0.99 overall (target: 1.0)" in {
    val (recall, total, hit) = Main.pairRecall(clusters, truth)
    withClue(s"hit=$hit total=$total") { recall should be >= 0.99 }
  }

  it should "catch every planted class (D0 exact, D1 caption, D2 substring, D3 image)" in {
    val joined = truth
      .join(clusters.select(col("image_id").as("a"), col("cluster_id").as("ca")), "a")
      .join(clusters.select(col("image_id").as("b"), col("cluster_id").as("cb")), "b")
    val perClass = joined.groupBy("cls")
      .agg(count(lit(1)).as("total"),
        sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("hit"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    perClass.keySet shouldBe Set("D0", "D1", "D2", "D3")
    for ((cls, (total, hit)) <- perClass) withClue(s"class $cls: ") { hit shouldBe total }
  }

  it should "not merge viral same-caption different-image rows (precision)" in {
    val viral = input.where(col("caption") === "photo of a photo").select("image_id")
    val merged = clusters.join(viral, "image_id")
      .groupBy("cluster_id").count().where(col("count") > 1).count()
    merged shouldBe 0L
    viral.count() should be >= 5L // fixture actually present
  }

  it should "not merge unrelated base rows (precision)" in {
    // negatives: rows m in 0..6, different blocks — cluster sizes must be
    // exactly 1 + their planted dups (max 5: base + D0 + D1 + D2 + D3)
    clusters.groupBy("cluster_id").count().where(col("count") > 5).count() shouldBe 0L
  }

  it should "emit every input row exactly once (per-row invariant)" in {
    clusters.count() shouldBe n
    clusters.select("image_id").distinct().count() shouldBe n
  }

  it should "resume from checkpoints without recomputing (same result)" in {
    clusters.count() // force first full run
    val manifest1 = new StageCheckpoint(spark, dir).manifest().size
    val resumed = ImageDedupPipeline.run(spark, input, new StageCheckpoint(spark, dir))
    val again = resumed.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val orig = clusters.collect().map(r => (r.getString(0), r.getString(1))).toSet
    again shouldBe orig
    // no new manifest entries — every stage was served from its snapshot
    new StageCheckpoint(spark, dir).manifest().size shouldBe manifest1
  }

  it should "record per-partition lineage metrics for every stage" in {
    clusters.count()
    val metrics = spark.read.parquet(s"$dir/_metrics/*")
    metrics.columns.toSet shouldBe Set("stage", "partition_id", "rows")
    metrics.select("stage").distinct().count() should be >= 7L
  }

  "the annotated window pass" should "plan ONE exchange for both window mins" in {
    // the scale claim behind s1_annotated: hash partitioning on caption
    // satisfies the (caption, bytes_hash) clustering, so the cid and rep
    // windows share a single shuffle — pinned here so a Spark upgrade or
    // refactor that silently doubles the exchange fails loudly
    import org.apache.spark.sql.expressions.Window
    // repartition forces a real multi-partition input (a single-split range
    // would satisfy any clustering trivially, hiding the window exchanges)
    val input = SyntheticImages.generate(spark, 200L).toDF().repartition(4)
    val annotated = input
      .select(col("image_id"), lower(col("caption")).as("caption"),
        col("phash"), xxhash64(col("bytes")).as("bytes_hash"))
      .withColumn("cid", min("image_id").over(Window.partitionBy("caption")))
      .withColumn("rep", min("image_id").over(
        Window.partitionBy("caption", "bytes_hash")))
    val plan = annotated.queryExecution.executedPlan.toString
    // exactly 2: the explicit repartition + ONE hashpartitioning(caption)
    // serving BOTH windows — a third exchange means the reuse broke
    "(?i)exchange".r.findAllIn(plan).size shouldBe 2
    plan should include("hashpartitioning(caption")
  }

  "generator" should "be deterministic across invocations" in {
    val a = SyntheticImages.generate(spark, 100).toDF()
      .select(col("image_id"), xxhash64(col("bytes"), col("caption")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = SyntheticImages.generate(spark, 100).toDF()
      .select(col("image_id"), xxhash64(col("bytes"), col("caption")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a shouldBe b
  }
}
