package graft.streaming

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase
import java.sql.Timestamp

class StreamingDedupSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private val longText =
    "sunset harbor mountain forest river skyline meadow lantern bridge garden temple market"

  "dropExactDuplicates" should "keep first arrival per normalized text" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingDedup.dropExactDuplicates(df, "doc_id", "text", "ts")
    val q = out.writeStream.format("memory").queryName("sdd_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "A photo", Timestamp.valueOf("2020-01-01 00:00:00")),
        (2L, "a PHOTO", Timestamp.valueOf("2020-01-01 00:00:01")), // exact dup after lower()
        (3L, "different", Timestamp.valueOf("2020-01-01 00:00:02")))
      q.processAllAvailable()
      val ids = spark.table("sdd_out").select("doc_id").collect().map(_.getLong(0)).toSet
      ids should have size 2
      ids should contain(3L)
      (ids should contain).oneOf(1L, 2L)
    } finally q.stop()
  }

  it should "evict state past the watermark (re-arrival after expiry is new)" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF().toDF("doc_id", "text", "ts")
    val out = StreamingDedup.dropExactDuplicates(df, "doc_id", "text", "ts",
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdd_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: first arrival of T
      mem.addData((1L, "dup text", Timestamp.valueOf("2020-01-01 00:00:00")))
      q.processAllAvailable()
      // batch 2: duplicate inside the dedup window → dropped
      mem.addData((2L, "dup text", Timestamp.valueOf("2020-01-01 00:00:05")))
      q.processAllAvailable()
      // batch 3: advance the watermark far past T's expiry
      // (wm = 00:30 - 10min = 00:20 > 00:00 + 10min ⇒ T's state evicted)
      mem.addData((3L, "advance", Timestamp.valueOf("2020-01-01 00:30:00")))
      q.processAllAvailable()
      // batch 4: T re-arrives AFTER expiry → must be treated as NEW
      mem.addData((4L, "dup text", Timestamp.valueOf("2020-01-01 00:25:00")))
      q.processAllAvailable()
      val ids = spark.table("sdd_evict").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      ids should contain(1L)
      ids should not contain 2L   // dedup inside the window works
      ids should contain(3L)
      ids should contain(4L)      // state was actually evicted
    } finally q.stop()
  }

  "nearDupWithinStream" should "pair colliding arrivals and remember state across batches" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupWithinStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("snds_out")
      .outputMode(OutputMode.Append()).start()
    // NOTE: processAllAvailable() can block forever on a
    // ProcessingTimeTimeout stateful query (timeout checks keep batches
    // flowing), so assertions poll with a deadline instead.
    def pairsSeen(): Set[(String, String)] =
      spark.table("snds_out").select("a", "b").distinct()
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def awaitPair(p: (String, String), deadlineMs: Long = 60000): Unit = {
      val t0 = System.currentTimeMillis()
      while (!pairsSeen().contains(p)
        && System.currentTimeMillis() - t0 < deadlineMs) Thread.sleep(300)
    }
    try {
      mem.addData((1L, longText), (3L, "totally unrelated words that never collide at all"))
      // second batch: near-identical doc must pair with doc 1 remembered in state
      mem.addData((2L, longText + " extra"))
      awaitPair(("1", "2"))
      val pairs = pairsSeen()
      pairs should contain(("1", "2"))
      pairs.foreach { case (a, b) => Set(a, b) should not contain "3" }
    } finally q.stop()
  }

  "nearDupAgainstCorpus" should "flag band collisions against a static corpus" in {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, longText)).toDF("doc_id", "text")
    val corpusBands = graft.operators.MinHashLsh.bands(
      graft.operators.MinHashLsh.signatures(
        graft.operators.MinHashLsh.shingleTable(corpus, "doc_id", "text")))
    val mem = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupAgainstCorpus(
      mem.toDF().toDF("doc_id", "text"), corpusBands, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("sndc_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, longText), (2L, "totally unrelated words here that do not match at all"))
      q.processAllAvailable()
      val rows = spark.table("sndc_out").select("id", "corpus_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rows shouldBe Set((1L, 100L))
    } finally q.stop()
  }

  "nearDupAgainstCorpusSnapshot" should "collide with the folded band snapshot the batch import stages" in {
    implicit val sqlCtx = spark.sqlContext
    // the snapshot shape IncrementalImageDedup persists as inc_corpus_bands
    val corpus = Seq((100L, longText)).toDF("cid", "caption")
    val folded = graft.operators.MinHashLsh.bands(
        graft.operators.MinHashLsh.signaturesFromText(corpus, "cid", "caption"))
      .select((col("band_idx") * lit(graft.config.GoldenConfig.P) + col("band_hash")).as("bucket"),
        col("id"))
    val mem = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupAgainstCorpusSnapshot(
      mem.toDF().toDF("doc_id", "text"), folded, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("sndcs_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, longText), (2L, "totally unrelated words here that do not match at all"))
      q.processAllAvailable()
      val rows = spark.table("sndcs_out").select("id", "corpus_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rows shouldBe Set((1L, 100L))
    } finally q.stop()
  }

  "windowedIngestStats" should "aggregate per tumbling window with duplicate-aware distinct counts" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.windowedIngestStats(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", "doc_id")
    val q = out.writeStream.format("memory").queryName("wis_out")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        (1L, Timestamp.valueOf("2024-01-01 10:00:05"), "a"),
        (1L, Timestamp.valueOf("2024-01-01 10:00:20"), "a dup id"),
        (2L, Timestamp.valueOf("2024-01-01 10:00:40"), "b"),
        (3L, Timestamp.valueOf("2024-01-01 10:01:10"), "c"))
      q.processAllAvailable()
      val rows = spark.table("wis_out")
        .groupBy("window_start").agg(max("n_rows").as("n"), max("n_ids_approx").as("d"))
        .collect().map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getLong(2))).toMap
      rows("2024-01-01 10:00:00.0") shouldBe ((3L, 2L)) // 3 rows, 2 distinct ids
      rows("2024-01-01 10:01:00.0") shouldBe ((1L, 1L))
    } finally q.stop()
  }

  "the corpus-band view" should "show absorbed deltas to the stream (generation-aware)" in {
    implicit val sqlCtx = spark.sqlContext
    // batch side: import a delta whose caption the corpus has NEVER seen,
    // then absorb it — only after the absorb may a stream of that caption
    // collide with the corpus view (IncrementalImageDedup.corpusBands)
    val dir = java.nio.file.Files.createTempDirectory("snd_absorb").toString
    val all = graft.images.SyntheticImages.generate(spark, 200L).toDF().localCheckpoint()
    val idNum = expr("cast(substring(image_id, 5) as bigint)")
    val corpus = all.where(idNum % 20 < 18).localCheckpoint()
    val freshCaption = longText + " with brand new trailing tokens absent from the corpus"
    val delta = all.where(idNum % 20 >= 18)
      .withColumn("caption", lit(freshCaption)).localCheckpoint()
    val c0 = graft.pipeline.ImageDedupPipeline.runDirect(spark, corpus).localCheckpoint()
    graft.pipeline.IncrementalImageDedup.run(spark, corpus, c0, delta,
      new graft.pipeline.StageCheckpoint(spark, dir), "d1").count()

    var nq = 0
    def collisions(): Set[String] = {
      nq += 1
      val mem = MemoryStream[(String, String)] // string ids — the corpus side's are image ids
      val out = StreamingDedup.nearDupAgainstCorpusSnapshot(
        mem.toDF().toDF("doc_id", "text"),
        graft.pipeline.IncrementalImageDedup.corpusBands(
          new graft.pipeline.StageCheckpoint(spark, dir)),
        "doc_id", "text")
      val q = out.writeStream.format("memory").queryName(s"snd_abs_$nq")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(("stream_1", freshCaption))
        q.processAllAvailable()
        spark.table(s"snd_abs_$nq").select("corpus_id").distinct()
          .collect().map(_.getString(0)).toSet
      } finally q.stop()
    }

    collisions() shouldBe empty // generation 0 predates the delta
    graft.pipeline.IncrementalImageDedup.absorb(spark,
      new graft.pipeline.StageCheckpoint(spark, dir), "d1") shouldBe 1
    val post = collisions() // generation 1 carries the delta's bands
    post should not be empty
    // every collision is with a DELTA row (ids "img_NNN", NNN % 20 >= 18)
    post.foreach(id => (id.stripPrefix("img_").toLong % 20) should be >= 18L)
  }
}
