package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AnnAndTextSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private def vecDf = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),  // closest to 0
    (2L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Seq(0.7f, 0.7f, 0.0f)),  // diagonal
    (4L, Seq(-1.0f, 0.0f, 0.0f))  // opposite
  ).toDF("id", "vec")

  "TextAnalysis.tokenCounts" should "count whitespace tokens and BPE-ish pretokens" in {
    val df = Seq((1L, "Don't panic, 3.14!"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenCounts(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // whitespace: [don't, panic,, 3.14!]; bpeish: don ' t panic , 3 . 14 !
    out(1L) shouldBe ((3L, 9L))
    out(2L)._2 shouldBe 0L
  }

  "bruteForceTopK" should "rank by cosine with id tiebreak" in {
    val out = AnnSearch.bruteForceTopK(vecDf, vecDf.where(col("id") === 0L), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(_._3).toSeq shouldBe Seq(1L, 3L, 2L, 4L)
  }

  it should "exclude the query row itself" in {
    val out = AnnSearch.bruteForceTopK(vecDf, vecDf.where(col("id") === 0L), k = 10)
    out.where(col("neighbor_id") === 0L).count() shouldBe 0L
  }

  "lshBuckets" should "give identical buckets to identical vectors and be deterministic" in {
    val dup = Seq((10L, Seq(0.5f, -0.25f, 0.8f)), (11L, Seq(0.5f, -0.25f, 0.8f))).toDF("id", "vec")
    val b = AnnSearch.lshBuckets(dup).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    b(10L) shouldBe b(11L)
    val again = AnnSearch.lshBuckets(dup).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    again shouldBe b
  }

  "ANN kernels" should "be bit-identical to the builtin oracle-mirror formulations on real embeddings" in {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // buckets: kernel vs builtin
    val kb = AnnSearch.lshBuckets(emb).withColumnRenamed("bucket", "kb")
    val bb = AnnSearch.lshBucketsBuiltin(emb).withColumnRenamed("bucket", "bb")
    kb.join(bb, "id").where(col("kb") =!= col("bb")).count() shouldBe 0L
    // dot: kernel vs builtin, bitwise on the double
    val pairs = emb.limit(20).select(col("id").as("a"), col("vec").as("va"))
      .crossJoin(emb.limit(20).select(col("id").as("b"), col("vec").as("vb")))
    val diff = pairs.select(
        AnnSearch.dot(col("va"), col("vb")).as("k"),
        AnnSearch.dotBuiltin(col("va"), col("vb")).as("s"))
      .where(col("k") =!= col("s")).count()
    diff shouldBe 0L
  }

  "nearDupPairs" should "pair near-identical vectors and skip distant bucket-mates" in {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.0f, 0.0f)),      // identical to 0 → same bucket, cos 1
      (2L, Seq(0.99f, 0.01f, 0.0f)),    // near-dup of 0
      (3L, Seq(-1.0f, 0.0f, 0.0f))      // opposite → different bucket
    ).toDF("id", "vec")
    val got = AnnSearch.nearDupPairs(corpus, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got should contain((0L, 1L))
    got.foreach { case (a, b) => Set(a, b) should not contain 3L }
  }

  "lshTopK" should "return the true nearest when buckets collide (identical vectors)" in {
    val out = AnnSearch.lshTopK(vecDf, vecDf.where(col("id") === 0L), k = 3)
      .collect().map(r => r.getLong(2))
    // LSH is approximate: but vector 1 (cos≈0.994) lands in 0's bucket w.h.p.
    out should contain(1L)
  }

  private def realEmb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Deterministic planted near-dup corpus in the PRODUCTION regime the
    * banded parameters are pinned for (GoldenConfig.AnnBandTables scaladoc):
    * `nBase` random unit-ish vectors (pairwise cosine ≈ 0, dim 32) plus one
    * jittered near-duplicate (cosine ≈ 0.93–0.98) for each of the first
    * `nDups` base vectors, planted at id = base_id + 100000. */
  private def plantedCorpus(nBase: Int = 300, nDups: Int = 100) = {
    val rnd = new scala.util.Random(graft.config.GoldenConfig.Seed)
    val dim = 32
    val base = (0 until nBase).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val dups = base.take(nDups).map { case (i, v) =>
      (i + 100000L, v.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    (base ++ dups).toDF("id", "vec")
  }

  // The testdata embeddings are an ADVERSARIAL regime for sign-bit LSH:
  // their max pairwise cosine is 0.47 against a cosine-0 background, so
  // p_signal/p_noise = 0.63/0.5 per plane and 0.95-recall candidate
  // generation would need thousands of tables (the math is in the
  // GoldenConfig.AnnBandTables scaladoc). The banded operator is asserted
  // in the production regime (planted cosine >= 0.9 dups) below; on the
  // real embeddings it is measured and reported for the record — round-3
  // readings: banded 0.62 vs single-table 0.09 recall@5.
  "lshTopKBanded" should "retrieve >= 95% of planted near-duplicates at rank 1" in {
    val corpus = plantedCorpus()
    val queries = corpus.where(col("id") >= 100000L)
    val nq = queries.count()
    val hits = AnnSearch.lshTopKBanded(corpus, queries)
      .where(col("rank") === 1L && col("neighbor_id") === col("query_id") - 100000L)
      .count()
    info(f"banded true-NN@1 recall = ${hits.toDouble / nq}%.3f ($hits/$nq)")
    hits.toDouble / nq should be >= 0.95
  }

  it should "beat the single-table path on the real (low-cosine) embeddings" in {
    val emb = realEmb
    val queries = emb.where(col("id") < 20)
    val brute = AnnSearch.bruteForceTopK(emb, queries)
      .select("query_id", "neighbor_id").localCheckpoint()
    val banded = AnnSearch.lshTopKBanded(emb, queries, tables = 16, planesPerTable = 4)
      .select("query_id", "neighbor_id")
    val single = AnnSearch.lshTopK(emb, queries).select("query_id", "neighbor_id")
    val total = brute.count()
    val hitBanded = brute.join(banded, Seq("query_id", "neighbor_id"), "left_semi").count()
    val hitSingle = brute.join(single, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(f"low-cosine regime recall@5: banded(16x4) = ${hitBanded.toDouble / total}%.3f ($hitBanded/$total), single(16) = ${hitSingle.toDouble / total}%.3f ($hitSingle/$total)")
    hitBanded should be > hitSingle
  }

  "nearDupPairsBanded" should "reach recall >= 0.95 of true cosine pairs at the production tau" in {
    val corpus = plantedCorpus()
    val tau = 0.85
    val l = corpus.select(col("id").as("a"), col("vec").as("va"))
    val r = corpus.select(col("id").as("b"), col("vec").as("vb"))
    val truth = l.crossJoin(r).where(col("a") < col("b"))
      .where(AnnSearch.cosine(col("va"), col("vb")) >= tau)
      .select("a", "b").localCheckpoint()
    val banded = AnnSearch.nearDupPairsBanded(corpus, tau = tau)
    val total = truth.count()
    val hit = truth.join(banded, Seq("a", "b"), "left_semi").count()
    info(f"banded near-dup recall = ${hit.toDouble / total}%.3f ($hit/$total of true pairs)")
    total should be >= 50L // the corpus really plants pairs above tau
    hit.toDouble / total should be >= 0.95
  }

  "ivfTopK" should "equal brute force when every list is probed (nprobe = nlist)" in {
    val emb = realEmb
    val queries = emb.where(col("id") < 10)
    val brute = AnnSearch.bruteForceTopK(emb, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = AnnSearch.ivfTopK(emb, queries, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    ivf shouldBe brute
  }

  it should "retrieve planted near-duplicates at rank 1 with few probes" in {
    val corpus = plantedCorpus()
    val queries = corpus.where(col("id") >= 100000L)
    val nq = queries.count()
    val hits = AnnSearch.ivfTopK(corpus, queries, nlist = 16, nprobe = 4)
      .where(col("rank") === 1L && col("neighbor_id") === col("query_id") - 100000L)
      .count()
    info(f"IVF true-NN@1 recall (nprobe 4/16) = ${hits.toDouble / nq}%.3f ($hits/$nq)")
    hits.toDouble / nq should be >= 0.95
  }

  "ivfTopKWith" should "serve a staged (parquet round-tripped) quantizer identically" in {
    val emb = realEmb
    val queries = emb.where(col("id") < 10)
    val fresh = AnnSearch.ivfTopK(emb, queries, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // stage the quantizer once, read it back, query against the snapshot —
    // the fixed-point centroids are bit-stable through the round trip
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    AnnSearch.ivfCentroids(emb, nlist = 8).write.parquet(s"$dir/cents")
    val staged = AnnSearch.ivfTopKWith(spark.read.parquet(s"$dir/cents"), emb, queries,
        nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    staged shouldBe fresh
  }

  "lshBucketsBanded" should "give table 0 buckets consistent with the offset-0 kernel" in {
    val emb = realEmb.limit(50)
    val t0 = AnnSearch.lshBucketsBanded(emb, tables = 1, planesPerTable = 16)
      .select(col("id"), col("bucket"))
    val single = AnnSearch.lshBuckets(emb, planes = 16).withColumnRenamed("bucket", "sb")
    t0.join(single, "id").where(col("bucket") =!= col("sb")).count() shouldBe 0L
  }

  "langId" should "be deterministic and emit a pinned-order guess" in {
    val d = Seq((0L, "the theory of things"), (1L, "xyz qqq")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    out(0L) shouldBe "en" // 'th' marker dominates
    out(1L) shouldBe "und" // no markers at all
  }

  "qualityScore" should "compute integer features and the quality flag" in {
    val d = Seq((0L, "the cat sat on the mat " * 4), (1L, "a a a a a a a a a a a a")).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    rows(1L).getAs[Boolean]("quality_ok") shouldBe false // all stopwords, no diversity
    rows(0L).getAs[Long]("n_tokens") should be >= 24L
  }

  "wordCount" should "count corpus and document frequencies" in {
    val d = Seq((0L, "a b a"), (1L, "a c")).toDF("doc_id", "text")
    val m = TextAnalysis.wordCount(d, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    m("a") shouldBe ((3L, 2L))
    m("b") shouldBe ((1L, 1L))
    m("c") shouldBe ((1L, 1L))
  }

  "nearDupPairsBandedAgainst" should "equal the cross-side subset of the banded self-join" in {
    val emb = realEmb
    val corpus = emb.where(col("id") % 4L =!= 0L)
    val delta = emb.where(col("id") % 4L === 0L)
    val cross = AnnSearch.nearDupPairsBandedAgainst(corpus, delta, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val self = AnnSearch.nearDupPairsBanded(emb, tau = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = self.collect {
      case (x, y) if x % 4 != 0 && y % 4 == 0 => (x, y)
      case (x, y) if x % 4 == 0 && y % 4 != 0 => (y, x)
    }
    cross shouldBe expected
    cross should not be empty // τ=0.3 has cross pairs in this corpus
  }

  "piiScrub" should "count and redact emails, IPs and phone-like runs in pinned order" in {
    val d = Seq(
      (1L, "contact bob.smith+spam@example.co.uk or 10.0.0.1 now"),
      (2L, "call +1 555 123-4567 today"),
      (3L, "nothing here"),
      (4L, "two mails a@b.io c@d.org and date 2020-01-01 03:04"),
      (5L, "mail 12345678901@example.com only") // digit local part: 1 email, 0 phones
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    out(1L) shouldBe ((1L, 1L, 0L, "contact <EMAIL> or <IP> now"))
    out(2L) shouldBe ((0L, 0L, 1L, "call <PHONE> today"))
    out(3L) shouldBe ((0L, 0L, 0L, "nothing here"))
    // dates over-redact as phone-like digit runs — deliberate (scaladoc):
    // a deterministic false positive beats a leaked number. The greedy
    // run extends through the space into "03" ("2020-01-01 03"), stopping
    // at the colon — identical leftmost-first greedy semantics in RE2.
    out(4L) shouldBe ((2L, 0L, 1L, "two mails <EMAIL> <EMAIL> and date <PHONE>:04"))
    // counts reconcile with tags: the 11-digit local part is ONE email and
    // ZERO phones (phones are counted after the email redaction)
    out(5L) shouldBe ((1L, 0L, 0L, "mail <EMAIL> only"))
  }

  "repetition" should "score the duplicate-gram share of templated text" in {
    val phrase = "one two three four five six seven eight" // exactly one 8-gram
    val d = Seq(
      (1L, s"$phrase $phrase $phrase"),                      // heavy repetition
      (2L, "all distinct tokens here make nine unique grams fine ok"),
      (3L, "short doc")                                      // < 8 tokens → absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Long]("rep_millis")))).toMap
    // doc 1: 24 tokens → 17 gram positions; the token sequence is periodic
    // with period 8, so gram(i) == gram(i+8) for every i — ALL 17
    // positions are duplicates (gram_0 occurs 3×, grams 1..7 occur 2×)
    out(1L) shouldBe ((17L, 17L, 1000L))
    out(2L) shouldBe ((3L, 0L, 0L))
    out.keySet should not contain 3L
  }

  "contamination" should "measure each eval doc's shared-gram share against the corpus" in {
    val leaked = "one two three four five six seven eight" // 8 tokens = exactly one 8-gram
    val corpus = Seq(
      (1L, s"prefix $leaked suffix words continue onward"),
      (2L, "totally unrelated corpus content with many various tokens inside")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, leaked),                                            // fully leaked
      (101L, "alpha beta gamma delta epsilon zeta eta theta"),   // clean
      (102L, "too short")                                        // < 8 tokens → no grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Long]("contam_millis")))).toMap
    out(100L) shouldBe ((1L, 1L, 1000L))
    out(101L) shouldBe ((1L, 0L, 0L))
    out.keySet should not contain 102L
  }

  "dupLineStats" should "score duplicate-line fraction over genuine newline-separated text" in {
    val d = Seq(
      (1L, "alpha beta\nalpha beta\ngamma delta\n\nalpha beta"), // 4 lines, 'alpha beta' ×3
      (2L, "no duplicate lines\nsecond line\nthird line"),
      (3L, "single line only"),
      (4L, "  \n \n"), // only blank lines → no rows emitted
      (5L, " padded \npadded\n") // trim makes these DUPLICATE lines
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupLineStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Long]("dup_line_millis")))).toMap
    out(1L) shouldBe ((4L, 2L, 500L)) // 4 non-empty lines, 2 beyond-first copies
    out(2L) shouldBe ((3L, 0L, 0L))
    out(3L) shouldBe ((1L, 0L, 0L))
    out.keySet should not contain 4L
    out(5L) shouldBe ((2L, 1L, 500L))
  }

  "dedupLinesAcrossCorpus" should "keep only each line's first corpus occurrence and reassemble" in {
    val d = Seq(
      (1L, "cookie banner\nunique one\ncookie banner"), // repeats within a doc too
      (2L, "cookie banner\nunique two"),
      (3L, "cookie banner"),                            // nothing survives → omitted
      (4L, " unique one \nfresh line")                  // trimmed copy of doc 1's line
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesAcrossCorpus(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getAs[Long]("n_dropped")))).toMap
    out(1L) shouldBe (("cookie banner\nunique one", 2L, 1L))
    out(2L) shouldBe (("unique two", 1L, 1L))
    out.keySet should not contain 3L
    out(4L) shouldBe (("fresh line", 1L, 1L))
  }

  it should "handle a viral boilerplate line without a window over its group" in {
    // 20k copies of one line across docs — the skew case the operator
    // exists for; first-occurrence selection must be a partial-aggregating
    // groupBy (one partial row per map task), never a Window over the line
    val d = spark.range(0L, 20000L).selectExpr("id AS doc_id",
      "concat('shared boilerplate\\nuniq ', id) AS text").repartition(16)
    val out = TextAnalysis.dedupLinesAcrossCorpus(d, "doc_id", "text")
    out.queryExecution.executedPlan.toString should not include "Window"
    val rows = out.collect()
    rows.length shouldBe 20000 // every doc keeps its unique line
    rows.count(_.getAs[Long]("n_dropped") == 0L) shouldBe 1 // only doc 0 keeps the shared line
    rows.map(_.getAs[Long]("n_kept")).sum shouldBe 20001L
  }

  "cleanLines" should "apply the C4 gates (word count, boilerplate phrase, terminal punctuation) per line" in {
    val d = Seq(
      (1L, "This is a proper sentence.\nok\nEnable JavaScript to continue!\nAnother good long line here."),
      (2L, "lorem ipsum dolor sit amet\nshort one\n"),
      (3L, "  \n \n"), // all blank → emits with empty text
      (4L, "no punctuation but five words\nAccept our cookie policy now.")
    ).toDF("doc_id", "text")
    // default gates: minWords 3, boilerplate substrings, no terminal gate
    val out = TextAnalysis.cleanLines(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getAs[Long]("n_dropped")))).toMap
    out(1L) shouldBe (("This is a proper sentence.\nAnother good long line here.", 2L, 2L))
    out(2L) shouldBe (("", 0L, 2L)) // lorem ipsum + under 3 words
    out(3L) shouldBe (("", 0L, 0L)) // blank lines never counted
    out(4L) shouldBe (("no punctuation but five words", 1L, 1L))
    // terminal-punctuation gate on: doc 4's unpunctuated line drops too
    val strict = TextAnalysis.cleanLines(d, "doc_id", "text", requireTerminal = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    strict(4L) shouldBe 0L
    strict(1L) shouldBe 2L
    // pure map-side plan: no shuffle, no join, no window
    val plan = TextAnalysis.cleanLines(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Window"
  }

  "dedupSpansAcrossCorpus" should "remove duplicated >=l-token runs from all but the first occurrence" in {
    val run10 = (1 to 10).map(i => s"r$i").mkString(" ")
    val d = Seq(
      (1L, s"$run10 tailone tailtwo"),                 // first occurrence — untouched
      (2L, s"head1 head2 $run10"),                     // later copy → the 10-token run drops
      (3L, "x1 x2 x3 r1 r2 r3 r4 r5"),                 // shares only a 5-token run → survives
      (4L, "a1 a2 a3 a4 a5 a6 a7 a8 mid a1 a2 a3 a4 a5 a6 a7 a8"), // intra-doc repeat
      (5L, "s1 s2")                                    // shorter than l → no grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpansAcrossCorpus(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getAs[Long]("n_removed")))).toMap
    out(1L) shouldBe ((s"$run10 tailone tailtwo", 12L, 0L))
    out(2L) shouldBe (("head1 head2", 12L, 10L))
    out(3L) shouldBe (("x1 x2 x3 r1 r2 r3 r4 r5", 8L, 0L))
    out(4L) shouldBe (("a1 a2 a3 a4 a5 a6 a7 a8 mid", 17L, 8L))
    out(5L) shouldBe (("s1 s2", 2L, 0L))
    // first-occurrence selection must be a partial-aggregating groupBy,
    // never a window over a viral gram group
    TextAnalysis.dedupSpansAcrossCorpus(d, "doc_id", "text")
      .queryExecution.executedPlan.toString should not include "Window"
  }

  "sq8Encode/sq8TopK" should "quantize to corpus-trained uint8 codes and rank by integer quantized dot" in {
    // per-dim ranges: mn=[0,0,0,7], mx=[1,10,10,7] — dim 4 degenerate
    val d = Seq(
      (0L, Array(0f, 0f, 10f, 7f)),
      (1L, Array(1f, 10f, 0f, 7f)),
      (2L, Array(0.5f, 5f, 5f, 7f)),
      (3L, Array(1f, 10f, 10f, 7f))).toDF("id", "vec")
    val codes = AnnSearch.sq8Encode(d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    codes(0L) shouldBe Seq(0L, 0L, 255L, 0L)
    codes(1L) shouldBe Seq(255L, 255L, 0L, 0L)
    codes(2L) shouldBe Seq(127L, 127L, 127L, 0L)   // 127.5 floors to 127
    codes(3L) shouldBe Seq(255L, 255L, 255L, 0L)
    // query 0 against the rest: qdot = 65025 (id3) > 32385 (id2) > 0 (id1)
    val top = AnnSearch.sq8TopK(d, d.where(col("id") === 0L), k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    top.sortBy(_._1) shouldBe Array((1L, 3L, 65025L), (2L, 2L, 32385L), (3L, 1L, 0L))
    // corpus side is never shuffled for scoring: the only Exchange feeds
    // the d-row range agg and the per-query window, not the code scan
    val plan = AnnSearch.sq8TopK(d, d.where(col("id") === 0L), k = 3)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastExchange") // ranges + query codes ride broadcasts
  }

  "gopherRules" should "gate each MassiveText rule independently with exact-integer thresholds" in {
    val good = "the cat sat and the dog ran with that have been seen here now"
    val d = Seq(
      (1L, good),                                          // passes everything
      (2L, "the of"),                                      // under minWords floor
      (3L, good + " ## ##"),                               // 4 '#' vs 16 words → 40 > 16 fails
      (4L, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n- nine\n- ten\nplain"),
      (5L, good + "\nwait for it...\nplain line"),         // 1/3 ellipsis-end > 30%
      (6L, good.split(" ").map(w => w + "7777777").mkString(" ")), // mean len > 10
      (7L, good + " 11 22 33 44 55"),                      // 5/18 non-alpha > 20%
      (8L, "cat dog bird tree rock lake sand wind fire snow rain leaf")) // no required stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(d, "doc_id", "text", minWords = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Boolean]("keep") shouldBe true
    out(2L).getAs[Boolean]("wordcount_ok") shouldBe false
    out(3L).getAs[Boolean]("symbol_ok") shouldBe false
    out(4L).getAs[Boolean]("bullet_ok") shouldBe false    // 10 of 11 lines > 90%
    out(5L).getAs[Boolean]("ellipsis_ok") shouldBe false
    out(6L).getAs[Boolean]("mean_len_ok") shouldBe false
    out(7L).getAs[Boolean]("alpha_ok") shouldBe false
    out(8L).getAs[Boolean]("stopword_ok") shouldBe false
    // every failing doc fails ONLY through keep=false, never dropped
    out.size shouldBe 8
    out.values.count(_.getAs[Boolean]("keep")) shouldBe 1
    // pure map-side plan: one codegen span, no shuffle, no join, no window
    val plan = TextAnalysis.gopherRules(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Window"
    plan should not include "Join"
  }

  "vocabCoverage" should "build the top-V vocab deterministically and score per-doc OOV share" in {
    val d = Seq(
      (1L, "a a a b b c"),
      (2L, "a b x y"),
      (3L, "") // empty text → one '' token
    ).toDF("doc_id", "text")
    // corpus counts: a=4, b=3, c=1, x=1, y=1, ''=1 → V=2 vocab {a, b}
    val out = TextAnalysis.vocabCoverage(d, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Long]("oov_millis")))).toMap
    out(1L) shouldBe ((6L, 1L, 166L))
    out(2L) shouldBe ((4L, 2L, 500L))
    out(3L) shouldBe ((1L, 1L, 1000L))
    // count-1 tie broken by token string: V=3 admits '' (sorts first)
    TextAnalysis.vocabCoverage(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("oov_millis")).toMap
      .apply(3L) shouldBe 0L
    // top-V must compile to the bounded per-task TakeOrdered (each task
    // keeps V rows), never a global sort of the token-count table
    val plan = TextAnalysis.vocabCoverage(d, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should not include "Sort [_cnt"
  }

  "normalizeUrl" should "collapse scheme/www/case/slash/fragment variants to one key" in {
    val variants = Seq(
      "https://www.Example.COM/Docs/A",
      "HTTP://example.com/Docs/A",
      "www.EXAMPLE.com/Docs/A/",
      "  example.com/Docs/A#section-2 ",
      "https://example.com/Docs/A///")
    val d = variants.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val norms = d.select(TextAnalysis.normalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSet
    norms shouldBe Set("example.com/Docs/A") // path case PRESERVED, host lowered
    // distinct addresses stay distinct
    val other = Seq((0L, "https://example.com/Docs/B"), (1L, "https://example.org/Docs/A"))
      .toDF("id", "url").select(TextAnalysis.normalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSet
    other shouldBe Set("example.com/Docs/B", "example.org/Docs/A")
    // host-only URLs (no path) lower entirely; bare trailing slash trims
    Seq((0L, "HTTPS://WWW.Example.COM/")).toDF("id", "url")
      .select(TextAnalysis.normalizeUrl(col("url")))
      .head().getString(0) shouldBe "example.com"
    // query strings: host cut stops at '?' (query case PRESERVED — tokens
    // are case-significant), and 'host/?q' collapses with 'host?q'
    val qs = Seq(
      (0L, "https://Example.COM?Sort=AZ"),
      (1L, "https://example.com/?Sort=AZ"),
      (2L, "WWW.EXAMPLE.COM?Sort=AZ"))
      .toDF("id", "url").select(TextAnalysis.normalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSet
    qs shouldBe Set("example.com?Sort=AZ")
    // distinct query case stays distinct
    Seq((0L, "example.com?sort=az")).toDF("id", "url")
      .select(TextAnalysis.normalizeUrl(col("url")))
      .head().getString(0) shouldBe "example.com?sort=az"
  }

  it should "collapse url-variant near-dups when used as a pre-collapse key" in {
    // the dedup-path use: exact grouping on the normalized key collapses
    // rows whose raw URLs differ only by normalization-invariant noise
    val rows = Seq(
      (1L, "https://www.Site.COM/page/1"),
      (2L, "http://site.com/page/1/"),
      (3L, "site.com/page/1#top"),
      (4L, "https://site.com/page/2")
    ).toDF("id", "url")
    val collapsed = rows
      .groupBy(TextAnalysis.normalizeUrl(col("url")).as("key"))
      .agg(count(lit(1)).as("n"), min("id").as("rep"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    collapsed("site.com/page/1") shouldBe ((3L, 1L))
    collapsed("site.com/page/2") shouldBe ((1L, 4L))
  }

  "AnnSearch.semanticDedup" should "match a plain-Scala union-find reference and keep the farthest-from-centroid member" in {
    // planted corpus: 3 tight groups around orthogonal directions (+ small
    // noise, within-group cosine ≈ 0.999) and 10 scattered loners
    val rnd = new scala.util.Random(7)
    val bases = Seq(0, 3, 6).map(d => Array.tabulate(8)(i => if (i == d) 1f else 0f))
    val planted = for {
      (b, gi) <- bases.zipWithIndex
      _ <- 0 until (6 - gi)
    } yield b.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f).toSeq
    val loners = Seq.fill(10)(Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq)
    val rows = (planted ++ loners).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "vec")
    val tau = 0.9

    val out = AnnSearch.semanticDedup(df, tau, nlist = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    // independent reference: same deterministic quantizer output, then a
    // plain-Scala cosine graph + union-find + keeper pick (identical
    // arithmetic: left-fold dot in index order, dot/√/√ division order)
    def dotS(a: collection.Seq[Float], b: collection.Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cosS(a: collection.Seq[Float], b: collection.Seq[Float]): Double =
      dotS(a, b) / math.sqrt(dotS(a, a)) / math.sqrt(dotS(b, b))
    val cents = AnnSearch.ivfCentroids(df, nlist = 3, iters = 2)
    val cvecs = cents.collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[collection.Seq[Float]]("cvec")).toMap
    val cid = AnnSearch.assignToCentroids(df, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vec = rows.toMap
    val ids = rows.map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- ids; b <- ids if a < b && cid(a) == cid(b) && cosS(vec(a), vec(b)) >= tau) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val groups = ids.groupBy(find)
    val expected = groups.flatMap { case (root, members) =>
      val keeper = members.minBy(i => (cosS(vec(i), cvecs(cid(i))), i))
      members.map(i => i -> ((root, i == keeper)))
    }
    out shouldBe expected

    // deterministic under any layout
    val again = AnnSearch.semanticDedup(df.repartition(7), tau, nlist = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    again shouldBe out

    // structural invariants: one keeper per group; planted groups survive as
    // non-trivial duplicate groups (at least one multi-member group exists)
    out.groupBy(_._2._1).foreach { case (_, m) => m.count(_._2._2) shouldBe 1 }
    out.groupBy(_._2._1).count(_._2.size > 1) should be >= 2
  }

  "pqTopK" should "retrieve planted near-duplicates at rank 1 through the 4-byte codes" in {
    // 64-dim corpus (PQ geometry: 8 subspaces x 8 dims) with planted dups
    val rnd = new scala.util.Random(graft.config.GoldenConfig.Seed)
    val base = (0 until 300).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
    val dups = base.take(80).map { case (i, v) =>
      (i + 100000L, v.map(x => x + 0.15f * rnd.nextGaussian().toFloat)) }
    val corpus = (base ++ dups).toDF("id", "vec")
    val queries = corpus.where(col("id") >= 100000L)
    val top = AnnSearch.pqTopK(corpus, queries)
    val hits = top.where(col("rank") === 1L &&
      col("neighbor_id") === col("query_id") - 100000L).count()
    info(f"PQ-ADC true-NN@1 recall = ${hits.toDouble / 80}%.3f ($hits/80)")
    hits.toDouble / 80 should be >= 0.9
    // exactly k rows per query, distances non-negative and rank-monotone
    top.groupBy("query_id").count().collect().foreach(_.getLong(1) shouldBe 5L)
    val byQ = top.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val ds = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      ds.foreach(_ should be >= 0L)
      ds.sliding(2).foreach { case Array(a, b) => a should be <= b; case _ => }
    }
  }

  "rrfFuse" should "fuse ranked lists by integer reciprocal-rank scores" in {
    // list A ranks: n1=1, n2=2; list B ranks: n2=1, n3=2
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val out = AnnSearch.rrfFuse(Seq(a, b), k = 3).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    def f(r: Long) = 1000000000L / (60L + r)
    out shouldBe Array(
      (1L, 20L, f(2) + f(1)), // in both lists → must win
      (2L, 10L, f(1)),
      (3L, 30L, f(2)))
  }

  it should "be layout-independent (repartitioned corpus gives identical ranks)" in {
    val emb = realEmb
    val q = emb.where(col("id") < 5)
    val a = AnnSearch.pqTopK(emb, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = AnnSearch.pqTopK(emb.repartition(13), q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    a shouldBe b
  }
}
