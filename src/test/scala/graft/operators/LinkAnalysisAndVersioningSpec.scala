package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase
import java.sql.Timestamp

class LinkAnalysisAndVersioningSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  "linkProbability" should "compute links / corpus occurrences in millis" in {
    // "berlin": 2 link occurrences, appears 4x in the corpus → 500 millis
    // "acme": 1 link, 1 occurrence → 1000 millis
    val links = Seq("Berlin", "berlin", "ACME").toDF("alias")
    val pages = Seq(
      (1L, "berlin is big; berlin has history"),
      (2L, "visit Berlin or berlin"),
      (3L, "acme builds things")
    ).toDF("page_id", "text")
    val got = LinkAnalysis.linkProbability(pages, "text", links)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("link_prob_millis"))).sortBy(_._1)
    got shouldBe Array(
      ("acme", 1L, 1L, 1000L),
      ("berlin", 2L, 4L, 500L))
  }

  it should "cap probability at 1000 when links outnumber plain occurrences" in {
    val links = Seq("ghost", "ghost").toDF("alias")
    val pages = Seq((1L, "no mention here")).toDF("page_id", "text")
    val got = LinkAnalysis.linkProbability(pages, "text", links).head()
    got.getAs[Long]("n_occurrences") shouldBe 0L
    got.getAs[Long]("link_prob_millis") shouldBe 1000L
  }

  it should "anchor multi-token aliases and punctuation-adjacent occurrences" in {
    val links = Seq("New York", "New York").toDF("alias")
    val pages = Seq(
      (1L, "i love new york and new york loves me"),   // 2 occurrences
      (2L, "new york, the big apple"),                 // "york," token still anchors
      (3L, "newer yorkshire has no match")             // anchor token "newer" != "new"
    ).toDF("page_id", "text")
    val r = LinkAnalysis.linkProbability(pages, "text", links).head()
    r.getAs[Long]("n_occurrences") shouldBe 3L
    r.getAs[Long]("link_prob_millis") shouldBe 666L // 2*1000 div 3
  }

  it should "anchor on the first punctuation-SURVIVING token and fall back for all-punct aliases" in {
    // "... rust": first token strips empty → anchor must be "rust", and the
    // occurrence count is of the full literal alias (ADVICE r3: the old code
    // anchored on "" and collapsed n_occurrences to 0 / prob to 1000).
    // "++": no token survives stripping → unanchored per-page scan.
    val links = Seq("... rust", "++", "++").toDF("alias")
    val pages = Seq(
      (1L, "we write ... rust here and ... rust there"), // 2 literal occurrences
      (2L, "rust without the dots"),                     // anchors but 0 literal occ
      (3L, "c++ has ++ and ++ again")                    // 3 "++" occurrences
    ).toDF("page_id", "text")
    val got = LinkAnalysis.linkProbability(pages, "text", links)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("link_prob_millis"))).sortBy(_._1)
    got shouldBe Array(
      ("++", 2L, 3L, 666L),
      ("... rust", 1L, 2L, 500L))
  }

  it should "multiply occurrence counts of identical (collapsed) pages" in {
    val links = Seq("dup").toDF("alias")
    val pages = Seq((1L, "dup text dup"), (2L, "dup text dup"), (3L, "other")).toDF("page_id", "text")
    LinkAnalysis.linkProbability(pages, "text", links)
      .head().getAs[Long]("n_occurrences") shouldBe 4L
  }

  "Versioning.history" should "cap the version array for a hot entity but keep exact count and current" in {
    val hot = (1 to 500).map(i =>
      (9L, Timestamp.valueOf(f"2020-01-01 00:${i / 60}%02d:${i % 60}%02d"), s"v$i"))
    val df = (hot :+ ((10L, Timestamp.valueOf("2020-01-01 00:00:01"), "solo"))).toDF("entity_id", "ts", "name")
    val got = Versioning.history(df, "entity_id", "ts", "name", maxVersions = 16)
      .collect().map(r => (r.getLong(0),
        r.getSeq[org.apache.spark.sql.Row](1).size, r.getLong(2), r.getString(3))).sortBy(_._1)
    got shouldBe Array((9L, 16, 500L, "v500"), (10L, 1, 1L, "solo"))
  }

  "Versioning.history" should "order versions by ts and expose the current value" in {
    val df = Seq(
      (1L, Timestamp.valueOf("2020-01-02 00:00:00"), "v2"),
      (1L, Timestamp.valueOf("2020-01-01 00:00:00"), "v1"),
      (1L, Timestamp.valueOf("2020-01-03 00:00:00"), "v3"),
      (2L, Timestamp.valueOf("2020-01-01 00:00:00"), "only")
    ).toDF("entity_id", "ts", "name")
    val got = Versioning.history(df, "entity_id", "ts", "name")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).sortBy(_._1)
    got shouldBe Array((1L, 3L, "v3"), (2L, 1L, "only"))
  }

  "Versioning.versionSummary" should "report first/last/current by (ts, tie) order" in {
    val df = Seq(
      (7L, Timestamp.valueOf("2020-01-01 00:00:00"), 100L, "a", 10L),
      (7L, Timestamp.valueOf("2020-01-01 00:00:00"), 101L, "b", 20L), // same ts → tie on id
      (7L, Timestamp.valueOf("2020-02-01 00:00:00"), 50L, "c", 30L)
    ).toDF("user_id", "ts", "event_id", "event_type", "value_c")
    val r = Versioning.versionSummary(df, "user_id", "ts", "event_id",
      Seq("event_type", "value_c")).head()
    r.getAs[Long]("n_versions") shouldBe 3L
    r.getAs[Long]("first_event_id") shouldBe 100L
    r.getAs[Long]("last_event_id") shouldBe 50L   // later ts wins over id
    r.getAs[String]("cur_event_type") shouldBe "c"
    r.getAs[Long]("cur_value_c") shouldBe 30L
  }
}
