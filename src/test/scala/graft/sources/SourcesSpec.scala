package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** Import-source specs (SURVEY §2 A3/A4/A5/A6). Fixtures are tiny
  * dump fragments written to a temp dir by the test itself — the formats
  * are public (MediaWiki XML, Wikidata JSON array-of-entities, N-Triples,
  * CSV); the parse shape is what matters: splittable text reads +
  * columnar extraction, no DOM / no schema inference. */
class SourcesSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_sources")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  "WikipediaXml" should "parse pages from a dump fragment (multi-line text, entities)" in {
    val dump =
      """<mediawiki><siteinfo><sitename>Wikipedia</sitename></siteinfo>
        |<page>
        |  <title>Alan Turing</title>
        |  <ns>0</ns>
        |  <id>42</id>
        |  <revision><id>9000</id><text bytes="64">Computing pioneer &amp; cryptanalyst.
        |Multi-line body.</text></revision>
        |</page>
        |<page>
        |  <title>AT&amp;T</title>
        |  <ns>0</ns>
        |  <id>7</id>
        |  <revision><text>Telecom &lt;corp&gt;.</text></revision>
        |</page>
        |</mediawiki>""".stripMargin
    val path = write("dump.xml", dump)
    val rows = WikipediaXml.pages(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    rows should have length 2
    rows(0) shouldBe ((7L, "AT&T", 0, "Telecom <corp>."))
    rows(1)._2 shouldBe "Alan Turing"
    rows(1)._4 should include("pioneer & cryptanalyst")
    rows(1)._4 should include("Multi-line body.")
  }

  "WikipediaXml pages" should "feed the dedup engine end to end" in {
    val run = "one two three four five six seven eight nine ten eleven twelve"
    val dump =
      s"""<mediawiki>
         |<page><title>A</title><ns>0</ns><id>1</id><revision><text>$run same ending here</text></revision></page>
         |<page><title>B</title><ns>0</ns><id>2</id><revision><text>$run same ending now</text></revision></page>
         |<page><title>C</title><ns>0</ns><id>3</id><revision><text>nothing shared with the others at all whatsoever</text></revision></page>
         |</mediawiki>""".stripMargin
    val path = write("dedup_dump.xml", dump)
    val pages = WikipediaXml.pages(spark, path)
    val edges = graft.operators.MinHashLsh.dedupEdges(pages, "page_id", "text")
    val clusters = graft.operators.ConnectedComponents.run(spark, edges,
      Some(pages.select(org.apache.spark.sql.functions.col("page_id").as("id"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters(1L) shouldBe clusters(2L)
    clusters(3L) should not be clusters(1L)
  }

  "WikidataJson" should "parse entities from an array dump with explicit schema" in {
    val dump =
      """[
        |{"id":"Q42","type":"item","labels":{"en":{"language":"en","value":"Douglas Adams"}},"aliases":{"en":[{"language":"en","value":"DNA"}]},"sitelinks":{"enwiki":{"site":"enwiki","title":"Douglas Adams"},"dewiki":{"site":"dewiki","title":"Douglas Adams"}}},
        |{"id":"P31","type":"property","labels":{"en":{"language":"en","value":"instance of"}}}
        |]""".stripMargin
    val path = write("wikidata.json", dump)
    val rows = WikidataJson.entities(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getSeq[String](3), r.getInt(4))).sortBy(_._1)
    rows should have length 2
    rows(0) shouldBe (("P31", "property", "instance of", Seq(), 0))
    rows(1) shouldBe (("Q42", "item", "Douglas Adams", Seq("DNA"), 2))
  }

  "DbpediaTriples" should "parse IRIs and literals from N-Triples" in {
    val nt =
      """# comment line
        |<http://dbpedia.org/resource/Berlin> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://dbpedia.org/ontology/City> .
        |<http://dbpedia.org/resource/Berlin> <http://www.w3.org/2000/01/rdf-schema#label> "Berlin"@de .
        |<http://dbpedia.org/resource/Berlin> <http://dbpedia.org/ontology/population> "3644826"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |
        |""".stripMargin
    val path = write("triples.nt", nt)
    val rows = DbpediaTriples.triples(spark, path)
      .collect()
      .map(r => (r.getString(1), Option(r.getString(2)), Option(r.getString(3)),
        r.getString(4), r.getString(5)))
      .sortBy(_._1)
    rows should have length 3
    val byPred = rows.groupBy(_._1)
    byPred("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").head._2 shouldBe
      Some("http://dbpedia.org/ontology/City")
    val label = byPred("http://www.w3.org/2000/01/rdf-schema#label").head
    label._3 shouldBe Some("Berlin")
    label._4 shouldBe "de"
    val pop = byPred("http://dbpedia.org/ontology/population").head
    pop._3 shouldBe Some("3644826")
    pop._5 shouldBe "http://www.w3.org/2001/XMLSchema#integer"
  }

  "CsvRegistry" should "normalize headers and trim cells" in {
    val csv =
      """Company Name; Postal-Code ;City
        | ACME GmbH ;10115; Berlin
        |Widget AG;80331;Munich
        |""".stripMargin
    val path = write("registry.csv", csv)
    val df = CsvRegistry.read(spark, path, sep = ";")
    df.columns shouldBe Array("company_name", "postal_code", "city")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    rows(0) shouldBe (("ACME GmbH", "10115", "Berlin"))
    rows(1) shouldBe (("Widget AG", "80331", "Munich"))
  }

  it should "snake_case odd header names" in {
    CsvRegistry.normalizeName(" Company  (Legal) Name ") shouldBe "company_legal_name"
  }
}
