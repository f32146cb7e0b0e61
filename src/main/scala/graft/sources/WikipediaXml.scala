package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wikipedia XML dump source (SURVEY §2 A3 —
  * R:.../textmining/WikipediaImport.scala parses the MediaWiki dump into
  * page entities).
  *
  * Scale shape: the dump is read as TEXT split on `</page>` boundaries
  * (`lineSep` is handled by Hadoop's record reader, so a multi-TB dump
  * parallelizes by input split like any text file — no DOM, no whole-file
  * reads); each fragment yields one page via columnar regexp extraction.
  * This is the idiomatic Spark replacement for the reference's XML pull
  * parsing: the heavy lifting stays codegen'd column work.
  */
object WikipediaXml {

  /** Unescape the five predefined XML entities (amp last, so `&amp;lt;`
    * round-trips correctly). */
  def unescapeXml(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
      "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** (page_id, title, ns, text) — one row per `<page>`; revision text is the
    * latest revision's `<text>` body, XML-unescaped. Pages without a title
    * (trailing non-page fragment of the dump) are dropped. */
  def pages(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "</page>").text(path)
      .select(
        regexp_extract(col("value"), "(?s)<id>(\\d+)</id>", 1).as("id_s"),
        unescapeXml(regexp_extract(col("value"), "(?s)<title>(.*?)</title>", 1)).as("title"),
        regexp_extract(col("value"), "(?s)<ns>(\\d+)</ns>", 1).as("ns_s"),
        unescapeXml(regexp_extract(col("value"), "(?s)<text[^>]*>(.*?)</text>", 1)).as("text"))
      .where(col("title") =!= "")
      .select(
        col("id_s").cast("long").as("page_id"),
        col("title"),
        coalesce(col("ns_s").cast("int"), lit(0)).as("ns"),
        col("text"))
}
