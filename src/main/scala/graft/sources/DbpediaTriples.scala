package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DBpedia N-Triples source (SURVEY §2 A5 —
  * R:.../dataimport/dbpedia/DBpediaImport.scala parses Turtle/N-Triples
  * dumps into subject-predicate-object rows).
  *
  * N-Triples is line-oriented (one triple per line), so the dump reads as
  * plain text at any scale; parsing is columnar regexp extraction. IRIs are
  * stripped of angle brackets; literal objects keep their lexical form with
  * optional language tag / datatype extracted to their own columns.
  */
object DbpediaTriples {

  private val TripleRe = """^\s*<([^>]+)>\s+<([^>]+)>\s+(.+?)\s*\.\s*$"""

  /** (subject, predicate, object_iri, object_literal, lang, datatype) —
    * exactly one of object_iri / object_literal is non-null per row.
    * Comment and blank lines are dropped. */
  def triples(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0 && !trim(col("value")).startsWith("#"))
      .select(
        regexp_extract(col("value"), TripleRe, 1).as("subject"),
        regexp_extract(col("value"), TripleRe, 2).as("predicate"),
        regexp_extract(col("value"), TripleRe, 3).as("obj"))
      .where(col("subject") =!= "")
      .select(
        col("subject"), col("predicate"),
        when(col("obj").startsWith("<"),
          regexp_extract(col("obj"), "^<([^>]+)>$", 1)).as("object_iri"),
        when(col("obj").startsWith("\""),
          regexp_extract(col("obj"), "^\"(.*)\"", 1)).as("object_literal"),
        regexp_extract(col("obj"), "^\".*\"@([a-zA-Z-]+)$", 1).as("lang"),
        regexp_extract(col("obj"), "\\^\\^<([^>]+)>$", 1).as("datatype"))
}
