package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wikidata JSON dump source (SURVEY §2 A4 —
  * R:.../dataimport/wikidata/WikidataImport.scala reads the entity dump).
  *
  * The dump is one JSON entity per line wrapped in a giant array
  * (`[`, `{...},`, `{...}`, `]`) — so it is read as TEXT (line-splittable at
  * any scale), array/comma framing is stripped with column functions, and
  * entities are parsed with an EXPLICIT schema via from_json (no sampling
  * pass over 100 TB to infer a schema).
  */
object WikidataJson {

  /** Subset of the entity schema the dedup/linking pipeline needs. */
  val entitySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("labels", MapType(StringType,
      StructType(Seq(StructField("language", StringType),
        StructField("value", StringType))))),
    StructField("aliases", MapType(StringType,
      ArrayType(StructType(Seq(StructField("language", StringType),
        StructField("value", StringType)))))),
    StructField("sitelinks", MapType(StringType,
      StructType(Seq(StructField("site", StringType),
        StructField("title", StringType)))))))

  /** (id, entity_type, label_en, aliases_en, n_sitelinks) per entity. */
  def entities(spark: SparkSession, path: String): DataFrame = {
    val framed = spark.read.text(path)
      .select(regexp_replace(trim(col("value")), ",$", "").as("line"))
      .where(col("line").startsWith("{")) // drops the [ ] framing lines
    framed
      .select(from_json(col("line"), entitySchema).as("e"))
      .where(col("e.id").isNotNull)
      .select(
        col("e.id").as("id"),
        col("e.type").as("entity_type"),
        col("e.labels")("en")("value").as("label_en"),
        transform(coalesce(col("e.aliases")("en"),
          array().cast("array<struct<language:string,value:string>>")),
          a => a("value")).as("aliases_en"),
        coalesce(size(map_keys(col("e.sitelinks"))), lit(0)).as("n_sitelinks"))
  }
}
