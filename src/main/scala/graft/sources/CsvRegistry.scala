package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delimited business-registry source (SURVEY §2 A6 — the reference imports
  * kompass-style CSV registries under R:.../dataimport/). Thin by design:
  * Spark's CSV datasource already does splittable parallel parsing; this
  * adds the reference's normalization conventions — header snake_casing and
  * whitespace-trimmed string cells — so downstream blocking keys are stable.
  */
object CsvRegistry {

  /** Read a header-ful delimited file with normalized column names
    * (lowercase, non-alphanumerics collapsed to `_`) and trimmed string
    * values. */
  def read(spark: SparkSession, path: String, sep: String = ","): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .csv(path)
    val renamed = raw.columns.foldLeft(raw) { (df, c) =>
      df.withColumnRenamed(c, normalizeName(c))
    }
    renamed.select(renamed.columns.map(c => trim(col(c)).as(c)): _*)
  }

  private[sources] def normalizeName(c: String): String =
    c.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_").stripPrefix("_").stripSuffix("_")
}
