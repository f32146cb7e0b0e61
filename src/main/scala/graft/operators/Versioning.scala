package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Entity version history (SURVEY §2 A39 — the reference tracks per-field
  * version history with TimeUUID-stamped Version objects,
  * R:.../datalake/models/Version.scala). Spark-native re-expression:
  * versions are the time-ordered change rows of an entity; the history is a
  * window aggregation, the version id is the deterministic (ts, tieCol)
  * order — reproducible across engines, unlike random TimeUUIDs.
  */
object Versioning {

  /** Ordered (ts, value) history per entity as an array column plus the
    * current value: (id, versions: array<struct<ts,value>>, n_versions,
    * current). `sort_array` orders by ts then value — deterministic.
    *
    * The materialized array is CAPPED at `maxVersions` per entity (the
    * capped-keep treatment [[BlockingSchemes.groupBlocks]] got — a hot
    * entity with millions of edits must not produce an unbounded row);
    * `n_versions` reports the TRUE count and `current` is exact regardless
    * of the cap (max over (ts, value) structs — the same ordering as
    * sort_array's last element). */
  def history(df: DataFrame, idCol: String, tsCol: String, valueCol: String,
              maxVersions: Int = 10000): DataFrame =
    df.groupBy(col(idCol).as("id"))
      .agg(
        slice(sort_array(collect_list(struct(col(tsCol).as("ts"),
          col(valueCol).as("value")))), 1, maxVersions).as("versions"),
        count(lit(1)).as("n_versions"),
        max(struct(col(tsCol).as("ts"), col(valueCol).as("value"))).as("cur"))
      .select(col("id"), col("versions"), col("n_versions"),
        col("cur")("value").as("current"))

  /** Flat version summary per entity — first/last version by (tsCol,
    * tieCol) order plus the current values of `valueCols`. Integer/window
    * only, so it carries a DuckDB oracle (q32). */
  def versionSummary(df: DataFrame, idCol: String, tsCol: String, tieCol: String,
                     valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col(tsCol), col(tieCol))
    val n = Window.partitionBy(idCol)
    val base = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("nv", count(lit(1)).over(n))
    val curs = valueCols.map(c =>
      max(when(col("rn") === col("nv"), col(c))).as(s"cur_$c"))
    base.groupBy(col(idCol))
      .agg(max(col("nv")).as("n_versions"),
        (max(when(col("rn") === 1L, col(tieCol))).as(s"first_$tieCol") +:
          max(when(col("rn") === col("nv"), col(tieCol))).as(s"last_$tieCol") +:
          curs): _*)
  }
}
