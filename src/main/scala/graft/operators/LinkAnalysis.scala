package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Alias link-probability aggregation (SURVEY §2 A19 —
  * R:.../textmining/LinkAnalysis.scala counts, for every link alias, how
  * often it occurs as a link anchor vs as plain text, and keeps aliases
  * whose link probability clears a threshold).
  *
  * Spark shape: the alias dictionary (extracted link anchors) is orders of
  * magnitude smaller than the corpus, so it is broadcast; per-document
  * occurrence counting is a codegen'd length-difference expression (no
  * tokenization pass, no UDF). Integer milli-probabilities keep the result
  * oracle-exact.
  */
object LinkAnalysis {

  /** Occurrences of `pat` in `text` (non-overlapping, literal). */
  private def countOcc(text: org.apache.spark.sql.Column,
                       pat: org.apache.spark.sql.Column) =
    ((length(text) - length(replace(text, pat, lit("")))) / length(pat)).cast("long")

  /** @param links (alias) — one row per link OCCURRENCE (anchor text)
    * @param pages (textCol) — corpus pages/documents
    * @return (alias, n_links, n_occurrences, link_prob_millis) where
    *         n_occurrences counts every literal occurrence of the alias in
    *         the corpus (lowercased match) and
    *         link_prob_millis = n_links*1000 div max(n_occurrences, n_links)
    *         (an alias occurring only as links has probability 1000). */
  def linkProbability(pages: DataFrame, textCol: String, links: DataFrame,
                      aliasCol: String = "alias"): DataFrame = {
    val aliases = links
      .select(lower(col(aliasCol)).as("alias"))
      .groupBy("alias").agg(count(lit(1)).as("n_links"))
    val occ = pages.select(lower(col(textCol)).as("t"))
      .crossJoin(broadcast(aliases.select(col("alias"))))
      .select(col("alias"), countOcc(col("t"), col("alias")).as("occ"))
      .groupBy("alias").agg(sum(col("occ")).as("n_occurrences"))
    aliases.join(occ, Seq("alias"), "left")
      .select(col("alias"), col("n_links"),
        coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"))
      .withColumn("link_prob_millis",
        expr("(n_links * 1000) div greatest(n_occurrences, n_links)"))
  }
}
