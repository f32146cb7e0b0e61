package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alias link-probability aggregation (SURVEY §2 A19 —
  * R:.../textmining/LinkAnalysis.scala counts, for every link alias, how
  * often it occurs as a link anchor vs as plain text, and keeps aliases
  * whose link probability clears a threshold).
  *
  * Spark shape (scale path): the page × alias cross product is replaced by
  * a TOKEN-ANCHORED equi-join —
  *
  *  1. identical pages collapse to one row with a multiplicity `m`
  *     (occurrence counts of equal texts are equal; the same viral-collapse
  *     trick as the dedup pipeline's caption layer);
  *  2. each distinct page emits its DISTINCT punctuation-stripped tokens
  *     (tid, tok) — longs and short strings, never the page text;
  *  3. aliases join on their first punctuation-SURVIVING token — an
  *     equi-join any alias-dictionary size can take (the old broadcast
  *     cross-join did |pages| · |aliases| occurrence scans and required the
  *     dictionary to fit in memory); aliases with no surviving token fall
  *     back to the unanchored per-page count;
  *  4. only the surviving (page, alias) candidates fetch the page text and
  *     count occurrences — a codegen'd length-difference expression.
  *
  * Occurrence semantics: non-overlapping literal substring count per page
  * (unchanged) for every page that contains the alias's first token as a
  * whitespace token (punctuation-stripped, so "berlin," anchors "berlin").
  * Occurrences starting strictly INSIDE a word (alias "erlin" inside
  * "berlin") are no longer counted — link anchors are token sequences, so
  * the anchored count is the reference-faithful one. Skewed anchor tokens
  * (an alias starting with a stopword) lean on AQE skew-join; the candidate
  * volume itself is inherent to the query.
  *
  * Integer milli-probabilities keep the result oracle-exact.
  */
object LinkAnalysis {

  /** Occurrences of `pat` in `text` (non-overlapping, literal). */
  private def countOcc(text: Column, pat: Column) =
    ((length(text) - length(replace(text, pat, lit("")))) / length(pat)).cast("long")

  private val PunctClass = "[^\\p{L}\\p{N}]"

  /** @param links (alias) — one row per link OCCURRENCE (anchor text)
    * @param pages (textCol) — corpus pages/documents
    * @return (alias, n_links, n_occurrences, link_prob_millis) where
    *         n_occurrences counts literal occurrences of the alias in the
    *         corpus (lowercased, token-anchored — see scaladoc) and
    *         link_prob_millis = n_links*1000 div max(n_occurrences, n_links)
    *         (an alias occurring only as links has probability 1000). */
  def linkProbability(pages: DataFrame, textCol: String, links: DataFrame,
                      aliasCol: String = "alias"): DataFrame = {
    val aliases = links
      .select(lower(col(aliasCol)).as("alias"))
      .groupBy("alias").agg(count(lit(1)).as("n_links"))

    // identical pages collapse; tid pinned by the checkpoint (it feeds both
    // the token table and the text fetch-back — an unpinned
    // monotonically_increasing_id could diverge between the two consumers)
    val pg = pages.select(lower(col(textCol)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("m"))
      .withColumn("tid", monotonically_increasing_id())
      .localCheckpoint(false)

    val pageToks = pg.select(col("tid"), explode(array_distinct(
      transform(split(col("t"), " "),
        tk => regexp_replace(tk, PunctClass, "")))).as("tok"))
    // Anchor = first token that survives punctuation stripping. An alias
    // like "... foo" must anchor on "foo", not on the empty string the old
    // first-token strip produced (which silently matched ~nothing, ADVICE
    // r3). Aliases with NO surviving token (pure punctuation, e.g. "++")
    // fall back to the unanchored per-page scan: a cross join, but bounded
    // by how rare all-punctuation aliases are in any real link dictionary.
    val stripped = transform(split(col("alias"), " "),
      tk => regexp_replace(tk, PunctClass, ""))
    val nonEmptyToks = filter(stripped, tk => tk =!= lit(""))
    val withAnchor = aliases.withColumn("tok",
      when(size(nonEmptyToks) > 0, element_at(nonEmptyToks, 1)))
    val anchors = withAnchor.where(col("tok").isNotNull).select(col("alias"), col("tok"))
    val unanchored = withAnchor.where(col("tok").isNull).select(col("alias"))

    val cand = pageToks.join(anchors, "tok").select("tid", "alias")
      .union(unanchored.crossJoin(pg.select(col("tid"))).select("tid", "alias"))
    val occ = cand.join(pg, "tid")
      .select(col("alias"), (countOcc(col("t"), col("alias")) * col("m")).as("occ"))
      .groupBy("alias").agg(sum(col("occ")).as("n_occurrences"))

    aliases.join(occ, Seq("alias"), "left")
      .select(col("alias"), col("n_links"),
        coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"))
      .withColumn("link_prob_millis",
        expr("(n_links * 1000) div greatest(n_occurrences, n_links)"))
  }
}
