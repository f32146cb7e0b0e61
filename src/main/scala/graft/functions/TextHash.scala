package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.config.GoldenConfig._

/** Column-level text/hash primitives for the dedup engine.
  *
  * Everything here is built from `org.apache.spark.sql.functions` only —
  * whole-stage-codegen friendly, no UDFs on the hot path — and uses the
  * pure mod-P integer arithmetic from [[graft.config.GoldenConfig]] so the
  * DuckDB oracle can reproduce results exactly.
  *
  * Reference semantics (path-level, SURVEY.md §2): tokenization ≈
  * R:.../textmining/tokenizer (lowercase whitespace tokens, A27);
  * n-gram shingles ≈ the n-gram input of
  * R:.../deduplication/similarity/Jaccard.scala.
  */
object TextHash {

  private val pL = lit(P)

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct k-token shingles as space-joined strings; empty array when the
    * doc has fewer than k tokens (guards Spark's descending `sequence`). */
  def shingles(toks: Column, k: Int = ShingleK): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Polynomial rolling hash of a string into [0, P):
    * h = fold(codepoints, 0, (h,c) -> (h*31 + c) mod P).
    *
    * BMP-ONLY reference formulation: `split(s, "")` yields UTF-16 code
    * units, so a supplementary-plane character (emoji) hashes as two
    * surrogates here, while the kernel ([[GraftExpressions.strHash]]), the
    * host golden (GoldenConfig.strHash) and the DuckDB oracle all walk full
    * code points. The three canonical implementations agree on ALL input;
    * this builtin agrees with them on BMP input only (unit-tested both
    * ways) — use the kernel on any path that may see astral characters. */
  def strHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L),
      (h, c) => (h * lit(StrBase) + c) % pL)

  /** Hash each element of a string array into [0, P). */
  def hashArray(arr: Column): Column = transform(arr, strHash(_))

  /** Affine coefficients as column expressions of a (long) index column. */
  private def aCoef(i: Column): Column = (lit(LcgMul) * i + lit(LcgAddA)) % pL
  private def bCoef(i: Column): Column =
    (lit(LcgMul) * (i + lit(BSeedOffset)) + lit(LcgAddB)) % pL

  /** Batched MinHash signature: for i in [0, n), min over xs of
    * (a_i*x + b_i) mod P. Input: array<long> of shingle hashes (non-empty).
    * Output: array<long> of length n. Built-in-expression formulation —
    * bit-identical to the DuckDB oracle; see MinHashSig expression for the
    * single-pass fast path (unit-tested equal to this). */
  def minhashSignature(xs: Column, n: Int = NumHashes): Column =
    transform(sequence(lit(0L), lit(n - 1L)),
      i => array_min(transform(xs, x => (aCoef(i) * x + bCoef(i)) % pL)))

  /** LSH band hashes: array of `bands` structs (band_idx: long, band_hash:
    * long); band_hash folds the band's r signature values with the same
    * polynomial scheme as strHash. */
  def bandHashes(sig: Column, bands: Int = Bands, r: Int = RowsPerBand): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      struct(
        j.cast("long").as("band_idx"),
        aggregate(slice(sig, j * r + 1, lit(r)), lit(0L),
          (h, m) => (h * lit(StrBase) + m) % pL).as("band_hash")))

  /** Rolling-hash fingerprint of full normalized text (A-row "document
    * fingerprinting"): strHash of lower(text). */
  def fingerprint(text: Column): Column = strHash(lower(text))

  /** Exact-Jaccard integer predicate: |A∩B|*den >= num*|A∪B| with
    * |A∪B| = |A|+|B|-|A∩B| (distinct arrays expected). */
  def jaccardGe(interSize: Column, sa: Column, sb: Column,
                num: Long = TauNum, den: Long = TauDen): Column =
    interSize * lit(den) >= lit(num) * (sa + sb - interSize)
}
