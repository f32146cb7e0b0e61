package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.GoldenConfig

/** Mergeable cardinality sketches (HyperLogLog registers, Flajolet et al.
  * 2007) over the pinned [0, P) string hash — the count-distinct shape for
  * 10^12 rows: an EXACT `count(distinct key)` shuffles every distinct key;
  * the sketch reduces map-side to ≤ 2^p (bucket, max-rho) rows per
  * partition per group, so the shuffle is O(groups · 2^p) regardless of
  * corpus size, and registers from disjoint corpus slices merge by plain
  * `max` (how an incremental corpus store would keep running distinct
  * counts without ever re-scanning).
  *
  * Everything on the register path is integer arithmetic on the shared
  * mod-P hash (P = 2^31-1): bucket = low p bits, rho = 1 + trailing zeros
  * of the remaining 21 bits (`bit_count((w & -w) - 1) + 1` — two's
  * complement isolate-lowest-bit, identical in DuckDB), empty suffix →
  * sentinel 22 (> any real rho). The float estimator is deliberately kept
  * OUT of the register contract so the sketch itself hash-matches
  * cross-engine.
  */
object Sketches {

  /** Register-index bits: 2^10 = 1024 registers (±3.2% standard error). */
  val HllP: Int = 10
  val HllRegisters: Int = 1 << HllP
  /** Suffix width is 31 - HllP bits; rho of an all-zero suffix. */
  val HllMaxRho: Int = 31 - HllP + 1

  /** [[graft.config.GoldenConfig.mix31]] as column algebra: the 31-bit
    * xorshift-multiply avalanche that decorrelates the structured
    * polynomial strHash before its BITS are read (measured: HLL estimate
    * error on sequential keys +33% → ≤1.4%). */
  def mix31(h0: Column): Column =
    (1 to 2).foldLeft(h0) { (x, _) =>
      val a = x.bitwiseXOR(shiftright(x, 16))
      val b = (a * GoldenConfig.Mix31C1).bitwiseAND(GoldenConfig.Mix31Mask)
      val c = b.bitwiseXOR(shiftright(b, 13))
      val d = (c * GoldenConfig.Mix31C2).bitwiseAND(GoldenConfig.Mix31Mask)
      d.bitwiseXOR(shiftright(d, 11))
    }

  /** Per-group HLL registers for a hash column (values in [0, P)):
    * one row per (group, bucket) with the max rho observed. Input need not
    * be distinct — max is idempotent, duplicates cost nothing extra.
    * The hash is [[mix31]]-finalized internally. */
  def hllRegisters(df: DataFrame, groupCol: String, hashCol: Column): DataFrame = {
    // NOTE: h and w are deliberately PLAIN duplicated bitwise trees, not
    // let-bound: everything here is codegen-friendly scalar algebra, and
    // wrapping it in a single-element transform (a CodegenFallback HOF)
    // measured 3× SLOWER. Let-binding pays only when the duplicated
    // subtree is itself expensive/interpreted — pass a cheap attribute or
    // kernel-hashed column as hashCol.
    val h = mix31(hashCol.cast("long"))
    val w = shiftright(h, HllP)
    val rho = when(w === 0L, lit(HllMaxRho.toLong))
      .otherwise((bit_count(w.bitwiseAND(-w) - 1) + 1).cast("long"))
    df.select(col(groupCol).as("grp"), (h % HllRegisters).as("bucket"), rho.as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("register"))
  }

  /** Merge two register tables (e.g. from disjoint corpus slices): the
    * union's per-(group, bucket) max — the sketch's defining property. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("grp", "bucket").agg(max("register").as("register"))

  /** Count-min depth (independent hash rows) and width (buckets/row). */
  val CmDepth: Int = 4
  val CmWidth: Int = 4096
  /** Per-depth hash: avalanche the depth-shifted base hash. The shift is
    * additive pre-mix (the mixer decorrelates the rows); & keeps the input
    * inside 31 bits on both engines. */
  def cmBucket(h: Column, d: Column): Column =
    mix31((h + d * 54321L).bitwiseAND(GoldenConfig.Mix31Mask)) % CmWidth

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over a weight-1 item
    * column: frequency estimates for ANY item from a fixed
    * CmDepth × CmWidth integer table — the heavy-hitter shape for 10^12
    * tokens: the shuffle is O(depth · width) map-side-combined counts, not
    * O(distinct items), and sketches from corpus slices merge by adding
    * cells. Estimate(item) = min over depths of its cell (always ≥ truth;
    * tight for heavy hitters). Returns (d, bucket, cnt) — only occupied
    * cells; absent cells are zero. */
  /** Explode-FIRST shape on purpose: `explode` of a LITERAL depth array
    * is a trivial Generate, and the bucket math lands in the plain
    * projection AFTER it, where it whole-stage-compiles. The tempting
    * inverse — explode(array of computed (d, bucket) structs) — puts the
    * computed array inside Generate, which evaluates its input
    * INTERPRETED (measured 9 s vs ~1 s at sf0.1 token volume). */
  def countMin(df: DataFrame, itemHashCol: Column): DataFrame =
    df.select(itemHashCol.cast("long").as("_h"))
      .select(col("_h"), explode(lit((0 until CmDepth).map(_.toLong).toArray)).as("d"))
      .select(col("d"), cmBucket(col("_h"), col("d")).as("bucket"))
      .groupBy("d", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point-query the sketch: min over depths of each probe's cell. Probes
    * is (probe, h) with the RAW (un-avalanched) item hash; the sketch side
    * is broadcast-sized (≤ depth·width rows). */
  def cmEstimate(sketch: DataFrame, probes: DataFrame,
                 probeCol: String, hashCol: String): DataFrame =
    probes.select(col(probeCol).as("probe"), col(hashCol).cast("long").as("_h"))
      .select(col("probe"), col("_h"),
        explode(lit((0 until CmDepth).map(_.toLong).toArray)).as("d"))
      .select(col("probe"), col("d"), cmBucket(col("_h"), col("d")).as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))

  /** Standard HLL estimate per group (float path — operational readout,
    * not part of the cross-engine register contract): alpha·m²/Σ2^-r with
    * the small-range linear-counting correction. */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val m = HllRegisters.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers.groupBy("grp")
      .agg(sum(pow(lit(2.0), -col("register"))).as("_sumInv"),
        count(lit(1)).as("_used"))
      .select(col("grp"),
        {
          val zeros = lit(m) - col("_used") // absent buckets contribute 2^0
          val raw = lit(alpha * m * m) / (col("_sumInv") + zeros)
          // linear counting when the raw estimate is small and zeros exist
          when(raw <= 2.5 * m && zeros > 0,
            lit(m) * log(lit(m) / zeros)).otherwise(raw).as("estimate")
        })
  }
}
