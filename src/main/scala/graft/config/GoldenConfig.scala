package graft.config

/** The pinned "shingle/signature config" (BASELINE.json north_rule: cluster
  * assignments must match the reference's at the *same* shingle/signature
  * config). One object, shared by jobs, queries, oracles and tests — change
  * here, re-derive goldens, nothing else moves.
  *
  * Reference provenance (path-level, mount empty at survey time — SURVEY.md
  * §0): shingling/similarity semantics follow
  * R:src/main/scala/de/hpi/ingestion/deduplication/similarity/Jaccard.scala
  * (n-gram Jaccard) and .../deduplication/Blocking.scala (blocking keys);
  * the MinHash/LSH/SimHash replacements are our Spark-native design (§2B).
  *
  * All hash arithmetic is pure positive integer math mod a 31-bit prime so
  * the driver's DuckDB oracle can reproduce it bit-for-bit in ANSI SQL
  * (no engine-specific hash functions on the correctness path).
  */
object GoldenConfig {
  /** Mersenne prime 2^31 - 1; all hashes live in [0, P). Products of two
    * values < P fit in a signed 64-bit long (no overflow under ANSI mode). */
  val P: Long = 2147483647L

  /** Polynomial rolling-hash base for strings (h = (h*31 + code) mod P). */
  val StrBase: Long = 31L

  /** LCG constants (glibc) used to derive the per-hash affine coefficients:
    * a_i = (1103515245*i + 12345) mod P, b_i = (1103515245*(i+7) + 54321) mod P. */
  val LcgMul: Long = 1103515245L
  val LcgAddA: Long = 12345L
  val LcgAddB: Long = 54321L
  val BSeedOffset: Long = 7L

  /** Token shingle size k for the caption path (word 3-shingles). */
  val ShingleK: Int = 3
  /** MinHash signature length n. */
  val NumHashes: Int = 128
  /** LSH: n = bands * rowsPerBand; collision threshold ~ (1/b)^(1/r) ≈ 0.42. */
  val Bands: Int = 32
  val RowsPerBand: Int = 4
  /** Verify-stage exact-Jaccard threshold τ, as an exact rational num/den so
    * the filter is integer-only: |A∩B| * TauDen >= TauNum * |A∪B|. */
  val TauNum: Long = 4L
  val TauDen: Long = 5L

  /** Substring pass: two docs are substring-duplicates if they share an
    * exact run of >= SubstringL consecutive tokens. */
  val SubstringL: Int = 8

  /** SimHash width for the oracle-checkable document variant (32 bits keeps
    * every intermediate sum well inside a long). Image path uses 64. */
  val SimHashBits: Int = 32
  /** Max Hamming distance for simhash near-duplicates. */
  val HammingMax: Int = 3
  /** Number of bucket chunks for Hamming-<=HammingMax search (pigeonhole:
    * HammingMax+1 chunks guarantee one identical chunk). */
  val HammingChunks: Int = HammingMax + 1

  /** Image path (input_hint table). */
  val PsnrMinDb: Double = 40.0
  val PhashBits: Int = 64

  /** Skew handling: LSH buckets with more members than SaltCap are salted
    * into SaltFanout sub-tasks (pair-preserving replication). */
  val SaltCap: Int = 4096
  val SaltFanout: Int = 16

  /** ANN: random-hyperplane LSH bits and brute-force top-k. */
  val AnnHyperplanes: Int = 16
  val AnnTopK: Int = 5

  /** Banded multi-table hyperplane LSH (the MinHash-banding analog in
    * cosine space): `AnnBandTables` bucket tables of `AnnBandPlanes` sign
    * bits each; a pair is a candidate when all bits of at least one table
    * agree — P(candidate | angle θ) = 1 - (1 - p^r)^b with p = 1 - θ/π.
    *
    * 12×8 is pinned for the PRODUCTION near-dup regime (cosine ≥ 0.9 →
    * p ≥ 0.856 → recall 1-(1-0.856^8)^12 ≈ 0.97, while a random
    * near-orthogonal pair collides with prob 1-(1-0.5^8)^12 ≈ 0.046 — a
    * ~21× signal/noise separation). Sign-bit LSH cannot separate pairs at
    * cosine ~0.4 from a cosine-0 background at high recall for ANY (r, b)
    * within reason (p_sig/p_noise = 0.63/0.5 ⇒ r ≥ ~15, b ≥ ~3000), so
    * corpora whose "near" means 0.4 need a different family (e.g. the
    * tf-idf token-join path) — documented in AnnAndTextSpec with measured
    * numbers. */
  val AnnBandTables: Int = 12
  val AnnBandPlanes: Int = 8

  /** IVF coarse quantizer fixed-point scale: member coordinates quantize to
    * integer milli-units and a centroid is the per-dimension integer SUM of
    * its members (cosine is scale-invariant, so the un-normalized sum has
    * exactly the mean's direction). Integer sums are order-independent —
    * the whole quantizer is deterministic and DuckDB-reproducible, unlike a
    * float avg whose summation order is partition-dependent. Overflow
    * bound: |coord| ≤ ~4 ⇒ |term| ≤ 4·10³, so even 10^12 members stay
    * ≤ 4·10^15 ≪ Long.Max under ANSI. */
  val IvfQuantScale: Long = 1000L

  /** Deterministic seed for the synthetic image+caption generator. */
  val Seed: Long = 42L

  /** Fixed-point 8-point DCT-II basis, C(u)(x) = round(cos(π·(2x+1)·u/16)
    * · 2^14) — the pHash DCT pinned as INTEGERS at build time, so the
    * distributed kernel and the DuckDB oracle (which interpolates these
    * exact literals) share one table and the whole perceptual hash is
    * integer arithmetic end to end: no cross-engine libm cos() to drift.
    * Overflow bound: |F(u,v)| ≤ 255·16384²·64 ≈ 4.4·10^12 ≪ Long.Max. */
  val DctScale: Long = 16384L
  val DctCoef: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    Math.round(Math.cos(Math.PI * (2 * x + 1) * u / 16.0) * DctScale.toDouble)
  }

  /** Product quantization geometry: M subspaces of SubLen dims (d = 64),
    * K centroids per subspace (4-bit codes), Lloyd's iterations. */
  val PqM: Int = 8
  val PqSubLen: Int = 8
  val PqK: Int = 16
  val PqIters: Int = 3

  /** 31-bit xorshift-multiply finalizer (murmur-style avalanche masked to
    * 31 bits, two rounds): decorrelates the STRUCTURED base-31 polynomial
    * strHash before any use that reads individual BITS (HLL rho/bucket).
    * Mod-free — only ^, >>, *, & — so it is exactly expressible in both
    * Spark and DuckDB integer algebra; products stay < 2^61 (no overflow).
    * Measured: HLL estimate error on adversarial sequential keys drops
    * from +33% (affine mod-P mixing) to ≤1.4% with this finalizer. */
  val Mix31Mask: Long = (1L << 31) - 1
  val Mix31C1: Long = 0x85ebca6bL & Mix31Mask
  val Mix31C2: Long = 0xc2b2ae35L & Mix31Mask
  def mix31(h0: Long): Long = {
    var h = h0
    var r = 0
    while (r < 2) {
      h ^= h >> 16; h = (h * Mix31C1) & Mix31Mask
      h ^= h >> 13; h = (h * Mix31C2) & Mix31Mask
      h ^= h >> 11
      r += 1
    }
    h
  }

  /** Affine MinHash coefficients, host-side (mirrors the SQL formula). */
  def hashA(i: Int): Long = (LcgMul * i + LcgAddA) % P
  def hashB(i: Int): Long = (LcgMul * (i + BSeedOffset) + LcgAddB) % P

  /** Host-side polynomial string hash — must equal the kernel
    * (HashKernels.strHash) and DuckDB (`unicode()` per char) exactly
    * (unit-tested): walks Unicode CODE POINTS, so supplementary-plane
    * characters hash as one value, not two surrogates. */
  def strHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * StrBase + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
