package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import graft.config.GoldenConfig._

/** Tight-loop kernels behind the custom Catalyst expressions. One compiled
  * pass per row replaces the interpreted higher-order-function expression
  * trees (nested transform/aggregate don't participate in codegen and were
  * ~1000x slower). Arithmetic is EXACTLY GoldenConfig's mod-P scheme —
  * equality with the built-in-expression formulation (and hence with the
  * DuckDB oracle) is unit-tested. */
object HashKernels {

  private val as: Array[Long] = Array.tabulate(NumHashes)(hashA)
  private val bs: Array[Long] = Array.tabulate(NumHashes)(hashB)

  /** Polynomial rolling hash over Unicode code points — matches SQL
    * `ascii()`/DuckDB `unicode()` per-char semantics. ASCII fast path reads
    * UTF-8 bytes directly (byte == code point) with zero allocation; any
    * high bit falls back to the code-point walk. */
  def strHash(s: UTF8String): Long = {
    val nb = s.numBytes()
    var h = 0L
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if (b < 0) return strHashUnicode(s) // non-ASCII byte → exact path
      h = (h * StrBase + b) % P
      i += 1
    }
    h
  }

  private def strHashUnicode(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      h = (h * StrBase + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Continue a rolling hash h with string s (ASCII fast path + fallback). */
  private def strHashCont(h0: Long, s: UTF8String): Long = {
    val nb = s.numBytes()
    var h = h0
    var i = 0
    var ascii = true
    while (i < nb && ascii) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else { h = (h * StrBase + b) % P; i += 1 }
    }
    if (ascii) h
    else {
      val str = s.toString
      var hh = h0
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        hh = (hh * StrBase + cp) % P
        j += Character.charCount(cp)
      }
      hh
    }
  }

  private final val SpaceCp = 32L

  /** Hash of the k-token shingle starting at position i of `toks`, exactly
    * equal to strHash(tokens.slice(i, i+k).mkString(" ")) — rolled over the
    * token bytes and separator, no shingle string ever built. */
  private def shingleHashAt(toks: ArrayData, i: Int, k: Int): Long = {
    var h = strHashCont(0L, toks.getUTF8String(i))
    var j = 1
    while (j < k) {
      h = (h * StrBase + SpaceCp) % P
      h = strHashCont(h, toks.getUTF8String(i + j))
      j += 1
    }
    h
  }

  /** Fused shingle+MinHash: signature over the k-token shingles of `toks`
    * without materializing shingle strings. min over a multiset equals min
    * over its set, so no dedup pass is needed — bit-identical to
    * minHashSig(distinct shingle strings). Null if fewer than k tokens. */
  def minHashShingles(toks: ArrayData, k: Int, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < k) return null
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i <= m - k) {
      val x = shingleHashAt(toks, i, k)
      var j = 0
      while (j < n) {
        val v = (as(j) * x + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct, sorted k-shingle hashes of `toks` (for set-intersection
    * verify) — values equal strHash of the shingle strings. Null if fewer
    * than k tokens. */
  def shingleHashes(toks: ArrayData, k: Int): ArrayData = {
    val m = toks.numElements()
    if (m < k) return null
    val hs = new Array[Long](m - k + 1)
    var i = 0
    while (i <= m - k) { hs(i) = shingleHashAt(toks, i, k); i += 1 }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < hs.length) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Rolling l-gram hashes over an array of tokens: hash each token, then
    * fold every l-length window with the same polynomial scheme. Output has
    * numElements - l + 1 hashes (null if fewer than l tokens). */
  def gramHashes(arr: ArrayData, l: Int): ArrayData = {
    val m = arr.numElements()
    if (m < l) return null
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = strHash(arr.getUTF8String(i)); i += 1 }
    val out = new Array[Long](m - l + 1)
    i = 0
    while (i <= m - l) {
      var h = 0L
      var j = 0
      while (j < l) { h = (h * StrBase + th(i + j)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Left-fold dot product of two float arrays as double — EXACTLY the
    * fold order of aggregate(zip_with(a, b, _*_), 0.0, _+_) and the DuckDB
    * oracle's list_reduce, so results are bit-identical; compiled loop
    * instead of an interpreted higher-order-function tree. Extra elements
    * of the longer array are ignored (zip semantics). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Random-hyperplane LSH bucket of a float vector (Charikar'02),
    * bit-identical to the built-in formulation in AnnSearch/the oracle:
    * plane h's weight for dim i is ((LcgMul*(h*1024+i)+LcgAddA) mod P
    * mod 2)*2-1, projection is a left-fold double sum, and the bucket
    * folds sign bits from plane planes-1 down to 0 as acc*2+bit. */
  def hyperplaneBucket(vec: ArrayData, planes: Int): Long =
    hyperplaneBucket(vec, planes, 0)

  /** Banded variant: folds the sign bits of planes
    * [offset, offset + planes), high plane first — table t of a banded
    * multi-table LSH passes offset = t * planesPerTable, so every table
    * draws DISTINCT pseudo-random hyperplanes from the same pinned LCG
    * stream. offset = 0 is exactly the single-table bucket. */
  def hyperplaneBucket(vec: ArrayData, planes: Int, offset: Int): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var h = offset + planes - 1
    while (h >= offset) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val sign = (LcgMul * (h * 1024L + i) + LcgAddA) % P % 2L * 2L - 1L
        acc += vec.getFloat(i).toDouble * sign.toDouble
        i += 1
      }
      bucket = bucket * 2L + (if (acc > 0.0) 1L else 0L)
      h -= 1
    }
    bucket
  }

  /** Distinct k-token shingle STRINGS of `toks`, first-occurrence order —
    * exactly array_distinct(transform(sequence(0, n-k), i =>
    * concat_ws(" ", slice(toks, i+1, k)))) (TextHash.shingles), compiled:
    * one UTF8String.concatWs per position + a hash-set dedup instead of
    * the interpreted slice/concat/distinct expression tree. Empty array
    * when fewer than k tokens (the shingles() contract). */
  def shingleStrings(toks: ArrayData, k: Int): ArrayData = {
    val m = toks.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val part = new Array[UTF8String](k)
    var i = 0
    while (i <= m - k) {
      var j = 0
      while (j < k) { part(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, part: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** LSH band hashes of a MinHash signature: bands polynomial folds of r
    * consecutive signature values each — exactly TextHash.bandHashes'
    * per-band aggregate(slice(...)) values (parity-tested), compiled into
    * one pass; band_idx is the array position. */
  def bandHashArr(sig: ArrayData, bands: Int, r: Int): ArrayData = {
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var h = 0L
      var i = j * r
      val end = i + r
      while (i < end) { h = (h * StrBase + sig.getLong(i)) % P; i += 1 }
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  /** PQ assignment of one SQ8 code row against the slot-indexed codebook
    * (cbs[m·K + k] = centroid of subspace m, entry k): per subspace the
    * nearest entry by exact integer squared L2, ties to the LOWEST k —
    * identical ordering to the least(struct(d2, k)) fold it replaces
    * (which was a nested interpreted higher-order expression per row).
    * Returns the M-length pqcode. */
  def pqCode(code: ArrayData, cbs: ArrayData): ArrayData = {
    import graft.config.GoldenConfig.{PqM, PqK, PqSubLen}
    val out = new Array[Long](PqM)
    var m = 0
    while (m < PqM) {
      var bestD = Long.MaxValue
      var bestK = 0L
      var k = 0
      while (k < PqK) {
        val cent = cbs.getArray(m * PqK + k)
        var d = 0L
        var p = 0
        while (p < PqSubLen) {
          val diff = code.getLong(m * PqSubLen + p) - cent.getLong(p)
          d += diff * diff
          p += 1
        }
        if (d < bestD) { bestD = d; bestK = k.toLong }
        k += 1
      }
      out(m) = bestK
      m += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup sum: Σ_m tbl[m·K + pqcode[m]] — the per-row integer
    * scoring loop of PQ search, compiled. */
  def pqAdc(tbl: ArrayData, pqcode: ArrayData): Long = {
    import graft.config.GoldenConfig.{PqM, PqK}
    var acc = 0L
    var m = 0
    while (m < PqM) {
      acc += tbl.getLong(m * PqK + pqcode.getLong(m).toInt)
      m += 1
    }
    acc
  }

  /** Weighted SimHash over a token array in ONE pass: every token
    * OCCURRENCE contributes ±1 to each bit position by the corresponding
    * bit of its strHash (Σ_distinct freq·sign ≡ Σ_occurrences sign — the
    * same integers as the explode→groupBy formulation, which this kernel
    * replaces together with its two shuffles). Bit b of the result is set
    * iff its signed sum is > 0. */
  def simHash(toks: ArrayData, bits: Int): Long = {
    val m = toks.numElements()
    val s = new Array[Long](bits)
    var j = 0
    while (j < m) {
      val h = strHash(toks.getUTF8String(j))
      var b = 0
      while (b < bits) {
        s(b) += ((h >> b) & 1L) * 2L - 1L
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (s(b) > 0L) out |= 1L << b
      b += 1
    }
    out
  }

  /** Integer DCT perceptual hash of a 64-length 0..255 block — EXACTLY the
    * arithmetic of [[graft.images.PerceptualHash.dctHash]] (fixed-point
    * DctCoef table, lower-median threshold over the 63 AC coefficients,
    * MSB-first fold into two non-negative longs), compiled into one pass
    * instead of an interpreted higher-order expression tree. Returns
    * [phash_hi, phash_lo]. */
  def phash64(block: ArrayData): ArrayData = {
    val cf = DctCoef
    val g = new Array[Long](64) // g[8u+y] = Σ_x cf(u)(x)·p(x,y)
    var u = 0
    while (u < 8) {
      val cfu = cf(u)
      var y = 0
      while (y < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) { acc += cfu(x) * block.getLong(x * 8 + y); x += 1 }
        g(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    val f = new Array[Long](64) // f[8u+v] = Σ_y cf(v)(y)·g[8u+y]
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val cfv = cf(v)
        var acc = 0L
        var y = 0
        while (y < 8) { acc += cfv(y) * g(u * 8 + y); y += 1 }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31) // lower median (32nd of 63 sorted values)
    var hi = 0L
    var i = 1
    while (i <= 31) { hi = hi * 2L + (if (f(i) > med) 1L else 0L); i += 1 }
    var lo = 0L
    i = 32
    while (i <= 63) { lo = lo * 2L + (if (f(i) > med) 1L else 0L); i += 1 }
    new GenericArrayData(Array(hi, lo))
  }

  /** Batched MinHash over an array of shingle strings: hashes each shingle
    * once, updates all n mins in one pass. Returns null for empty input
    * (callers filter empties; mirrors array_min(empty) = null). */
  def minHashSig(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return null
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < m) {
      val x = strHash(arr.getUTF8String(j))
      var i = 0
      while (i < n) {
        val v = (as(i) * x + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}
