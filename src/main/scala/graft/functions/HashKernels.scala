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
    * `ascii()`/DuckDB `unicode()` per-char semantics. */
  def strHash(s: UTF8String): Long = {
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
