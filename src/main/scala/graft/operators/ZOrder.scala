package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave keys for multi-dimensional data layout —
  * the lakehouse clustering primitive (Delta `OPTIMIZE ZORDER BY`,
  * Iceberg's zorder rewrite): sorting/range-partitioning a 10^12-row
  * table by the interleaved key makes per-file min/max statistics tight
  * on BOTH dimensions at once, so scans filtered on either column (or a
  * box on both) prune files instead of reading everything — the
  * write-once lever that turns full scans into partition-pruned reads.
  *
  * The key is pure integer bit algebra (a single map-side fold, exactly
  * mirrored in SQL): the low 16 bits of each dimension interleave into a
  * 32-bit key, dimension b in odd (higher) positions — a base-4 fold
  * `acc·4 + 2·bit_b(i) + bit_a(i)` from bit 15 down to 0.
  */
object ZOrder {

  /** Morton key of two integer columns (low 16 bits each; higher bits are
    * masked off — callers with wider domains should bucket first).
    *
    * Implemented as the classic mask-and-shift bit spread (x | x<<8 …
    * & 0x5555…) rather than a per-bit fold: identical key for every input
    * (bit i of a lands at position 2i, of b at 2i+1 — property-tested
    * against the fold), but pure scalar bit algebra that whole-stage-
    * compiles instead of a 16-step interpreted higher-order aggregate. */
  def zKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Low 16 bits of `x` spread to even bit positions 0,2,...,30. */
  private def spread16(x: Column): Column = {
    val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** The per-bit fold formulation — kept as the semantic reference for the
    * parity property in ZOrderSpec. */
  private[operators] def zKeyFold(a: Column, b: Column): Column = {
    val (am, bm) = (a.cast("long").bitwiseAND(65535L), b.cast("long").bitwiseAND(65535L))
    aggregate(sequence(lit(15), lit(0), lit(-1)), lit(0L), (acc, i) =>
      acc * 4L + shiftright(bm, i) % 2L * 2L + shiftright(am, i) % 2L)
  }

  /** Attach `z` and return the frame range-repartitioned and sorted by it
    * — the materialize-for-layout step (each output file then covers a
    * small rectangle of (a, b) space). */
  def cluster(df: DataFrame, a: String, b: String, partitions: Int): DataFrame =
    df.withColumn("z", zKey(col(a), col(b)))
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")

  /** shiftright with a COLUMN shift amount (the `functions.shiftright`
    * overload only takes a literal Int; the SQL expression takes any). */
  private def shiftright(c: Column, by: Column): Column =
    call_function("shiftright", c, by)
}
