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
    * masked off — callers with wider domains should bucket first). */
  def zKey(a: Column, b: Column): Column = {
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
