package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, attach the single right
  * row with the greatest right time ≤ the left row's time within the same
  * key (reference dedup pipelines use this shape for "state at event time"
  * lookups; Spark has no native ASOF JOIN).
  *
  * Implemented as the UNION-MERGE pattern, not an inequality join: both
  * sides union into one keyed stream, ONE hash shuffle on the key and one
  * sort by (time, side, tie) feed a running `last(payload, ignoreNulls)`
  * window — right rows deposit their payload, left rows read the latest
  * deposit. An inequality join (`l.k = r.k AND r.t <= l.t`) would plan as
  * a per-key cartesian (every left row × every earlier right row — O(n·m)
  * per key before the max-reduction); the merge is O(n+m) per key and
  * shuffles each row exactly once, which is the 10^12-row shape. A viral
  * key degrades to one big sorted partition (the same bound as any
  * sort-merge join on that key); range-bucketing the time axis per key is
  * the escape hatch if one key alone outgrows an executor.
  *
  * Tie semantics (pinned for cross-engine exactness): a right row at
  * exactly the left time IS visible (≤, rights sort before lefts at equal
  * time), and among right rows with equal time the one with the greatest
  * `rightTie` wins. Left rows with no earlier right row get a null payload.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     state side
    * @param leftKey   join key column on `left`
    * @param leftTime  event-time column on `left`
    * @param rightKey  join key column on `right`
    * @param rightTime event-time column on `right`
    * @param rightTie  unique right column breaking equal-time ties (max wins)
    * @param payload   right columns to attach (each emitted as `asof_<name>`)
    * @return all `left` columns plus one nullable `asof_<c>` per payload col
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           rightTie: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(col(leftKey).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_side"), lit(null).cast("long").as("_tie"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("_l"))
    val r = right.select(col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), col(rightTie).cast("long").as("_tie"),
      lit(null).cast(l.schema("_l").dataType).as("_l"),
      struct(payload.map(col).toIndexedSeq: _*).as("_p"))
    // the union aligns `_l` (left-row struct) and `_p` (payload struct)
    // across sides with nulls on the other side
    val merged = l.withColumn("_p", lit(null).cast(r.schema("_p").dataType))
      .unionByName(r)
    // _tie sorts only among right rows at equal time (lefts carry null and
    // equal-time left rows are order-indifferent); side 0 < 1 makes a
    // right row at exactly t visible to the left row at t
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("_av", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(c => col(s"_av.$c").as(s"asof_$c")): _*)
  }
}
