package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the single right row with the greatest
  * event time at-or-before the left row's time, per key. The operator
  * Spark's join surface famously lacks (range joins explode, and a plain
  * equi-join can't express "latest prior").
  *
  * FORMULATION: no join at all. Both sides are tagged and unioned, then a
  * single running `last(..., ignoreNulls)` window per key — ordered by
  * (time, side-tag, tie) — carries the most recent right payload forward
  * into every left row. One shuffle (the per-key window sort), linear in
  * |L| + |R|, versus the |L|·|R|-per-key blowup of the naive range join:
  * the standard scalable as-of shape (same trick TimescaleDB/kdb
  * formulations use), expressed entirely in DataFrame operators so
  * Catalyst/AQE own the physical plan.
  *
  * Determinism: ties are total-ordered. A right row at exactly the left
  * row's timestamp IS visible (at-or-before: the right tag sorts first at
  * equal times), and multiple right rows sharing a timestamp resolve to
  * the greatest `tieCol` (the window order's last). Replays and arbitrary
  * partitionings produce identical output.
  *
  * At 100 TB: state per task is one partition's sort — as-of inherently
  * needs per-key time order, and this shape shuffles each row exactly
  * once. A pathologically hot key serializes only its own rows (the same
  * bound any per-key-ordered operator has); pre-bucketing both sides on
  * the key makes the window shuffle-free.
  *
  * Contract: `left` and `right` share `keyCol`, `timeCol`, `tieCol`
  * names; every right column except the key comes back in a nullable
  * `asof` struct (null = no right row at-or-before). */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           keyCol: String, timeCol: String, tieCol: String): DataFrame = {
    val rPayloadCols = right.columns.filterNot(_ == keyCol).toSeq
    val rStruct: Column = struct(rPayloadCols.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val lStruct: Column = struct(left.columns.toSeq.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType

    val leftU = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), col(tieCol).as("__tie"),
      lit(1).as("__tag"), lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rightU = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), col(tieCol).as("__tie"),
      lit(0).as("__tag"), lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftU.unionByName(rightU)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*"), col("__m").as("asof"))
  }
}
