package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact lower-nearest-rank percentile (SURVEY.md §2.5 A7).
  *
  * The reference computes p75 as `sorted(a)[floor(0.75*(n-1))]`
  * (/root/reference/src/etl.js:284-289) — the lower nearest-rank element,
  * never interpolated. Spark's `percentile` interpolates and
  * `percentile_approx` approximates, so neither matches; this helper selects
  * the exact element with a sort-based window: fully distributed (one shuffle
  * on the group key, external sort per group), no driver collect, no
  * collect_list array blowup — the shape that still works when a group has
  * billions of rows.
  */
object Percentiles {

  /** One row per group: the value at sorted index floor(q*(n-1)). */
  def nearestRankByGroup(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, q: Double): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(col(valueCol))
    df.select((groupCols :+ valueCol).map(col): _*)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(part))
      .filter(col("rn") === floor(lit(q) * (col("n") - 1)).cast("long") + 1)
      .select(groupCols.map(col) :+ col(valueCol).as(s"p${(q * 100).round}"): _*)
  }

  /** Global (ungrouped) nearest-rank percentile over a single column. */
  def nearestRankGlobal(df: DataFrame, valueCol: String, q: Double): DataFrame =
    nearestRankByGroup(df.withColumn("__g", lit(1)), Seq("__g"), valueCol, q)
      .drop("__g")
}
