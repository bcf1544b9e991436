package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact lower-nearest-rank percentile (SURVEY.md §2.5 A7).
  *
  * The reference computes p75 as `sorted(a)[floor(0.75*(n-1))]`
  * (/root/reference/src/etl.js:284-289) — the lower nearest-rank element,
  * never interpolated. Spark's `percentile` interpolates and
  * `percentile_approx` approximates, so neither matches.
  *
  * Scale shape: a naive `row_number over (partition by group order by v)`
  * sorts each whole group in ONE task — with low-cardinality groups that is
  * a single task sorting billions of rows at the 100 TB design point. This
  * implementation is a three-stage histogram select where no task ever
  * holds more than ~n/buckets rows of any group:
  *
  *   1. per-group `count/min/max` (tiny shuffle agg) → the target rank
  *      `floor(q*(n-1))+1` per group;
  *   2. rows bucketed by an affine value→bucket map (monotonic in v, so
  *      bucket ranges align with sort order); per-(group,bucket) counts —
  *      a high-cardinality shuffle agg — then a cumulative sum over the
  *      tiny (groups × buckets) histogram locates the one bucket holding
  *      the target rank and its local offset;
  *   3. only rows of that bucket (≈ n/buckets of the group) are sorted by
  *      a window to pick the local-offset element.
  *
  * All-equal groups (min == max) short-circuit: the answer is min, and
  * bucketing would degenerate to a single bucket.
  *
  * Determinism: equal values map to equal buckets and are interchangeable
  * at any rank, so the selected VALUE is unique even though row identity
  * under ties is not.
  */
object Percentiles {

  /** One row per group: the value at sorted index floor(q*(n-1)), exposed
    * as column `p{100q}` (e.g. `p75`). NULL values must be pre-filtered by
    * the caller (the reference filters non-finite before ranking). */
  def nearestRankByGroup(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, q: Double,
                         buckets: Int = 256): DataFrame = {
    val outCol = s"p${(q * 100).round}"
    val g = groupCols.map(col)
    val v = col(valueCol)
    val base = df.select((groupCols :+ valueCol).map(col): _*)

    val stats = base.groupBy(g: _*).agg(
        count(lit(1)).as("__n"), min(v).as("__min"), max(v).as("__max"))
      .withColumn("__target", (floor(lit(q) * (col("__n") - 1)) + 1).cast("long"))

    val degenerate = stats.filter(col("__min") === col("__max"))
      .select(g :+ col("__min").as(outCol): _*)

    val live = stats.filter(col("__min") =!= col("__max"))

    // Stage 2: per-(group,bucket) histogram. `live` is one row per group —
    // always broadcastable no matter the fact-table size.
    val bucketed = base.join(broadcast(live), groupCols)
      .withColumn("__b",
        least(floor((v - col("__min")) / ((col("__max") - col("__min")) / buckets)),
              lit(buckets - 1)).cast("int"))
    val hist = bucketed.groupBy((g :+ col("__b")): _*).agg(count(lit(1)).as("__c"))

    // Cumulative over the tiny histogram; the window partitions on the
    // group key over at most `buckets` rows per group.
    val wcum = Window.partitionBy(g: _*).orderBy(col("__b"))
    val chosen = hist
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__before", col("__cum") - col("__c"))
      .join(live.select((g :+ col("__target")): _*), groupCols)
      .filter(col("__before") < col("__target") && col("__target") <= col("__cum"))
      .select((g :+ col("__b") :+ (col("__target") - col("__before")).as("__local")): _*)

    // Stage 3: sort only the chosen bucket's rows (≈ n/buckets per group).
    val wr = Window.partitionBy((groupCols :+ "__b").map(col): _*).orderBy(v)
    val picked = bucketed.join(broadcast(chosen), groupCols :+ "__b")
      .withColumn("__rn", row_number().over(wr))
      .filter(col("__rn") === col("__local"))
      .select(g :+ v.as(outCol): _*)

    degenerate.union(picked)
  }

  /** Global (ungrouped) nearest-rank percentile over a single column. */
  def nearestRankGlobal(df: DataFrame, valueCol: String, q: Double): DataFrame =
    nearestRankByGroup(df.withColumn("__g", lit(1)), Seq("__g"), valueCol, q)
      .drop("__g")
}
