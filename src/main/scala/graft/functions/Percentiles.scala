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
  *      `floor(q*(n-1))+1` per group — for EVERY requested quantile at
  *      once;
  *   2. rows bucketed by an affine value→bucket map (monotonic in v, so
  *      bucket ranges align with sort order); per-(group,bucket) counts —
  *      a high-cardinality shuffle agg — then a cumulative sum over the
  *      tiny (groups × buckets) histogram locates, per quantile, the one
  *      bucket holding its target rank and the local offset;
  *   3. only rows of the chosen buckets (≈ n/buckets of the group each)
  *      are sorted by a window to pick the local-offset elements.
  *
  * Multi-quantile requests (p05+p95, p33+p67, …) share ONE histogram and
  * ONE corpus pass end-to-end: asking for k quantiles costs the same two
  * shuffles over the data as asking for one, plus k rows of tiny-side
  * bookkeeping.
  *
  * All-equal groups (min == max) short-circuit: every quantile is min, and
  * bucketing would degenerate to a single bucket.
  *
  * Determinism: equal values map to equal buckets and are interchangeable
  * at any rank, so the selected VALUE is unique even though row identity
  * under ties is not.
  */
object Percentiles {

  /** One row per group with one column per requested (quantile, name)
    * pair: the value at sorted index floor(q*(n-1)). NULL values must be
    * pre-filtered by the caller (the reference filters non-finite before
    * ranking). All quantiles are served from a single histogram — one
    * corpus scan + one histogram shuffle + one chosen-buckets window
    * regardless of `qs.size`. Explicit names exist for close quantiles
    * whose default `p{100q}` labels collide (q61's p±3/acc bracket).
    *
    * Single-quantile calls take a SPECIALIZED path: the (qi, local) pick
    * bookkeeping the multi form needs (target explode, distinct-bucket
    * dedup, final pivot agg) costs 3 extra tiny-side stages per call —
    * measured as the round-13 q82 growth (1.64→3.26 s: two single-q calls
    * paying the multi plumbing). With one quantile the chosen bucket is
    * unique per group, so the pick is a plain filter. */
  def nearestRanksByGroupNamed(df: DataFrame, groupCols: Seq[String],
                               valueCol: String, qs: Seq[(Double, String)],
                               buckets: Int = 256): DataFrame = {
    require(qs.nonEmpty && qs.map(_._1).distinct == qs.map(_._1),
      s"quantiles must be distinct: $qs")
    val outCols = qs.map(_._2)
    require(outCols.distinct == outCols,
      s"quantiles collide on output column names: $qs")
    val g = groupCols.map(col)
    val v = col(valueCol)
    val base = df.select((groupCols :+ valueCol).map(col): _*)

    val stats = base.groupBy(g: _*).agg(
        count(lit(1)).as("__n"), min(v).as("__min"), max(v).as("__max"))

    val degenerate = stats.filter(col("__min") === col("__max"))
      .select(g ++ outCols.map(c => col("__min").as(c)): _*)

    val live0 = stats.filter(col("__min") =!= col("__max"))

    if (qs.size == 1) {
      // Fast path: one target rank per group rides the stats row itself —
      // no explode, no bucket dedup, no pivot.
      val (q, outCol) = qs.head
      val live = live0.withColumn("__target",
        (floor(lit(q) * (col("__n") - 1)) + 1).cast("long"))
      val bucketed = base.join(broadcast(live), groupCols)
        .withColumn("__b",
          least(floor((v - col("__min")) / ((col("__max") - col("__min")) / buckets)),
                lit(buckets - 1)).cast("int"))
      val hist = bucketed.groupBy((g :+ col("__b")): _*).agg(count(lit(1)).as("__c"))
      val wcum = Window.partitionBy(g: _*).orderBy(col("__b"))
      val chosen = hist
        .withColumn("__cum", sum(col("__c")).over(wcum))
        .withColumn("__before", col("__cum") - col("__c"))
        .join(live.select((g :+ col("__target")): _*), groupCols)
        .filter(col("__before") < col("__target") && col("__target") <= col("__cum"))
        .select((g :+ col("__b") :+ (col("__target") - col("__before")).as("__local")): _*)
      val wr = Window.partitionBy((groupCols :+ "__b").map(col): _*).orderBy(v)
      val picked = bucketed.join(broadcast(chosen), groupCols :+ "__b")
        .withColumn("__rn", row_number().over(wr))
        .filter(col("__rn") === col("__local"))
        .select(g :+ v.as(outCol): _*)
      return degenerate.union(picked)
    }

    val live = live0

    // Per-(group, quantile) target ranks — |groups|·|qs| rows, tiny.
    val targets = live.select(g :+ explode(array(qs.zipWithIndex.map {
        case ((q, _), i) => struct(
          lit(i).as("__qi"),
          (floor(lit(q) * (col("__n") - 1)) + 1).cast("long").as("__target"))
      }: _*)).as("__t"): _*)
      .select(g :+ col("__t.__qi").as("__qi") :+ col("__t.__target").as("__target"): _*)

    // Stage 2: per-(group,bucket) histogram. `live` is one row per group —
    // always broadcastable no matter the fact-table size.
    val bucketed = base.join(broadcast(live), groupCols)
      .withColumn("__b",
        least(floor((v - col("__min")) / ((col("__max") - col("__min")) / buckets)),
              lit(buckets - 1)).cast("int"))
    val hist = bucketed.groupBy((g :+ col("__b")): _*).agg(count(lit(1)).as("__c"))

    // Cumulative over the tiny histogram; the window partitions on the
    // group key over at most `buckets` rows per group. Each quantile's
    // target lands in exactly one bucket's (before, cum] range.
    val wcum = Window.partitionBy(g: _*).orderBy(col("__b"))
    val chosen = hist
      .withColumn("__cum", sum(col("__c")).over(wcum))
      .withColumn("__before", col("__cum") - col("__c"))
      .join(targets, groupCols)
      .filter(col("__before") < col("__target") && col("__target") <= col("__cum"))
      .select(g :+ col("__qi") :+ col("__b")
        :+ (col("__target") - col("__before")).as("__local"): _*)

    // Stage 3: sort only the chosen buckets' rows (≈ n/buckets per group
    // each). Rank on the DISTINCT bucket set first, then attach the (qi,
    // local) picks — two quantiles sharing a bucket must not duplicate the
    // rows under the row_number window.
    val chosenBuckets = chosen.select((groupCols :+ "__b").map(col): _*).distinct()
    val wr = Window.partitionBy((groupCols :+ "__b").map(col): _*).orderBy(v)
    val ranked = bucketed.join(broadcast(chosenBuckets), groupCols :+ "__b")
      .withColumn("__rn", row_number().over(wr))
    val picked = ranked.as("r")
      .join(broadcast(chosen.as("c")),
        groupCols.map(c => col(s"r.$c") === col(s"c.$c"))
          .reduce(_ && _) && col("r.__b") === col("c.__b")
          && col("r.__rn") === col("c.__local"))
      .select(groupCols.map(c => col(s"r.$c")) :+ col("c.__qi").as("__qi")
        :+ col(s"r.$valueCol").as("__v"): _*)
      .groupBy(g: _*)
      .agg(qs.indices.map(i =>
          max(when(col("__qi") === i, col("__v"))).as(outCols(i))).head,
        qs.indices.tail.map(i =>
          max(when(col("__qi") === i, col("__v"))).as(outCols(i))): _*)

    degenerate.union(picked)
  }

  /** Default-named form: each quantile as `p{100q}` (e.g. `p75`; p05
    * renders as `p5`). */
  def nearestRanksByGroup(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, qs: Seq[Double],
                          buckets: Int = 256): DataFrame =
    nearestRanksByGroupNamed(df, groupCols, valueCol,
      qs.map(q => q -> s"p${(q * 100).round}"), buckets)

  /** Single-quantile form — delegates to [[nearestRanksByGroupNamed]]'s
    * fast path. */
  def nearestRankByGroup(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, q: Double,
                         buckets: Int = 256): DataFrame =
    nearestRanksByGroup(df, groupCols, valueCol, Seq(q), buckets)

  /** Global (ungrouped) nearest-rank percentile over a single column. */
  def nearestRankGlobal(df: DataFrame, valueCol: String, q: Double): DataFrame =
    nearestRankByGroup(df.withColumn("__g", lit(1)), Seq("__g"), valueCol, q)
      .drop("__g")
}
