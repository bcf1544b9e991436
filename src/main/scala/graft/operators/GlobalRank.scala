package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank under a TOTAL order, without a global sort.
  *
  * The naive shape — `row_number().over(Window.orderBy(...))` — plans a
  * SinglePartition exchange and sorts the whole relation in ONE task; over
  * anything with linear cardinality (a per-user aggregate, a per-document
  * score) that is the single-node bottleneck at the 100 TB design point
  * (the round-18 q156 finding). This operator computes the SAME 1-based
  * rank scale-safely:
  *
  *   1. `repartitionByRange` on the order — each partition holds a
  *      contiguous, disjoint key range, ~n/P rows (Spark samples the
  *      bounds; skew in the order key spreads because the order ends in a
  *      unique tie-break column, making the sort key distinct per row);
  *   2. `sortWithinPartitions` + `monotonically_increasing_id()` — the id
  *      is partitionIndex·2^33 + the row's ordinal IN PARTITION ORDER, so
  *      after the in-partition sort `id mod 2^33` IS the local row_number
  *      minus one. No second shuffle, no per-partition window;
  *   3. per-partition counts (a ≤P-row aggregate) → prefix-sum offsets +
  *      the grand total over that CONSTANT-bounded relation (P is a
  *      config/cluster constant, not a data quantity — the sanctioned
  *      global-window shape), broadcast back and added to the local rank.
  *
  * Range-partition contiguity survives AQE: partition coalescing merges
  * only CONTIGUOUS shuffle partitions, so partition ids stay ordered by
  * key range and the offsets stay correct.
  *
  * Requires `order` to be a total order (include a unique tie-break
  * column, e.g. the row's id) — with ties the rank would be
  * partition-placement-dependent.
  */
object GlobalRank {

  /** `df` plus `rankCol` (1-based global rank under `order`) and
    * `totalCol` (the relation's row count — rides along for free from the
    * per-partition counts, saving callers a second pass when they need
    * n for quantile/ntile arithmetic). */
  def withRankAndTotal(df: DataFrame, order: Seq[Column],
                       rankCol: String, totalCol: String): DataFrame = {
    val pid = "__gr_pid"; val mid = "__gr_mid"
    // Counts fork BEFORE the in-partition sort: both branches share the
    // range exchange (identical subtree → ReuseExchange), and the counts
    // side doesn't pay a second sort of every partition.
    val ranged = df
      .repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
    val counts = ranged.groupBy(col(pid)).agg(count(lit(1)).as("__gr_c"))
    val parted = ranged
      .sortWithinPartitions(order: _*)
      .withColumn(mid, monotonically_increasing_id())
    // monotonically_increasing_id = partitionIndex << 33 | ordinal; the
    // ordinal is assigned in the order rows flow out of the in-partition
    // sort, so the low 33 bits are the 0-based local rank.
    val localRank = (col(mid) - col(pid).cast("long") * lit(1L << 33)) + lit(1L)
    val wCum = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val meta = counts
      .withColumn("__gr_off", sum(col("__gr_c")).over(wCum) - col("__gr_c"))
      .withColumn(totalCol, sum(col("__gr_c")).over(wTot))
      .select(col(pid), col("__gr_off"), col(totalCol))
    parted
      .join(broadcast(meta), pid)
      .withColumn(rankCol, localRank + col("__gr_off"))
      .drop(pid, mid, "__gr_off")
  }

  /** `df` plus `prefixCol` — the INCLUSIVE global running sum of `value`
    * under `order` — and `totalCol` (the grand total), without a global
    * sort: the same range-partition shape as [[withRankAndTotal]], with
    * the in-partition running sum computed by a window PARTITIONED on the
    * range-partition id (each task owns one contiguous key range) and the
    * cross-partition offsets broadcast from the ≤P-row per-partition sum
    * aggregate. This replaces the `sum(...).over(Window.orderBy(...))`
    * global-cumsum idiom (Pareto/ABC shares, ECDFs over linear-
    * cardinality aggregates). `value` must be non-null (sum skips nulls —
    * the local window and the per-partition totals would still agree, but
    * the caller's rank arithmetic usually would not). */
  def withPrefixSumAndTotal(df: DataFrame, order: Seq[Column], value: Column,
                            prefixCol: String, totalCol: String): DataFrame = {
    val pid = "__gr_pid"
    val parted = df
      .repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
    val sums = parted.groupBy(col(pid)).agg(sum(value).as("__gr_s"))
    val wCum = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val meta = sums
      .withColumn("__gr_off", sum(col("__gr_s")).over(wCum) - col("__gr_s"))
      .withColumn(totalCol, sum(col("__gr_s")).over(wTot))
      .select(col(pid), col("__gr_off"), col(totalCol))
    val wLocal = Window.partitionBy(col(pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(broadcast(meta), pid)
      .withColumn(prefixCol, sum(value).over(wLocal) + col("__gr_off"))
      .drop(pid, "__gr_off")
  }

  /** NTILE(k) of a row given its exact 1-based global `rank` and the
    * relation size `n` — the standard remainder semantics (the first
    * `n mod k` tiles get ⌈n/k⌉ rows, the rest ⌊n/k⌋), expressed as pure
    * integer ladder comparisons against the k−1 cut ranks so there is no
    * division to go wrong at any magnitude:
    * cut_i = i·⌊n/k⌋ + min(i, n mod k); tile = 1 + |{i : rank > cut_i}|. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val rem = n % k
    val base = ((n - rem) / k).cast("long")
    val steps = (1 until k).map { i =>
      val cut = lit(i) * base + least(lit(i.toLong), rem)
      when(rank > cut, 1).otherwise(0)
    }
    steps.foldLeft(lit(1))(_ + _).cast("int")
  }
}
