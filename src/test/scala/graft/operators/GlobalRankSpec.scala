package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must be BIT-IDENTICAL to the window truth it replaces —
  * `row_number()/ntile(k)` over an unpartitioned window — at every size
  * class (the ntile remainder semantics change with n mod k, so n = 1..7
  * all exercise distinct tile layouts), while planning NO single-partition
  * exchange over the ranked relation itself. */
class GlobalRankSpec extends SparkSpec {

  import spark.implicits._

  private def truth(n: Int): Seq[(Long, Long, Int)] = {
    // rank/ntile truth computed by the engine's own window on a tiny
    // relation (sanctioned at test scale) — desc value, id tie-break.
    val df = testDf(n)
    df.select(col("id"), col("v"),
        row_number().over(Window.orderBy(col("v").desc, col("id"))).as("r"),
        ntile(5).over(Window.orderBy(col("v").desc, col("id"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong, r.getInt(3)))
      .toSeq.sortBy(_._1)
  }

  /** Deterministic values with deliberate TIES in v (id breaks them). */
  private def testDf(n: Int) =
    spark.range(n.toLong).select(col("id"), (col("id") * 37 % 11).as("v"))

  private def ranked(n: Int): Seq[(Long, Long, Int)] = {
    val df = testDf(n)
    val r = GlobalRank.withRankAndTotal(df,
      Seq(col("v").desc, col("id")), "r", "n")
    r.select(col("id"), col("r"),
        GlobalRank.ntileFromRank(col("r"), col("n"), 5).as("t"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
      .toSeq.sortBy(_._1)
  }

  for (n <- (1 to 7) :+ 23 :+ 100 :+ 257) {
    test(s"rank + ntile(5) match the window truth at n=$n") {
      // row_number over an unpartitioned window IS what GlobalRank
      // replaces; rank must match exactly, tile must match ntile's
      // remainder layout (first n%5 tiles one row larger).
      assert(ranked(n) == truth(n))
    }
  }

  test("totalCol carries the exact relation size") {
    val df = testDf(41)
    val r = GlobalRank.withRankAndTotal(df, Seq(col("v"), col("id")), "r", "n")
    assert(r.select(col("n")).distinct().as[Long].collect().toSeq == Seq(41L))
  }

  for (n <- Seq(1, 7, 100, 257)) {
    test(s"prefix sum + total match the global-window truth at n=$n") {
      val df = testDf(n)
      val truth = df.select(col("id"),
          sum(col("v")).over(Window.orderBy(col("v").desc, col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      val got = GlobalRank.withPrefixSumAndTotal(df,
          Seq(col("v").desc, col("id")), col("v"), "c", "t")
        .select(col("id"), col("c"), col("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .sortBy(_._1)
      assert(got.map(x => (x._1, x._2)) == truth)
      val total = (0 until n).map(i => i.toLong * 37 % 11).sum
      assert(got.map(_._3).distinct == Seq(total))
    }
  }

  test("no single-partition exchange over the ranked relation") {
    // The ≤P-row per-partition-counts aggregate legitimately funnels to
    // one task (constant-bounded); the DATA path must not. Assert every
    // SinglePartition exchange in the plan sits above an Aggregate.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val df = spark.range(10000L).select(col("id"), (col("id") % 97).as("v"))
    val plan = GlobalRank.withRankAndTotal(df, Seq(col("v").desc, col("id")), "r", "n")
      .queryExecution.executedPlan
    val whole = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val bad = whole.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
          !e.child.exists(_.nodeName.contains("Aggregate")) =>
        s"${e.nodeName} <- ${e.child.nodeName}"
    }
    assert(bad.isEmpty, s"single-partition exchange over data: $bad")
  }
}
