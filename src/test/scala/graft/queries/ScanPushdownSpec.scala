package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Locks in the scan-level scale behaviors: filters and column pruning
  * must reach the parquet scan, and partition filters must prune
  * partitioned layouts. A scan that reads all columns for a 2-column
  * projection — or all partitions for a one-partition predicate — is a
  * plan regression even while results stay correct. */
class ScanPushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q02: filters and 4-column read schema reach the parquet scan") {
    val plan = SparkEntry.queries("q02_filter_pushdown")(spark, sf)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("GreaterThanOrEqual(l_shipdate") ||
           plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushed shipdate filter in:\n$scanLine")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // Only the four referenced columns, not the 16-column lineitem row.
    assert(readSchema.contains("l_shipdate") && readSchema.contains("l_discount") &&
           readSchema.contains("l_quantity") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"scan reads unreferenced columns:\n$readSchema")
  }

  test("partitioned layouts prune partitions on the partition predicate") {
    val dir = java.nio.file.Files.createTempDirectory("part_orders").toString
    graft.Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("o_year") === 1995)
      .agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    // The year predicate must live in PartitionFilters (directory pruning),
    // not DataFilters (post-scan row filtering).
    assert(pf.contains("o_year") && pf.contains("1995"),
      s"partition filter not applied:\n${pf}\n${plan.take(1500)}")
    // And the executed scan reads exactly ONE file — the 1995 directory's —
    // out of the seven year partitions on disk (scan metrics, post-run).
    q.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case qs: QueryStageExec => scans(qs.plan)
      case l if l.children.isEmpty && l.metrics.contains("numFiles") => Seq(l)
      case other => other.children.flatMap(scans)
    }
    val numFiles = scans(q.queryExecution.executedPlan).map(_.metrics("numFiles").value)
    assert(numFiles == Seq(1L), s"pruned scan should read 1 file, read: $numFiles")
  }
}
