package graft.operators

import graft.SparkSpec

/** Machine-checks the co-located-join claim: a join of two tables
  * bucketed by the same (key, count) must plan ZERO shuffle exchanges —
  * and the identical unbucketed join must plan them (the control, so the
  * assertion can't pass vacuously, e.g. via a broadcast that bypasses
  * bucketing). Broadcast is disabled for the duration to force the
  * sort-merge path on both variants. */
class BucketedJoinSpec extends SparkSpec {

  test("same-key same-count bucketed join plans zero shuffles; unbucketed control shuffles") {
    val session = spark
    import session.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(0, 10000).select($"id".as("k"), ($"id" * 2).as("va"))
      val b = spark.range(0, 10000).select($"id".as("k"), ($"id" * 3).as("vb"))
      BucketedTables.writeBucketed(a, "graft_bkt_a", "k", 8)
      BucketedTables.writeBucketed(b, "graft_bkt_b", "k", 8)

      val j = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(j.count() == 10000)

      val control = a.join(b, "k")
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"),
        "control (unbucketed) join unexpectedly planned no shuffle — " +
          "the bucketed assertion would be vacuous")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      BucketedTables.drop(spark, "graft_bkt_a")
      BucketedTables.drop(spark, "graft_bkt_b")
    }
  }
}
