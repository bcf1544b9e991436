package graft.operators

import graft.SparkSpec
import graft.Tables

/** Bucketing: the co-located-join story for repeated large-large joins at
  * the 100 TB design point — both sides pre-hashed into the same bucket
  * layout so the join needs NO shuffle exchange at read time. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val session = spark
    // Disable broadcast so the plan decision is bucketing's, not the tiny
    // SF's (at 100 TB neither side broadcasts).
    val prevThreshold = session.conf.get("spark.sql.autoBroadcastJoinThreshold")
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      session.sql("DROP TABLE IF EXISTS b_orders")
      session.sql("DROP TABLE IF EXISTS b_lineitem")
      val d = "/root/testdata/sf0.001"
      Tables.orders(session, d)
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      Tables.lineitem(session, d)
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val joined = session.table("b_lineitem")
        .join(session.table("b_orders"),
          session.table("b_lineitem")("l_orderkey") === session.table("b_orders")("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // Both scans expose the bucket layout; the join must not re-shuffle.
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle exchange in:\n$plan")
      assert(joined.count() > 0)

      // Control: the same join on plain parquet scans DOES shuffle.
      val li = Tables.lineitem(session, d)
      val o = Tables.orders(session, d)
      val unbucketed = li.join(o, li("l_orderkey") === o("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      session.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      session.sql("DROP TABLE IF EXISTS b_orders")
      session.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
