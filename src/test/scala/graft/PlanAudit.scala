package graft

/** Scratch tool: prints condensed physical plans for the scale-critical
  * queries so join strategy / pushdown / window shape can be audited. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    val d = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_pushdown", "q04_join_multi", "q13_p75_nearest_rank",
               "q34_minhash_pairs", "q38_cosine_topk")
    for (q <- qs) {
      println(s"########## $q")
      val plan = SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      println(plan.linesIterator
        .filter(l => Seq("PushedFilters", "Join", "Exchange", "ReadSchema",
                         "Window", "Sort", "HashAggregate").exists(l.contains))
        .map(_.trim.take(200)).take(30).mkString("\n"))
    }
    spark.stop()
  }
}
