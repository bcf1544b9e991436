package graft.queries

/** Dev tool: print the formatted physical plan of named gate queries.
  * Usage: sbt "Test/runMain graft.queries.PlanDump <sfDir> <q1,q2,...>" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val names = args(1).split(',')
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
