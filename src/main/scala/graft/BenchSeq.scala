package graft

/** Run-order profiler: executes a comma-separated list of gate queries in
  * the GIVEN order through the same cold+warm noop-sink loop as [[Bench]],
  * printing one JSON line with per-query cold/warm times and warm job
  * counts. Exists to adjudicate IN-LOOP interference flags — [[BenchOne]]
  * profiles a query in an isolated quiescent JVM, which is exactly the
  * context that made q195's reproducible in-loop 5× look "environmental"
  * (VERDICT r15): this tool reproduces the sweep's neighborhood (e.g. the
  * q192–q194 streaming gates immediately before q195) so the interference
  * itself can be bisected.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchSeq q192…,q193…,q195…
  */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(sys.error("usage: BenchSeq <q1,q2,…>"))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    RunCoord.registerJvm()
    val spark = GraftSession.local(cpus)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val out = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      val (times, jobs) = Bench.profile(spark,
        () => fn(spark, sfDir).write.format("noop").mode("overwrite").save(), 2)
      s""""$name":{"cold":${math.rint(times(0) * 1000) / 1000},"warm":${math.rint(times(1) * 1000) / 1000},"jobs":${jobs.mkString("[", ",", "]")}}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
