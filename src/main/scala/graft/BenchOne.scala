package graft

/** Single-query profiler: runs ONE named gate query N times through the
  * same noop-sink execution as [[Bench]] and prints a JSON line with the
  * per-run wall times and per-run Spark JOB COUNTS (via listener). Exists
  * to adjudicate per-query bench flags (`regressed` entries) — the full
  * bench can tell you THAT a query moved; this tells you WHETHER the time
  * is in extra Spark jobs (plan change), in the first-run index build
  * (MaterializeOnce), or in nothing the engine controls (GC/run-order
  * noise shows up as high variance across identical runs). The same
  * profiling loop ([[Bench.profile]]) now also runs automatically inside
  * the full bench for every flagged query; this entrypoint remains for
  * deliberate isolated-JVM profiling, which removes even the bench
  * sweep's GC/heap context from the measurement.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchOne <query> [runs=5]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [runs]"))
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    RunCoord.registerJvm()
    // Blessing profiles demand isolation MORE than the sweep does — take
    // the same machine-wide lock and stamp peer visibility.
    val (lock, waited) = RunCoord.acquireBenchLock(maxWaitS = 45 * 60)
    try {
      val spark = GraftSession.local(cpus)
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      spark.range(1000000).selectExpr("sum(id)").collect()
      val (times, jobCounts) = Bench.profile(spark,
        () => fn(spark, sfDir).write.format("noop").mode("overwrite").save(), runs)
      def arr[T](xs: Seq[T]): String = xs.mkString("[", ",", "]")
      println(s"""{"query":"$name","sf":"$sfDir","other_graft_jvms":${RunCoord.otherGraftJvms()},"lock_acquired":${lock != null},"lock_wait_s":${math.rint(waited * 10) / 10},"times":${arr(times.map(t => math.rint(t * 1000) / 1000))},"jobs":${arr(jobCounts)}}""")
      spark.stop()
    } finally RunCoord.releaseBenchLock(lock)
  }
}
