package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Single-query profiler: runs ONE named gate query N times through the
  * same noop-sink execution as [[Bench]] and prints a JSON line with the
  * per-run wall times and per-run Spark JOB COUNTS (via listener). Exists
  * to adjudicate per-query bench flags (`regressed` entries) — the full
  * bench can tell you THAT a query moved; this tells you WHETHER the time
  * is in extra Spark jobs (plan change), in the first-run index build
  * (MaterializeOnce), or in nothing the engine controls (GC/run-order
  * noise shows up as high variance across identical runs).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchOne <query> [runs=5]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [runs]"))
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val times = scala.collection.mutable.ListBuffer[Double]()
    val jobCounts = scala.collection.mutable.ListBuffer[Int]()
    (1 to runs).foreach { _ =>
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      times += (System.nanoTime() - t0) / 1e9
      // listener bus is async; give job-start events a moment to drain
      Thread.sleep(200)
      jobCounts += jobs.get() - j0
    }
    def arr[T](xs: Seq[T]): String = xs.mkString("[", ",", "]")
    println(s"""{"query":"$name","sf":"$sfDir","times":${arr(times.toSeq.map(t => math.rint(t * 1000) / 1000))},"jobs":${arr(jobCounts.toSeq)}}""")
    spark.stop()
  }
}
