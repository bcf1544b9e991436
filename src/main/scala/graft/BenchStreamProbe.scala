package graft

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-trigger cost probe for the REAL micro-batch gates: runs one gate
  * through the normal noop-sink execution with a StreamingQueryListener
  * attached and prints every micro-batch's StreamingQueryProgress JSON
  * (durationMs breakdown — addBatch / getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets — plus stateOperators commit
  * times and source/sink descriptions). This is the guide-§1 "measure
  * first" tool for the streaming per-trigger floor: the wall clock says a
  * gate costs N seconds; this says which part of each trigger the time
  * lives in, which is the only way to choose between state-store,
  * offset-log, and planning remedies.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchStreamProbe <query> [runs=2]
  */
object BenchStreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: BenchStreamProbe <query> [runs]"))
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        buf.add(e.progress.json)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    import scala.jdk.CollectionConverters._
    (1 to runs).foreach { i =>
      buf.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus is async; let progress events drain
      println(s"""{"query":"$name","run":$i,"wall_s":${math.rint(wall * 1000) / 1000},"progress":[${buf.asScala.mkString(",")}]}""")
    }
    spark.stop()
  }
}
