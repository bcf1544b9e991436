package graft

/** Scaling-slope probe: runs every gate query warm (same cold+warm
  * noop-sink protocol as [[Bench]]) at TWO scale factors in ONE JVM and
  * reports the per-query time ratio large/small. The single-sf bench can
  * say a query is fast at sf0.1 and still hide superlinearity; the slope
  * is the strongest local proxy for "would this survive 100 TB" the
  * container can measure. sf0.01→sf0.1 is 10× on the TPC-H-ish tables
  * (documents/embeddings scale 10×/4× — only sf0.1 exercises their
  * n-derived index geometry), so a well-behaved query's slope is ≤~10 plus
  * constant overhead; the flag threshold is 15× AND a large-sf time above
  * [[MinFlagSeconds]] — sub-half-second queries are timer noise, not
  * scaling evidence.
  *
  * Usage: runMain graft.BenchSlope [smallDir largeDir]; prints ONE JSON
  * line {"metric":"slope","small":…,"large":…,"slope":…,"flagged":[…]}.
  */
object BenchSlope {

  private val FlagRatio = 15.0
  private val MinFlagSeconds = 0.5

  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val large = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    RunCoord.registerJvm()
    // Same machine-wide serialization as Bench: a slope probe racing the
    // driver bench contaminates BOTH artifacts.
    val (lock, waited) = RunCoord.acquireBenchLock(maxWaitS = 45 * 60)
    try mainLocked(small, large, cpus, lock != null, waited)
    finally RunCoord.releaseBenchLock(lock)
  }

  private def mainLocked(small: String, large: String, cpus: String,
                         lockAcquired: Boolean, lockWaitS: Double): Unit = {
    val spark = GraftSession.local(cpus)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def warmTimes(sfDir: String): Map[String, Double] = {
      val out = scala.collection.mutable.LinkedHashMap[String, Double]()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          // Accumulated JVM state is the probe's main measurement hazard:
          // ~170 executions in one JVM pile up unreferenced RDD/shuffle/
          // localCheckpoint blocks faster than the async ContextCleaner
          // retires them (it only acts on GC'd references), and late-
          // alphabet queries at the LARGE sf read 10-50x inflated — the
          // round-11 XL probe measured q50 at 86s in-probe vs 3.6s in an
          // isolated JVM, all slope, no plan change. An explicit GC before
          // each query's cold run lets the cleaner catch up; it costs
          // ~100ms per query and is outside the timed window.
          System.gc()
          once() // cold: JIT + MaterializeOnce index builds, not reported
          out(name) = once()
        } catch { case e: Throwable =>
          System.err.println(s"[slope] $name FAILED at $sfDir: ${e.getMessage}")
        }
      }
      out.toMap
    }
    val ts = warmTimes(small)
    val tl = warmTimes(large)
    val slope = ts.keySet.intersect(tl.keySet).toSeq.sorted.map { q =>
      q -> math.rint(tl(q) / math.max(ts(q), 1e-3) * 100) / 100
    }
    val flagged = slope.collect {
      case (q, r) if r > FlagRatio && tl(q) > MinFlagSeconds => q
    }
    def obj(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    def round3(m: Map[String, Double]): Seq[(String, Double)] =
      m.toSeq.sortBy(_._1).map { case (k, v) => k -> math.rint(v * 1000) / 1000 }
    println(s"""{"metric":"slope","unit":"ratio","small":"$small","large":"$large","other_graft_jvms":${RunCoord.otherGraftJvms()},"lock_acquired":$lockAcquired,"lock_wait_s":${math.rint(lockWaitS * 10) / 10},"flag_rule":"ratio>$FlagRatio and large>${MinFlagSeconds}s","warm_small":${obj(round3(ts))},"warm_large":${obj(round3(tl))},"slope":${obj(slope)},"flagged":${flagged.map(q => s"\"$q\"").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
