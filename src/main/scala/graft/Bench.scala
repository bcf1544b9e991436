package graft

/** Benchmark entrypoint (driver contract): times every gate query at the
  * given scale-factor directory and prints ONE JSON line.
  *
  * Failure policy: a query that throws is reported in a `failed` array and
  * contributes nothing to `queries`/`value` — a crashing query must never
  * masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    // JVM/codegen warmup so the first timed query is not charged session
    // startup; deliberately does NOT touch the corpus (I/O stays timed).
    spark.range(1000000).selectExpr("sum(id)").collect()
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
    }
    val qs = timings.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val fj = failed.map(n => s"\"$n\"").mkString("[", ",", "]")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
