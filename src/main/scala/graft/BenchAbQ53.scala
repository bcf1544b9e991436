package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B micro-benchmark for q53's exact-dedup stage: the typed
  * `flatMapGroupsWithState` kernel run in batch mode (the operator the
  * gate exists to test — object serialization per row, one shuffle on
  * fingerprint) against the pure-SQL window formulation of the same
  * semantics (min-over-fingerprint partition — stays in Tungsten rows and
  * whole-stage codegen end to end; this is also what the DuckDB oracle
  * computes). Both are profiled with [[Bench.profile]] through the same
  * noop-sink protocol, and the outputs are compared EXACTLY before any
  * timing is trusted — a faster wrong answer is not a candidate.
  *
  * The window form is batch-only (a partition-window over an unbounded
  * stream is not expressible); the typed kernel is the streaming operator.
  * So the A/B cannot "adopt" the window form into StreamingDedup — it
  * bounds the kernel's batch-mode overhead instead, and the adjudication
  * note records which side wins and by how much.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchAbQ53 [runs=8]
  */
object BenchAbQ53 {

  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def fps() = graft.streaming.StreamingDedup.fingerprints(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .as[graft.streaming.StreamingDedup.DocText])

    def kernel(): DataFrame =
      graft.streaming.StreamingDedup.exactDedup(fps()).toDF()
        .orderBy(col("doc_id"))

    def windowSql(): DataFrame = {
      val w = Window.partitionBy(col("fp"))
      fps().toDF()
        .withColumn("first_id", min(col("doc_id")).over(w))
        .withColumn("is_dup", col("doc_id") =!= col("first_id"))
        .select(col("doc_id"), col("fp"), col("first_id"), col("is_dup"))
        .orderBy(col("doc_id"))
    }

    // Hash-identity first: same rows, same order, same types.
    val a = kernel().collect().toSeq
    val b = windowSql().collect().toSeq
    val identical = a == b
    require(a.nonEmpty, "empty corpus — nothing compared")

    spark.range(1000000).selectExpr("sum(id)").collect()
    def prof(mk: () => DataFrame) = Bench.profile(spark,
      () => mk().write.format("noop").mode("overwrite").save(), runs)
    val (tk, jk) = prof(kernel _)
    val (tw, jw) = prof(windowSql _)
    def arr[T](xs: Seq[T]) = xs.mkString("[", ",", "]")
    def r3(xs: Seq[Double]) = xs.map(t => math.rint(t * 1000) / 1000)
    println(s"""{"ab":"q53_exact_dedup","sf":"$sfDir","identical":$identical,"rows":${a.length},"kernel":{"times":${arr(r3(tk))},"jobs":${arr(jk)},"warm":${Bench.profiledWarm(tk)}},"window":{"times":${arr(r3(tw))},"jobs":${arr(jw)},"warm":${Bench.profiledWarm(tw)}}}""")
    spark.stop()
  }
}
