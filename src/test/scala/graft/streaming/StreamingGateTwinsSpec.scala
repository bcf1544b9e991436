package graft.streaming

import graft.{SparkSpec, SparkEntry}

/** In-JVM oracle-identity pins for the round's real-execution streaming
  * gates (the per-tier hash gate proves DuckDB equality; these prove the
  * streaming run equals its BATCH TWIN without leaving Spark, plus the
  * temp-dir hygiene discipline):
  *  - q198: the dedup kernel recovered across a forced crash/replay equals
  *    the batch kernel (q53), with no duplicate sink rows from the replay;
  *  - q199: the stream-static broadcast enrichment equals the batch join;
  *  - q200: the watermarked stream-stream interval join equals the batch
  *    range join (q57) — i.e. no pair was lost to premature state
  *    eviction and none duplicated. */
class StreamingGateTwinsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[Seq[Any]] =
    SparkEntry.queries(q)(spark, sf).collect().map(_.toSeq).toSeq

  private def stagingDirs: Set[String] = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    scala.util.Using.resource(java.nio.file.Files.list(tmp)) { ls =>
      ls.iterator().asScala.map(_.getFileName.toString)
        // Scoped to THIS JVM's dirs (pid prefix): a concurrent graft process
        // writing its own graft_stream_* must not trip this snapshot.
        .filter(_.startsWith(s"graft_stream_${graft.queries.StreamingQueries.jvmTag}_")).toSet
    }
  }

  test("q198: dedup verdicts recovered across a crash equal the batch kernel; no replay duplicates; staging cleaned") {
    val before = stagingDirs
    val streamed = rows("q198_stream_exact_dedup_restart")
    assert(streamed.nonEmpty)
    assert(streamed.distinct.length == streamed.length,
      "replayed trigger wrote duplicate verdict rows")
    assert(streamed == rows("q53_stream_exact_dedup"),
      "restart-recovered dedup verdicts differ from the batch kernel")
    assert(stagingDirs.subsetOf(before),
      "q198 must remove its slice and live-staging dirs")
  }

  test("q199: stream-static enrichment equals the batch broadcast join") {
    val streamed = rows("q199_stream_static_join")
    assert(streamed.nonEmpty)
    val batch = {
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.events(spark, sf)
      val cust = graft.Tables.customer(spark, sf)
      ev.join(cust, col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("c_mktsegment"), col("c_nationkey"))
        .orderBy(col("event_id"))
        .collect().map(_.toSeq).toSeq
    }
    assert(streamed == batch)
  }

  test("q200: watermarked stream-stream join equals the batch interval join") {
    val streamed = rows("q200_stream_stream_join")
    assert(streamed.nonEmpty)
    assert(streamed == rows("q57_interval_join"),
      "stream-stream pairs differ from the batch range join " +
        "(premature state eviction or duplicate emission)")
  }
}
