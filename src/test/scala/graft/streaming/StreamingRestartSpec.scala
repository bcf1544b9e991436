package graft.streaming

import graft.{SparkSpec, SparkEntry}

/** The q194 checkpoint-recovery gate, asserted at spec scale: the harness
  * (StreamingQueries.runMicroBatchWithRestart) stops the session-window
  * stream after 4 of 10 slices, deletes the newest commit-log entry (the
  * on-disk state of a crash between the offset write and the commit
  * write), restarts a NEW query from the same checkpoint — which must
  * REPLAY the uncommitted batch — and drains the rest. The per-tier hash
  * gate proves equality with DuckDB; this spec pins the two properties a
  * hash mismatch would only report indirectly:
  *   - the replayed trigger added NO duplicate rows to the sink (the file
  *     sink's transaction log made the replay idempotent);
  *   - the recovered stream's final rows equal the uninterrupted BATCH
  *     session windows (q41) in this very JVM — oracle-identity without
  *     leaving Spark.
  * Plus the temp-dir hygiene discipline: no NEW slice/staging dirs may
  * survive the gate (subsetOf, per the stale-leftover convention). */
class StreamingRestartSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q194: recovered sink equals batch sessions with no replay duplicates; staging dirs cleaned") {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def stagingDirs: Set[String] = java.nio.file.Files.list(tmp).iterator().asScala
      .map(_.getFileName.toString)
      // Scoped to THIS JVM's dirs (pid prefix): a concurrent graft process
      // writing its own graft_stream_* must not trip this snapshot.
      .filter(n => n.startsWith(s"graft_stream_${graft.queries.StreamingQueries.jvmTag}_")).toSet
    val before = stagingDirs

    val rows = SparkEntry.queries("q194_stream_sessions_restart")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(rows.nonEmpty)
    assert(rows.distinct.length == rows.length,
      s"replayed trigger wrote duplicate rows: ${rows.diff(rows.distinct).take(3)}")

    val batch = SparkEntry.queries("q41_session_window")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(rows == batch,
      s"restart-recovered sessions differ from batch windows " +
        s"(${rows.diff(batch).take(2)} vs ${batch.diff(rows).take(2)})")

    assert(stagingDirs.subsetOf(before),
      "q194 must remove its slice and live-staging dirs once both query incarnations stop")
  }
}
