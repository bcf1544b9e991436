package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  import EventStreams.{Event, UserRunning}

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window agg runs incrementally under a watermark") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Event]
    val counts = EventStreams.tumblingHourly(input.toDF(), withWatermark = true)
    val q = counts.writeStream
      .format("memory").queryName("tumbling").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "view", 1.0),
        Event(2, ts("2024-01-01 10:55:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 11:10:00"), 2, "click", 3.0))
      q.processAllAvailable()
      // Watermark = 11:10 - 2h: the 10:00 window is still open -> nothing
      // emitted in append mode yet.
      assert(session.sql("SELECT * FROM tumbling").count() == 0)

      // Advance event time far enough to close the 10:00 and 11:00 windows.
      input.addData(Event(4, ts("2024-01-01 14:00:00"), 3, "view", 4.0))
      q.processAllAvailable()
      val rows = session.sql(
        "SELECT window_start, event_type, n, sum_value FROM tumbling ORDER BY window_start")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq == Seq(
        ("2024-01-01 10:00:00", "view", 2L, 3.0),
        ("2024-01-01 11:00:00", "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Event]
    val totals = EventStreams.runningUserTotals(input.toDS())
    val q = totals.writeStream
      .format("memory").queryName("running").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "view", 1.25),
        Event(2, ts("2024-01-01 10:01:00"), 7, "click", 2.50))
      q.processAllAvailable()
      input.addData(Event(3, ts("2024-01-01 10:02:00"), 7, "view", 0.25))
      q.processAllAvailable()
      val rows = session.sql("SELECT * FROM running").as[UserRunning].collect()
      // Two emissions for user 7: (2, 3.75) then the carried-forward (3, 4.0).
      assert(rows.map(r => (r.n_events, r.total_value)).toSet ==
        Set((2L, 3.75), (3L, 4.0)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with in-window clicks") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Event]
    val pairs = EventStreams.purchaseClickPairs(input.toDF(), withWatermark = true)
    val q = pairs.writeStream
      .format("memory").queryName("ssjoin").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Event(2, ts("2024-01-01 10:30:00"), 1, "purchase", 5.0), // in window
        Event(3, ts("2024-01-01 08:00:00"), 2, "click", 0.0),
        Event(4, ts("2024-01-01 10:30:00"), 2, "purchase", 5.0)) // click too old
      q.processAllAvailable()
      // advance the watermark so buffered state flushes
      input.addData(Event(9, ts("2024-01-01 16:00:00"), 3, "view", 0.0))
      q.processAllAvailable()
      val rows = session.sql(
        "SELECT purchase_id, click_id, user_id, gap_us FROM ssjoin")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq((2L, 1L, 1L, 1800L * 1000000)))
    } finally q.stop()
  }

  test("file-to-file: parquet source -> watermarked agg -> parquet sink across checkpointed restarts") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("evt_src").toString
    val out = java.nio.file.Files.createTempDirectory("evt_out").toString
    val chk = java.nio.file.Files.createTempDirectory("evt_chk").toString

    def append(events: Seq[Event]): Unit =
      events.toDF().withColumn("props", lit("{}"))
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = EventStreams.tumblingHourly(
          EventStreams.readEventStream(session, src), withWatermark = true)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val original = Seq(
      Event(1, ts("2024-01-01 09:10:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 09:20:00"), 2, "view", 2.0),
      Event(3, ts("2024-01-01 10:40:00"), 1, "click", 3.0),
      Event(4, ts("2024-01-01 11:59:59"), 3, "view", 4.0))
    val sentinelA = Event(90, ts("2024-01-11 00:00:00"), 9, "sentinel_a", 0.5)
    val sentinelB = Event(91, ts("2024-01-21 00:00:00"), 9, "sentinel_b", 0.5)

    append(original)
    runOnce() // establishes the watermark in the checkpoint
    append(Seq(sentinelA))
    runOnce() // emits windows closed under the previous watermark
    append(Seq(sentinelB))
    runOnce() // watermark now far past every original + sentinel-A window

    val streamed = session.read.parquet(out)
      .collect().map(_.toSeq).toSet
    val batchOriginal = EventStreams.tumblingHourly(original.toDF())
      .collect().map(_.toSeq).toSet
    val batchWithA = EventStreams.tumblingHourly((original :+ sentinelA).toDF())
      .collect().map(_.toSeq).toSet
    // Every original window must reach the file sink exactly once across
    // the three restarts; sentinel B's own window is still open.
    assert(batchOriginal.subsetOf(streamed),
      s"missing windows: ${batchOriginal.diff(streamed)}")
    assert(streamed.subsetOf(batchWithA),
      s"unexpected rows: ${streamed.diff(batchWithA)}")
  }

  test("batch and streaming tumbling aggregations agree on the same data") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val events = Seq(
      Event(1, ts("2024-01-01 09:10:00"), 1, "view", 1.0),
      Event(2, ts("2024-01-01 09:20:00"), 2, "view", 2.0),
      Event(3, ts("2024-01-01 10:40:00"), 1, "click", 3.0),
      Event(4, ts("2024-01-01 23:59:59"), 3, "view", 4.0))
    val batch = EventStreams.tumblingHourly(events.toDF())
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[Event]
    val q = EventStreams.tumblingHourly(input.toDF(), withWatermark = true)
      .writeStream.format("memory").queryName("agree")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = session.sql(
        "SELECT window_start, event_type, n, sum_value FROM agree")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("micro-batch gate (q186) deletes its slice dir; results stay readable from the memory sink") {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def streamDirs: Set[String] = java.nio.file.Files.list(tmp).iterator().asScala
      .map(_.getFileName.toString)
      // Scoped to THIS JVM's dirs (pid prefix): a concurrent graft process
      // writing its own graft_stream_* must not trip this snapshot.
      .filter(_.startsWith(s"graft_stream_${graft.queries.StreamingQueries.jvmTag}_")).toSet
    val before = streamDirs
    val out = graft.SparkEntry.queries("q186_stream_sessions_microbatch")(
      spark, "/root/testdata/sf0.001")
    // Counting AFTER cleanup proves the sink is self-contained in memory —
    // the result must not depend on the deleted slice files.
    assert(out.count() > 0)
    // subsetOf, not ==: a fresh JVM's run ids restart at 1, so the gate
    // may legitimately REUSE (and then delete) a stale leftover dir from
    // an earlier process; what must never happen is a NEW dir surviving.
    assert(streamDirs.subsetOf(before),
      "the slice input dir must be removed once the stream stops")
  }
}
