package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-only behavior of the sessionization kernel (q143's batch gate
  * covers exactness against q130's window formulation): state carries the
  * OPEN session across micro-batches, a later batch can extend it, and a
  * long gap closes it with the right index. */
class SessionizeSpec extends SparkSpec {

  import EventStreams.{SessEvent, SessionOut}

  private val M = 60L * 1000000L // one minute in µs

  test("open session continues across micro-batches; a gap closes it") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[SessEvent]
    val out = EventStreams.sessionize(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("sess").outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two events 5 min apart -> one open session snapshot
      input.addData(SessEvent(7, 1, "view", 0), SessEvent(7, 2, "click", 5 * M))
      q.processAllAvailable()
      val s1 = session.sql("SELECT * FROM sess").as[SessionOut].collect()
      assert(s1.toSeq == Seq(SessionOut(7, 1, 2, 2, 5 * 60, 1)))

      // batch 2: one event 10 min after the last -> SAME session extended
      // (snapshot re-emitted with 3 events), then one 31-min-later event
      // -> session 1 closed at its final shape and session 2 opened.
      input.addData(SessEvent(7, 3, "view", 15 * M),
        SessEvent(7, 4, "purchase", 46 * M))
      q.processAllAvailable()
      val s2 = session.sql("SELECT * FROM sess").as[SessionOut].collect()
      // emissions: the batch-1 snapshot, the closed session 1 (3 events,
      // 15 min span), and the open session 2 snapshot
      assert(s2.toSet == Set(
        SessionOut(7, 1, 2, 2, 5 * 60, 1),
        SessionOut(7, 1, 3, 2, 15 * 60, 1),
        SessionOut(7, 2, 1, 1, 0, 4)))
    } finally q.stop()
  }

  test("a gap of exactly 30 minutes does NOT split (strictly-greater rule)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[SessEvent]
    val out = EventStreams.sessionize(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("sess_edge").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(SessEvent(1, 10, "view", 0), SessEvent(1, 11, "view", 30 * M))
      q.processAllAvailable()
      val rows = session.sql("SELECT * FROM sess_edge").as[SessionOut].collect()
      assert(rows.toSeq == Seq(SessionOut(1, 1, 2, 1, 30 * 60, 10)))
    } finally q.stop()
  }
}
