package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface over the `events` stream (SURVEY §7.4
  * extension): event-time windows with watermarks, session windows, and a
  * custom-state operator via flatMapGroupsWithState.
  *
  * Every aggregation here is expressed so the SAME transformation runs in
  * batch mode (the gate queries in StreamingQueries call these with a batch
  * DataFrame) — Structured Streaming's unified Dataset API is the point:
  * correctness is oracle-checked in batch, the streaming execution adds
  * watermarking/incremental state on top.
  *
  * Scale notes: windowed aggs shuffle on (window, key) — high cardinality,
  * AQE-friendly. Watermarks bound state: 2h late tolerance keeps per-key
  * state to a handful of open windows regardless of stream length.
  */
object EventStreams {

  /** Hourly tumbling counts + fixed-point value sums per event type. */
  def tumblingHourly(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           (sum(round(col("value") * 100).cast("long")) / 100.0)
             .cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("event_type"), col("n"), col("sum_value"))
  }

  /** 2-hour windows sliding hourly (each event lands in two windows). */
  def slidingTwoHour(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
              col("n"))
  }

  /** Per-user session windows with a 2-hour inactivity gap. */
  def userSessions(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src
      .groupBy(session_window(col("ts"), "2 hours").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("session_start"),
              col("n_events"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom streaming state via flatMapGroupsWithState: a per-user running
    * (count, value-sum) emitted on every update — the
    * KeyValueGroupedDataset custom-state shape for logic windows can't
    * express. State is two numbers per user: bounded regardless of stream
    * length. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var cents = math.round(prev.total_value * 100)
          batch.foreach { e => n += 1; cents += math.round(e.value * 100) }
          val next = UserRunning(userId, n, cents / 100.0)
          state.update(next)
          Iterator.single(next)
      }
  }

  final case class SessEvent(user_id: Long, event_id: Long,
                             event_type: String, us: Long)
  final case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                              n_types: Long, dur_s: Long, first_event: Long)
  final case class SessionAcc(session_idx: Long, first_us: Long, last_us: Long,
                              first_event: Long, n_events: Long,
                              types: Seq[String])

  /** Gap-based sessionization as a CUSTOM-STATE streaming kernel — the
    * flatMapGroupsWithState twin of the batch window formulation (q130):
    * per-user state is ONE open-session accumulator (bounded by the
    * event-type cardinality, regardless of stream length); a session
    * closes when the gap to the next event exceeds `gapUs`. Events are
    * sorted (us, event_id) per invocation — the same unique order the
    * batch windows use, so the session split is identical. In BATCH
    * execution each user's complete history arrives in one invocation
    * with empty state, so the emitted rows ARE the exact final sessions
    * (the q46/q53 batch-gate pattern); in streaming, the still-open
    * session is emitted as a snapshot each micro-batch and carried in
    * state for continuation. */
  def sessionize(events: Dataset[SessEvent],
                 gapUs: Long = 1800000000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[SessEvent], state: GroupState[SessionAcc]) =>
          val evs = batch.toArray.sortBy(e => (e.us, e.event_id))
          def close(a: SessionAcc): SessionOut =
            SessionOut(userId, a.session_idx, a.n_events, a.types.size.toLong,
              (a.last_us - a.first_us) / 1000000L, a.first_event)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var acc: SessionAcc = state.getOption.orNull
          evs.foreach { e =>
            if (acc == null)
              acc = SessionAcc(1L, e.us, e.us, e.event_id, 1L, Seq(e.event_type))
            else if (e.us - acc.last_us > gapUs) {
              out += close(acc)
              acc = SessionAcc(acc.session_idx + 1L, e.us, e.us, e.event_id,
                1L, Seq(e.event_type))
            } else
              acc = acc.copy(last_us = e.us, n_events = acc.n_events + 1L,
                types = if (acc.types.contains(e.event_type)) acc.types
                        else acc.types :+ e.event_type)
          }
          if (acc != null) { out += close(acc); state.update(acc) }
          out.iterator
      }
  }

  /** Stream-STREAM interval join: every (purchase, click) pair by the
    * same user with the click in the hour at-or-before the purchase.
    * Under Structured Streaming both sides carry watermarks and the
    * time-range predicate is what BOUNDS JOIN STATE — Spark buffers each
    * side only within `watermark + range` of event time, so state is
    * O(rate × window), not O(stream). In batch the identical code is a
    * range-predicate equi-join on user_id (sort-merge + post-filter; the
    * range never becomes a cartesian because user_id is an equality key).
    */
  def purchaseClickPairs(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    def side(tpe: String) = {
      val f = events.filter(col("event_type") === tpe)
      if (withWatermark) f.withWatermark("ts", "2 hours") else f
    }
    val p = side("purchase").select(col("event_id").as("purchase_id"),
      col("ts").as("p_ts"), col("user_id"))
    val c = side("click").select(col("event_id").as("click_id"),
      col("ts").as("c_ts"), col("user_id").as("c_user"))
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** Streaming source over a parquet events directory (same schema as the
    * corpus `events` table post ns→µs conversion). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
}
