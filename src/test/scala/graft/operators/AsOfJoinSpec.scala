package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Semantics pins for the union+window as-of join: at-or-before
  * visibility, greatest-tie resolution at equal timestamps, LEFT (null)
  * behavior with no prior right row, per-key isolation, and equality
  * with the naive per-row argmax reference on a randomized fixture. */
case class AsOfRow(event_id: Long, ts: Timestamp, user_id: Long)

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private type L = AsOfRow
  private val L = AsOfRow

  private def run(left: Seq[L], right: Seq[L]) = {
    val session = spark
    import session.implicits._
    AsOfJoin.asOf(left.toDF(), right.toDF(), "user_id", "ts", "event_id")
      .selectExpr("event_id", "user_id", "asof.event_id AS match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
  }

  test("latest at-or-before per key; no prior row -> null") {
    val left = Seq(L(10, ts("2024-01-01 10:00:00"), 1),
                   L(11, ts("2024-01-01 12:00:00"), 1),
                   L(12, ts("2024-01-01 09:00:00"), 2))
    val right = Seq(L(1, ts("2024-01-01 09:30:00"), 1),
                    L(2, ts("2024-01-01 11:59:59"), 1),
                    L(3, ts("2024-01-01 09:30:00"), 2)) // after left 12
    assert(run(left, right) == Seq(
      (10L, 1L, Some(1L)),   // only the 09:30 row is at-or-before 10:00
      (11L, 1L, Some(2L)),   // latest prior wins, not first
      (12L, 2L, None)))      // key 2's right row is later -> null
  }

  test("right row at exactly the left timestamp is visible (at-or-before)") {
    val t = ts("2024-01-01 10:00:00")
    assert(run(Seq(L(10, t, 1)), Seq(L(1, t, 1))) == Seq((10L, 1L, Some(1L))))
  }

  test("equal-timestamp right rows resolve to the greatest tie id") {
    val t = ts("2024-01-01 10:00:00")
    val right = Seq(L(5, t, 1), L(9, t, 1), L(7, t, 1))
    assert(run(Seq(L(10, ts("2024-01-01 10:30:00"), 1)), right) ==
      Seq((10L, 1L, Some(9L))))
  }

  test("keys never leak: a match must share the key") {
    val left = Seq(L(10, ts("2024-01-01 10:00:00"), 1))
    val right = Seq(L(1, ts("2024-01-01 09:00:00"), 2))
    assert(run(left, right) == Seq((10L, 1L, None)))
  }

  test("matches the naive per-row argmax on a randomized fixture") {
    val rnd = new scala.util.Random(7)
    def rows(n: Int, idBase: Long) = (0 until n).map { i =>
      L(idBase + i, new Timestamp(1700000000000L + rnd.nextInt(1000) * 1000L),
        rnd.nextInt(5).toLong)
    }
    val left = rows(60, 1000)
    val right = rows(80, 2000)
    val expected = left.map { l =>
      val cands = right.filter(r => r.user_id == l.user_id &&
        !r.ts.after(l.ts))
      val best = if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r.ts.getTime, r.event_id)).event_id)
      (l.event_id, l.user_id, best)
    }.sortBy(_._1)
    assert(run(left, right) == expected)
  }
}
