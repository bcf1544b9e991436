package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._
import java.time.ZoneOffset

/** Imperative in-process replays of the round-12 event rollups (q113
  * cohort retention, q116 last-touch attribution, q118 co-occurrence
  * lift) at sf0.001 — each query's declarative windows/joins must equal
  * the obvious single-threaded walk over the same rows. */
class EventRollupsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  private lazy val rows = Tables.events(spark, d)
    .select(col("user_id"), col("event_id"), col("event_type"),
      col("value"), col("ts")).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
      r.getTimestamp(4)))

  test("q113 cohort retention equals a per-user day walk") {
    val byUserDays = rows
      .map(r => (r._1, r._5.toInstant.atZone(ZoneOffset.UTC).toLocalDate))
      .distinct
    val d0 = byUserDays.groupBy(_._1).map { case (u, ds) =>
      u -> ds.map(_._2).min(Ordering.by((x: java.time.LocalDate) => x.toEpochDay))
    }
    val cohortN = d0.groupBy(_._2).map { case (c, us) => c -> us.size.toLong }
    val cells = byUserDays.groupBy { case (u, day) =>
      (d0(u), day.toEpochDay - d0(u).toEpochDay)
    }.map { case (k, v) => k -> v.size.toLong }

    val got = SparkEntry.queries("q113_retention")(spark, d).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val key = (java.time.LocalDate.parse(r.getString(0)), r.getInt(1).toLong)
      assert(cells(key) === r.getLong(2), s"n_active at $key")
      assert(cohortN(key._1) === r.getLong(3), s"cohort_n at $key")
      assert(r.getDouble(4) ===
        round6(cells(key).toDouble / cohortN(key._1)), s"retention at $key")
    }
  }

  test("q116 attribution equals a per-user ordered replay") {
    val acc = scala.collection.mutable.Map[String, (Long, Long)]()
    rows.groupBy(_._1).foreach { case (_, es) =>
      var lastTouch: String = null
      es.sortBy(e => (e._5.getTime, e._5.getNanos, e._2)).foreach { e =>
        if (e._3 == "purchase") {
          val k = if (lastTouch == null) "none" else lastTouch
          val cents = BigDecimal(e._4 * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          val (c, s) = acc.getOrElse(k, (0L, 0L))
          acc(k) = (c + 1, s + cents)
        } else lastTouch = e._3
      }
    }
    val got = SparkEntry.queries("q116_attribution")(spark, d).collect()
    assert(got.length === acc.size)
    got.foreach { r =>
      val (c, cents) = acc(r.getString(0))
      assert(r.getLong(1) === c, s"count at ${r.getString(0)}")
      assert(r.getDouble(2) === cents / 100.0, s"revenue at ${r.getString(0)}")
    }
  }

  test("q118 lift equals explicit per-user type-set pairs") {
    val sets = rows.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).toSet }
    val nUsers = sets.size.toLong
    val per = sets.values.toSeq.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val both = sets.values.toSeq
      .flatMap(s => for (a <- s; b <- s if a < b) yield (a, b))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }

    val got = SparkEntry.queries("q118_type_lift")(spark, d).collect()
    assert(got.length === both.size)
    got.foreach { r =>
      val p = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === both(p), s"n_both at $p")
      assert(r.getLong(3) === per(p._1) && r.getLong(4) === per(p._2))
      assert(r.getLong(5) === nUsers)
      assert(r.getDouble(6) ===
        round6(both(p).toDouble * nUsers / (per(p._1) * per(p._2))), s"lift at $p")
    }
  }
}
