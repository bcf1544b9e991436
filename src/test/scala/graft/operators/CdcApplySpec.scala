package graft.operators

import graft.SparkSpec

/** Semantics pins for the CDC MERGE kernel: latest-op-wins under the ord
  * tuple (not input order), tombstone drop, pass-through for untouched
  * base keys, the insert path (key only in the log), op-doubles-as-payload
  * column handling, and the scale shape (one aggregate + one join — no
  * Window over the log). */
class CdcApplySpec extends SparkSpec {

  private def base = {
    val session = spark
    import session.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
  }

  /** (key, ord1, ord2, op, v) */
  private def log(rows: (Long, Long, Long, String, Double)*) = {
    val session = spark
    import session.implicits._
    rows.toSeq.toDF("k", "t", "i", "op", "v")
  }

  private def apply(changes: org.apache.spark.sql.DataFrame) =
    CdcApply.applyLog(base, changes, "k", "k", Seq("t", "i"), "op", "D",
        Seq("op", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1).toSeq

  test("latest-op-wins by ord tuple, not input order; untouched keys pass through") {
    // Key 1: the later-ord update appears FIRST in the data.
    val out = apply(log((1L, 20L, 0L, "U", 9.0), (1L, 10L, 0L, "U", 1.0)))
    assert(out == Seq(
      (1L, "a", Some("U"), Some(9.0)),
      (2L, "b", None, None),
      (3L, "c", None, None)))
  }

  test("winning tombstone drops the key; superseded tombstone does not") {
    val out = apply(log(
      (1L, 10L, 0L, "U", 1.0), (1L, 20L, 0L, "D", 0.0),   // delete wins
      (2L, 10L, 0L, "D", 0.0), (2L, 20L, 0L, "U", 5.0)))  // update wins
    assert(out == Seq(
      (2L, "b", Some("U"), Some(5.0)),
      (3L, "c", None, None)))
  }

  test("ord tiebreak within equal first component uses the second") {
    val out = apply(log((1L, 10L, 1L, "U", 1.0), (1L, 10L, 2L, "U", 2.0)))
    assert(out.head == ((1L, "a", Some("U"), Some(2.0))))
  }

  test("insert path: key only in the log surfaces with null base columns") {
    val rows = CdcApply.applyLog(base, log((9L, 10L, 0L, "U", 4.0)),
        "k", "k", Seq("t", "i"), "op", "D", Seq("v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, Some("a"), None), (2L, Some("b"), None), (3L, Some("c"), None),
      (9L, None, Some(4.0))))
  }

  test("deleted insert-only key stays absent") {
    assert(apply(log((9L, 10L, 0L, "D", 0.0))).map(_._1) == Seq(1L, 2L, 3L))
  }

  test("plan shape: no Window over the log — latest is a keyed aggregate") {
    val plan = CdcApply.latestChanges(log((1L, 10L, 0L, "U", 1.0)),
      "k", Seq("t", "i"), "op", Seq("v"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
