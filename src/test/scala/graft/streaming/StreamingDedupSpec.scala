package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming dedup: the "seen corpus" lives in flatMapGroupsWithState
  * state, so duplicates must be caught ACROSS micro-batches (the property
  * a per-batch join cannot provide), and under in-order ingestion the
  * kept set must agree with the batch operators' keep-lowest-id rule. */
class StreamingDedupSpec extends SparkSpec {

  import StreamingDedup._

  private val textA = "the quick brown fox jumps over the lazy dog repeatedly"
  private val textB = "completely different content about spark structured streaming state"
  private val textC = "unrelated third document mentioning neither foxes nor spark at all"

  test("exact dedup flags cross-batch duplicates and keeps first arrivals") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[DocText]
    val verdicts = exactDedup(fingerprints(input.toDS()))
    val q = verdicts.writeStream
      .format("memory").queryName("exact_dedup").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(DocText(1, textA), DocText(2, textB))
      q.processAllAvailable()
      // The duplicate of doc 1 arrives TWO batches later: only state can
      // connect them.
      input.addData(DocText(5, textC))
      q.processAllAvailable()
      input.addData(DocText(13, textA), DocText(14, textB))
      q.processAllAvailable()
      val rows = session.sql("SELECT * FROM exact_dedup").as[FpVerdict].collect()
      assert(rows.length == 5)
      val dups = rows.filter(_.is_dup).map(v => (v.doc_id, v.first_id)).toSet
      assert(dups == Set((13L, 1L), (14L, 2L)))
      // Agreement with the batch rule: kept = min doc_id per fingerprint.
      val kept = rows.filterNot(_.is_dup).map(_.doc_id).toSet
      val batchKept = fingerprints(Seq(
          DocText(1, textA), DocText(2, textB), DocText(5, textC),
          DocText(13, textA), DocText(14, textB)).toDS())
        .groupBy(col("fp")).agg(min(col("doc_id")).as("keep"))
        .collect().map(_.getAs[Long]("keep")).toSet
      assert(kept == batchKept)
    } finally q.stop()
  }

  test("near-dup banded state flags cross-batch near-duplicates in every band") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[DocText]
    val verdicts = nearDupVerdicts(signatures(input.toDS()))
    val q = verdicts.writeStream
      .format("memory").queryName("near_dedup").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(DocText(1, textA), DocText(2, textB))
      q.processAllAvailable()
      input.addData(DocText(21, textA), DocText(22, textC))
      q.processAllAvailable()
      val rows = session.sql("SELECT * FROM near_dedup").as[BandDup].collect()
      // Doc 21 is byte-identical to doc 1 -> identical signature -> flagged
      // in ALL 4 band buckets with estimated Jaccard 1.0; docs 2/22 are
      // unrelated and never flagged.
      assert(rows.nonEmpty)
      assert(rows.forall(_.doc_id == 21L))
      assert(rows.forall(v => v.dup_of == 1L && v.est_jaccard == 1.0))
      assert(rows.map(_.band).toSet == Set(0, 1, 2, 3))
      val dropped = dropSet(session.sql("SELECT * FROM near_dedup"))
        .collect().map(_.getLong(0)).toSet
      assert(dropped == Set(21L))
    } finally q.stop()
  }
}
