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

  test("exact-dedup state survives a checkpointed restart: post-restart dups still match pre-restart firsts") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("dedup_src").toString
    val out = java.nio.file.Files.createTempDirectory("dedup_out").toString
    val chk = java.nio.file.Files.createTempDirectory("dedup_chk").toString

    def append(docs: Seq[DocText]): Unit =
      docs.toDF().write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = session.readStream
        .schema("doc_id LONG, text STRING").parquet(src).as[DocText]
      val q = exactDedup(fingerprints(stream)).toDF()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    append(Seq(DocText(1, textA), DocText(2, textB)))
    runOnce() // state (fingerprint -> first id) now lives in the checkpoint
    append(Seq(DocText(13, textA), DocText(14, textB), DocText(15, textC)))
    runOnce() // NEW query instance: state must come back from checkpoint

    val rows = session.read.parquet(out).as[FpVerdict].collect()
    assert(rows.length == 5)
    val dups = rows.filter(_.is_dup).map(v => (v.doc_id, v.first_id)).toSet
    // 13/14 duplicate docs ingested BEFORE the restart — only recovered
    // state can point them at first arrivals 1/2.
    assert(dups == Set((13L, 1L), (14L, 2L)))
    assert(rows.filterNot(_.is_dup).map(_.doc_id).toSet == Set(1L, 2L, 15L))
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

  test("bucket saturation is observable: evicted docs emit verdicts, dropSet excludes them") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    // Hand-built signatures sharing ONE band bucket (band 0, key "k") but
    // agreeing on only 2/8 slots pairwise — below minAgree=4, so none are
    // duplicates of each other; mh4 IS a true duplicate of mh3.
    val mh1 = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val mh2 = Seq(1L, 2L, 9L, 10L, 11L, 12L, 13L, 14L)
    val mh3 = Seq(1L, 2L, 20L, 21L, 22L, 23L, 24L, 25L)
    val input = MemoryStream[DocSig]
    val verdicts = nearDupVerdicts(input.toDS(), minAgree = 4, maxBucketSigs = 2)
    val q = verdicts.writeStream
      .format("memory").queryName("evict_dedup").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(DocSig(1, 0, "k", mh1), DocSig(2, 0, "k", mh2))
      q.processAllAvailable()
      // Bucket now holds 2 = maxBucketSigs signatures. Doc 3 cannot be
      // held: its drop MUST surface as an eviction verdict, not silence.
      input.addData(DocSig(3, 0, "k", mh3))
      q.processAllAvailable()
      // Doc 4 is a TRUE duplicate of evicted doc 3 — the false negative
      // the eviction verdict warns about: no dup row is possible, but the
      // saturation itself is again visible.
      input.addData(DocSig(4, 0, "k", mh3))
      q.processAllAvailable()
      val rows = session.sql("SELECT * FROM evict_dedup").as[BandDup].collect()
      val evicted = rows.filter(_.dup_of == EvictedMark)
      assert(evicted.map(_.doc_id).toSet == Set(3L, 4L))
      assert(evicted.forall(_.band == 0))
      // No dup verdicts exist (agreements all below minAgree)…
      assert(rows.forall(_.dup_of == EvictedMark))
      // …and eviction verdicts never leak into the drop set.
      val dropped = dropSet(session.sql("SELECT * FROM evict_dedup")).collect()
      assert(dropped.isEmpty)
      // The dedicated evictions() view exposes exactly the sentinel rows.
      val ev = evictions(session.sql("SELECT * FROM evict_dedup").as[BandDup])
        .collect().map(_.doc_id).toSet
      assert(ev == Set(3L, 4L))
    } finally q.stop()
  }
}
