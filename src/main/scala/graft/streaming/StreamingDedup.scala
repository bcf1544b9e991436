package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFns

/** STREAMING dedup — the continuous twin of the batch incremental dedup
  * (graft.queries.TextPipelineQueries.dedupAgainstDropped): documents
  * arrive as a stream and each is judged against everything seen so far,
  * with the "seen corpus" held as operator STATE instead of a side table.
  * The LLM-pipeline shape: exact dedup by content fingerprint, near-dup by
  * banded MinHash — both as single `flatMapGroupsWithState` operators
  * (one stateful op per query: the composition a Structured Streaming plan
  * actually allows; combine band verdicts in `foreachBatch` or downstream
  * batch jobs via [[dropSet]]).
  *
  * Scale/state notes:
  *  - exact: state is ONE long (first-arrival doc id) per distinct
  *    fingerprint — the minimum any streaming exact-dedup must hold.
  *  - near-dup: state is keyed by (band, band key) — the same bucket
  *    granularity as the batch LSH join, so state shards across the
  *    cluster exactly like the batch shuffle does; each bucket holds at
  *    most [[MaxBucketSigs]] signatures (first-arrival wins, the eviction
  *    every production streaming dedup needs to bound state; expected
  *    bucket occupancy is ~TargetBucket anyway, so the cap only bites on
  *    pathological buckets — precisely where unbounded state would OOM).
  *  - determinism: within a micro-batch, docs are processed in doc_id
  *    order, so replays produce identical verdicts.
  */
object StreamingDedup {

  final case class DocText(doc_id: Long, text: String)
  final case class DocFp(doc_id: Long, fp: Long)
  /** Exact-dedup verdict: kept_as = own id for the first arrival, the
    * first-arrival's id for every later duplicate. */
  final case class FpVerdict(doc_id: Long, fp: Long, first_id: Long,
                             is_dup: Boolean)

  final case class DocSig(doc_id: Long, band: Int, key: String, mh: Seq[Long])
  /** Near-dup verdict for one band: emitted when the doc's signature
    * matches an earlier doc in the same band bucket — OR, with
    * `dup_of = `[[EvictedMark]], when the doc's signature could NOT be
    * held because the bucket was saturated (see [[nearDupVerdicts]]):
    * eviction is a correctness-affecting event (later true duplicates of
    * this doc can no longer be detected in this band), so it is emitted
    * into the verdict stream itself rather than logged, where a
    * `foreachBatch` consumer can count/alert on it. */
  final case class BandDup(doc_id: Long, band: Int, dup_of: Long,
                           est_jaccard: Double)

  /** `dup_of` sentinel marking a saturated-bucket eviction verdict (real
    * doc ids are non-negative). */
  val EvictedMark: Long = -1L
  final case class BucketState(sigs: List[(Long, Seq[Long])])

  private val NumHashes = 8
  private val Bands = 4
  private val RowsPerBand = 2

  /** Signature cap per band bucket — bounds state on pathological (hot)
    * buckets; first arrivals are kept, the batch operators' keep-lowest-id
    * rule under in-order ingestion. */
  val MaxBucketSigs = 64

  /** Rolling-hash fingerprints (q48's order-sensitive Rabin-Karp fold) as
    * a streaming-safe projection — pure per-row HOFs, no shuffle. */
  def fingerprints(docs: Dataset[DocText]): Dataset[DocFp] = {
    import docs.sparkSession.implicits._
    val M = 1000000007L
    docs.toDF()
      .withColumn("hs", TextFns.hash32Array(TextFns.tokens(col("text"))))
      .withColumn("fp", aggregate(col("hs"), lit(0L),
        (acc, h) => (acc * 31 + h) % M))
      .select(col("doc_id"), col("fp"))
      .as[DocFp]
  }

  /** Exact streaming dedup: per-fingerprint first-arrival state; every doc
    * gets a verdict row (first arrival `is_dup = false`, later arrivals
    * point at the keeper). Under in-order ingestion the kept set equals
    * the batch exact dedup's min-id canonical representatives. */
  def exactDedup(fps: Dataset[DocFp]): Dataset[FpVerdict] = {
    import fps.sparkSession.implicits._
    fps
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Long, FpVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: Long, batch: Iterator[DocFp], state: GroupState[Long]) =>
          val docs = batch.toSeq.sortBy(_.doc_id)
          var first = state.getOption.getOrElse(-1L)
          val out = docs.map { d =>
            if (first < 0) { first = d.doc_id
              FpVerdict(d.doc_id, fp, first, is_dup = false)
            } else FpVerdict(d.doc_id, fp, first, is_dup = d.doc_id != first)
          }
          state.update(first)
          out.iterator
      }
  }

  /** MinHash band signatures as a streaming-safe projection (identical
    * banding to the batch q34/q35/q51 family: 8 permutation min-hashes,
    * 4 bands x 2 rows): each doc explodes to Bands rows keyed by its band
    * keys, carrying the full signature for the estimate. */
  def signatures(docs: Dataset[DocText]): Dataset[DocSig] =
    signaturesFromShingles(docs.toDF().select(col("doc_id"),
      TextFns.shingleHash32(TextFns.tokens(col("text")), 3).as("hs")))

  /** Same banding from a pre-hashed (doc_id, hs) shingle relation — the
    * production bootstrap path: a standing corpus keeps its shingle
    * signatures as a table (TextPipelineQueries.shingleSignatures /
    * materializedShingles), and a streaming job deriving DocSig from that
    * table skips the md5 shingle pipeline, the dominant per-doc cost. */
  def signaturesFromShingles(sh: DataFrame): Dataset[DocSig] = {
    import sh.sparkSession.implicits._
    sh.select(col("doc_id"),
        TextFns.minhashSignature(col("hs"), NumHashes).as("mh"))
      .select(col("doc_id"),
        posexplode(array((0 until Bands).map(b =>
          TextFns.lshBand(col("mh"), b, RowsPerBand)): _*)).as(Seq("band", "key")),
        col("mh"))
      .as[DocSig]
  }

  /** Near-dup streaming dedup, one band: per-bucket signature state; a doc
    * whose signature agrees with an earlier bucket member on at least
    * `minAgree` of the NumHashes slots (the MinHash estimate of Jaccard)
    * is flagged against the EARLIEST such member. A doc flagged in ANY of
    * its Bands buckets is a near-duplicate — combine with [[dropSet]]. */
  def nearDupVerdicts(sigs: Dataset[DocSig],
                      minAgree: Int = 4,
                      maxBucketSigs: Int = MaxBucketSigs): Dataset[BandDup] = {
    import sigs.sparkSession.implicits._
    sigs
      .groupByKey(s => (s.band, s.key))
      .flatMapGroupsWithState[BucketState, BandDup](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bk: (Int, String), batch: Iterator[DocSig], state: GroupState[BucketState]) =>
          var held = state.getOption.getOrElse(BucketState(Nil)).sigs
          val out = scala.collection.mutable.ArrayBuffer[BandDup]()
          def agree(a: Seq[Long], b: Seq[Long]): Int =
            a.iterator.zip(b.iterator).count { case (x, y) => x == y }
          batch.toSeq.sortBy(_.doc_id).foreach { s =>
            // held is newest-first (prepend); iterate oldest-first so the
            // EARLIEST matching member is the one reported (the batch
            // family's keep-lowest-id convention under in-order arrival).
            val hit = held.reverseIterator
              .map { case (id, mh) => (id, agree(mh, s.mh)) }
              .collectFirst { case (id, n) if n >= minAgree =>
                BandDup(s.doc_id, s.band, id, n.toDouble / NumHashes) }
            hit.foreach(out += _)
            if (held.size < maxBucketSigs) held = (s.doc_id, s.mh) :: held
            else
              // Saturated bucket: the signature is dropped, so later true
              // duplicates of THIS doc are undetectable in this band. That
              // silent false-negative risk must be visible — emit an
              // eviction verdict alongside any dup hit.
              out += BandDup(s.doc_id, s.band, EvictedMark, 0.0)
          }
          state.update(BucketState(held))
          out.iterator
      }
  }

  /** Eviction verdicts only (dup_of = [[EvictedMark]]): the stream to
    * count/alert on — a non-empty result means some bucket saturated and
    * near-dup recall is no longer complete for the evicted docs' bands. */
  def evictions(verdicts: Dataset[BandDup]): Dataset[BandDup] = {
    import verdicts.sparkSession.implicits._
    verdicts.filter(_.dup_of == EvictedMark)
  }

  /** Batch-side combiner (use inside foreachBatch or on collected
    * verdicts): the distinct doc ids flagged as a DUPLICATE in at least
    * one band. Eviction verdicts (dup_of = [[EvictedMark]]) are excluded —
    * an evicted doc was not matched, merely unrecorded. */
  def dropSet(verdicts: DataFrame): DataFrame =
    verdicts.filter(col("dup_of") =!= lit(EvictedMark))
      .select(col("doc_id")).distinct()
}
