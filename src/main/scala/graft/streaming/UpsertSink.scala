package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Streaming UPSERT materialization — `foreachBatch` applying a CDC change
  * stream to a bucketed, versioned serving table on storage (the sink shape
  * behind every "stream into a keyed table" pipeline; Spark's built-in file
  * sink is append-only, so upsert is necessarily a foreachBatch operator).
  *
  * Layout: `stateRoot/v<batchId>/bucket=<b>/part-*.parquet`. Each micro-batch
  *  1. compacts its rows to one winning change per key
  *     ([[graft.operators.CdcApply.latestChanges]] — map-side partial, the
  *     batch never shuffles whole);
  *  2. computes the TOUCHED buckets (`hash(key) mod nBuckets`) — at scale
  *     this is the point: a batch touching 3 of 4096 buckets rewrites 3
  *     buckets, not the table;
  *  3. reads only those buckets' current content, merges latest-wins (the
  *     ord columns are retained in state, so out-of-order batches still
  *     resolve correctly), and writes the result as ONE job partitioned by
  *     bucket under a version dir named by the batch id;
  *  4. GCs superseded older copies of the touched buckets (best-effort —
  *     correctness never depends on it, see below).
  *
  * Exactly-once: the version dir is keyed by batchId, so a replayed batch
  * overwrites `v<batchId>` with identical content. Latest-wins merge is
  * idempotent (re-merging rows already absorbed into state changes
  * nothing), so recovery converges even if the crash left `v<batchId>`
  * partially visible. Readers take the NEWEST version of each bucket;
  * stale un-GC'd copies are ignored, never wrong.
  *
  * Tombstones: a delete op is RETAINED in state (with its ord) and filtered
  * at read time — physically dropping it would let an out-of-order earlier
  * update resurrect the key on a later merge.
  */
object UpsertSink {

  /** Observability for specs/ops: per-run write amplification. */
  final case class Stats(batches: Int, bucketWrites: Long)
  @volatile var lastStats: Stats = Stats(0, 0L)

  private val BucketRe = "bucket=(\\d+)".r

  private def listDir(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(dir)) Seq.empty
    else scala.util.Using.resource(Files.list(dir)) { ls =>
      ls.iterator().asScala.toSeq
    }
  }

  private def deleteTree(dir: Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(dir)) { walk =>
      walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
  }

  /** bucket → newest version dir holding it (readers' view of "current"). */
  private def currentBuckets(stateRoot: Path): Map[Int, Path] = {
    val versions = listDir(stateRoot)
      .filter(_.getFileName.toString.startsWith("v"))
      .sortBy(_.getFileName.toString.drop(1).toLong)
    versions.foldLeft(Map.empty[Int, Path]) { (acc, v) =>
      acc ++ listDir(v).flatMap(b => b.getFileName.toString match {
        case BucketRe(n) => Some(n.toInt -> b)
        case _ => None
      })
    }
  }

  /** Run the upsert stream over `sliceDir` (one micro-batch per file) to
    * completion and return the FINAL serving table: one row per live key
    * (tombstoned keys filtered), columns key + op + payloads. */
  def run(spark: SparkSession, sliceDir: String, schema: String,
          stateRoot: Path, keyCol: String, ordCols: Seq[String],
          opCol: String, deleteOp: String, payloadCols: Seq[String],
          nBuckets: Int): DataFrame = {
    val stateCols = (opCol +: ordCols) ++ payloadCols
    var batches = 0
    var bucketWrites = 0L

    def applyBatch(batch: DataFrame, batchId: Long): Unit = {
      // Ord columns ride along as payload so state keeps the winning
      // change's ordering key for cross-batch latest-wins merges.
      val latest = graft.operators.CdcApply
        .latestChanges(batch, keyCol, ordCols, opCol, ordCols ++ payloadCols)
      val bucketOf = pmod(hash(col(keyCol)), lit(nBuckets)).cast("int")
      val touched = latest.select(bucketOf.as("b")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.nonEmpty) {
        val cur = currentBuckets(stateRoot)
        val curPaths = touched.toSeq.flatMap(cur.get).map(_.toString)
        val existing =
          if (curPaths.isEmpty) None
          else Some(spark.read.parquet(curPaths: _*)
            .select((keyCol +: stateCols).map(col): _*))
        val merged = graft.operators.CdcApply.latestChanges(
          existing.fold(latest)(latest.unionByName(_)),
          keyCol, ordCols, opCol, ordCols ++ payloadCols)
        val vDir = stateRoot.resolve(s"v$batchId")
        merged.withColumn("bucket", bucketOf)
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(vDir.toString)
        // GC superseded copies of the touched buckets (best-effort: the
        // newest-version read rule keeps stragglers harmless).
        val touchedSet = touched.toSet
        listDir(stateRoot)
          .filter(v => v.getFileName.toString.startsWith("v") && v != vDir)
          .foreach { v =>
            listDir(v).foreach(b => b.getFileName.toString match {
              case BucketRe(n) if touchedSet(n.toInt) => deleteTree(b)
              case _ => ()
            })
            if (listDir(v).isEmpty) Files.delete(v)
          }
        bucketWrites += touched.length
      }
      batches += 1
    }

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sliceDir)
      .writeStream
      .option("checkpointLocation", stateRoot.resolve("_ckpt").toString)
      .foreachBatch(applyBatch _)
      .start()
    try q.processAllAvailable() finally q.stop()
    lastStats = Stats(batches, bucketWrites)

    val cur = currentBuckets(stateRoot).values.map(_.toString).toSeq
    if (cur.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(cur: _*)
      .filter(col(opCol) =!= lit(deleteOp))
      .select((keyCol +: opCol +: payloadCols).map(col): _*)
  }
}
