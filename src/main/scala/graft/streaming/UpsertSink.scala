package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** Streaming UPSERT materialization — `foreachBatch` applying a CDC change
  * stream to a bucketed, versioned serving table on storage (the sink shape
  * behind every "stream into a keyed table" pipeline; Spark's built-in file
  * sink is append-only, so upsert is necessarily a foreachBatch operator).
  *
  * Layout: `stateRoot/v<batchId>/bucket=<b>/part-*.parquet`, with a
  * MANIFEST (`stateRoot/_manifest/<batchId>`, one `bucket<TAB>version` line
  * per live bucket) as the single source of truth for "current". Each
  * micro-batch:
  *  1. GCs state left by crashed or superseded writes: any bucket dir not
  *     referenced by the newest manifest, stray `_tmp_v*` staging dirs,
  *     and all older manifests. GC runs at the START of the batch — after
  *     the previous batch's manifest is durable — so a crash anywhere in
  *     the write path always leaves the referenced copies intact for
  *     replay to read.
  *  2. compacts the batch to one winning change per key
  *     ([[graft.operators.CdcApply.latestChanges]] — map-side partial, the
  *     batch never shuffles whole);
  *  3. computes the TOUCHED buckets (`hash(key) mod nBuckets`) — at scale
  *     this is the point: a batch touching 3 of 4096 buckets rewrites 3
  *     buckets, not the table;
  *  4. reads only those buckets' current content (resolved through the
  *     manifest — ZERO directory listing on the read path; at 4096 buckets
  *     on an object store, a listing-based read rule is thousands of LIST
  *     calls per trigger and depends on listing consistency), merges
  *     latest-wins, and writes the result to a staging dir
  *     (`_tmp_v<batchId>`) as ONE job partitioned by bucket;
  *  5. publishes: renames the staging dir to `v<batchId>`, then writes the
  *     new manifest (previous entries with the touched buckets remapped)
  *     LAST, via atomic rename.
  *
  * Exactly-once across crash/replay (machine-checked per tier by gate
  * q203, which forces the crash and hashes the recovered table against the
  * uninterrupted oracle): whatever step the crash lands on, the newest
  * manifest still describes a fully-consistent table — staged or published
  * data without a manifest is invisible and GC'd on replay, while a batch
  * whose manifest DID land is already durable, so its replay is a pure
  * no-op (latest-wins would reproduce byte-identical content; re-publishing
  * would only open a delete-then-rename window over the one live copy).
  * A replayed un-manifested batch re-reads exactly the state its first
  * attempt read and publishes `v<batchId>` + manifest `<batchId>` afresh.
  * The stage-then-rename publish also keeps the merge's input paths
  * disjoint from its output, so a replay never overwrites a directory its
  * own scan is reading, and the rename target is never live data.
  *
  * Tombstones: a delete op is RETAINED in state (with its ord) and filtered
  * at read time — physically dropping it would let an out-of-order earlier
  * update resurrect the key on a later merge.
  */
object UpsertSink {

  /** Observability for specs/ops: per-incarnation write amplification. */
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
    if (Files.exists(dir))
      scala.util.Using.resource(Files.walk(dir)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
  }

  private def manifestDir(stateRoot: Path): Path = stateRoot.resolve("_manifest")

  /** The newest committed manifest: (batchId, bucket → version dir name).
    * One listing of the manifest dir (1-2 files after GC) — never of the
    * data tree. An empty or unparseable file (an OS-crash torn write that
    * slipped past the fsync in [[writeManifest]]) is treated as ABSENT and
    * the next-newest manifest wins — a torn newest must never read as "the
    * table is empty", because GC would then delete every live bucket. */
  private def newestManifest(stateRoot: Path): Option[(Long, Map[Int, String])] = {
    import scala.jdk.CollectionConverters._
    def parse(p: Path): Option[(Long, Map[Int, String])] =
      try {
        val entries = Files.readAllLines(p).asScala.iterator
          .filter(_.nonEmpty)
          .map { line =>
            val Array(b, v) = line.split('\t')
            b.toInt -> v
          }.toMap
        if (entries.isEmpty) None
        else Some((p.getFileName.toString.toLong, entries))
      } catch { case scala.util.control.NonFatal(_) => None }
    listDir(manifestDir(stateRoot))
      .filter(_.getFileName.toString.matches("\\d+"))
      .sortBy(-_.getFileName.toString.toLong)
      .iterator.flatMap(parse).nextOption()
  }

  /** Readers' view of "current": bucket → its manifest-referenced dir. */
  private def currentBuckets(stateRoot: Path): Map[Int, Path] =
    newestManifest(stateRoot).fold(Map.empty[Int, Path]) { case (_, m) =>
      m.map { case (b, v) => b -> stateRoot.resolve(v).resolve(s"bucket=$b") }
    }

  /** Warn exactly once per JVM when the filesystem refuses directory
    * fsync: on such deployments a power crash can still lose a renamed
    * manifest that Spark's checkpoint believes committed (the torn-
    * manifest fallback then drops that batch's data) — the weakened
    * durability must be visible, not silent. */
  private val fsyncDirWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Best-effort fsync of a directory so a completed rename inside it
    * survives an OS/power crash (degrades — loudly, once — where the
    * FS/JDK refuses a directory channel: object stores and some network
    * FSes). */
  private def fsyncDir(dir: Path): Unit =
    try scala.util.Using.resource(
      java.nio.channels.FileChannel.open(dir, StandardOpenOption.READ)
    )(_.force(true))
    catch {
      case scala.util.control.NonFatal(e) =>
        if (fsyncDirWarned.compareAndSet(false, true))
          System.err.println(s"[upsert-sink] WARN: directory fsync refused for $dir " +
            s"(${e.getClass.getSimpleName}); manifest durability over a power crash " +
            "is weakened on this filesystem")
    }

  /** Manifest-last commit: write to a dotted temp name, fsync the bytes,
    * atomic-rename into place, fsync the directory. Without the two syncs
    * a power crash can surface the renamed file EMPTY — which GC would
    * read as "no live buckets" and delete the table. A replayed batch
    * overwrites its own entry with identical content (REPLACE_EXISTING),
    * preserving idempotence. */
  private def writeManifest(stateRoot: Path, batchId: Long,
                            entries: Map[Int, String]): Unit = {
    val dir = manifestDir(stateRoot)
    Files.createDirectories(dir)
    val body = entries.toSeq.sorted
      .map { case (b, v) => s"$b\t$v" }.mkString("", "\n", "\n")
    val tmp = dir.resolve(s".$batchId.tmp")
    scala.util.Using.resource(java.nio.channels.FileChannel.open(tmp,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)) { ch =>
      ch.write(java.nio.ByteBuffer.wrap(body.getBytes(StandardCharsets.UTF_8)))
      ch.force(true)
    }
    Files.move(tmp, dir.resolve(batchId.toString),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    fsyncDir(dir)
  }

  /** Drop everything the newest manifest does not reference: superseded
    * bucket copies, stray `_tmp_v*` staging dirs from crashed writes,
    * emptied version dirs, and older manifests. Runs at batch START (and
    * is itself crash-safe: it only ever deletes unreferenced state). */
  private def gcSuperseded(stateRoot: Path): Unit = {
    val m = newestManifest(stateRoot)
    val live: Set[Path] = m.fold(Set.empty[Path]) { case (_, entries) =>
      entries.map { case (b, v) =>
        stateRoot.resolve(v).resolve(s"bucket=$b")
      }.toSet
    }
    listDir(stateRoot).foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("_tmp_v")) deleteTree(p)
      else if (name.startsWith("v")) {
        listDir(p).foreach { b =>
          b.getFileName.toString match {
            case BucketRe(_) if !live.contains(b) => deleteTree(b)
            case _ => ()
          }
        }
        if (!listDir(p).exists(_.getFileName.toString.startsWith("bucket=")))
          deleteTree(p)
      }
    }
    m.foreach { case (newest, _) =>
      listDir(manifestDir(stateRoot))
        .filter { p =>
          val n = p.getFileName.toString
          // Older (or torn) manifests, plus temp files a crash left
          // between the temp write and the rename in writeManifest.
          (n.matches("\\d+") && n.toLong != newest) ||
            n.matches("\\.\\d+\\.tmp")
        }
        .foreach(Files.delete)
    }
  }

  /** The per-micro-batch merge, exposed so a restart harness (gate q203)
    * can run two stream incarnations over one `stateRoot`. Mutable
    * counters observe write amplification per incarnation. */
  final class Applier(spark: SparkSession, stateRoot: Path, keyCol: String,
                      ordCols: Seq[String], opCol: String,
                      payloadCols: Seq[String], nBuckets: Int)
      extends Serializable {
    @volatile var batches = 0
    @volatile var bucketWrites = 0L
    private val stateCols = (opCol +: ordCols) ++ payloadCols

    def apply(batch: DataFrame, batchId: Long): Unit = {
      gcSuperseded(stateRoot)
      // Replay of a batch whose manifest ALREADY committed (crash landed
      // between writeManifest and the checkpoint commit): the publish is
      // durable, and latest-wins re-merge would produce byte-identical
      // content — so re-publishing is pure risk (a crash between deleting
      // the live v<batchId> and re-renaming staging over it would orphan
      // the only copy). Skip the merge entirely; the manifest IS the
      // commit. Spark replays at most the ONE batch after the last
      // checkpoint commit, so only newest == batchId is a legitimate
      // replay: newest > batchId means the checkpoint was reset while
      // stateRoot was kept (batch ids restarted below the manifest), and
      // silently skipping would swallow EVERY incoming batch as "already
      // committed" — fail fast instead of losing data invisibly.
      newestManifest(stateRoot).map(_._1) match {
        case Some(newest) if newest == batchId =>
          batches += 1
          return
        case Some(newest) if newest > batchId =>
          throw new IllegalStateException(
            s"upsert sink state at $stateRoot has manifest $newest but the " +
              s"stream is replaying batch $batchId — the checkpoint was reset " +
              "while the sink state was kept; refusing to silently skip " +
              "(point the query at a fresh stateRoot or restore the checkpoint)")
        case _ => ()
      }
      // Ord columns ride along as payload so state keeps the winning
      // change's ordering key for cross-batch latest-wins merges.
      // Persisted for the batch's lifetime: the compacted change set is
      // consumed by TWO jobs (the touched-bucket collect and the staging
      // write), and without the pin each re-runs the per-key latest-wins
      // aggregation — and re-reads the batch's source files — from
      // scratch. Batch-bounded (one micro-batch, post-compaction), so the
      // pin is as scale-safe as the batch itself; released in the finally
      // below before the batch returns.
      val latest = graft.operators.CdcApply
        .latestChanges(batch, keyCol, ordCols, opCol, ordCols ++ payloadCols)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try applyLatest(latest, batchId)
      finally latest.unpersist(false)
      batches += 1
    }

    private def applyLatest(latest: DataFrame, batchId: Long): Unit = {
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
        // Stage → rename → manifest: each step leaves a recoverable state
        // (see the object doc), and the scan over current buckets is fully
        // consumed by the staging write before anything is deleted.
        val tmpDir = stateRoot.resolve(s"_tmp_v$batchId")
        merged.withColumn("bucket", bucketOf)
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(tmpDir.toString)
        // The rename target can never be live data: a manifested
        // v<batchId> short-circuits above, and an unmanifested leftover
        // (crash between this rename and writeManifest) was removed by
        // gcSuperseded at batch start — so no delete-before-move, which
        // would otherwise open a window where the newest manifest points
        // at deleted buckets.
        val vDir = stateRoot.resolve(s"v$batchId")
        Files.move(tmpDir, vDir)
        val prev = newestManifest(stateRoot).fold(Map.empty[Int, String])(_._2)
        writeManifest(stateRoot, batchId,
          prev ++ touched.map(_ -> s"v$batchId"))
        bucketWrites += touched.length
      }
    }
  }

  /** One `writeStream` incarnation over `sliceDir` (one micro-batch per
    * file) driven through `applier`: start, drain, stop. Restartable — a
    * second call with the same stateRoot resumes from the checkpointed
    * offsets and REPLAYS any batch whose commit never landed. */
  def runIncarnation(spark: SparkSession, sliceDir: String, schema: String,
                     stateRoot: Path, applier: Applier): Unit = {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sliceDir)
      .writeStream
      .option("checkpointLocation", stateRoot.resolve("_ckpt").toString)
      .foreachBatch((b: DataFrame, id: Long) => applier.apply(b, id))
      .start()
    try q.processAllAvailable() finally q.stop()
    lastStats = Stats(applier.batches, applier.bucketWrites)
  }

  /** The FINAL serving table at `stateRoot`: one row per live key
    * (tombstoned keys filtered), columns key + op + payloads. Resolved
    * entirely through the manifest — a stale or foreign version dir on
    * disk is never consulted. */
  def readState(spark: SparkSession, stateRoot: Path, keyCol: String,
                opCol: String, deleteOp: String,
                payloadCols: Seq[String]): DataFrame = {
    val cur = currentBuckets(stateRoot).values.map(_.toString).toSeq
    if (cur.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(cur: _*)
      .filter(col(opCol) =!= lit(deleteOp))
      .select((keyCol +: opCol +: payloadCols).map(col): _*)
  }

  /** Run the upsert stream over `sliceDir` to completion and return the
    * final serving table (single-incarnation convenience; gate q202). */
  def run(spark: SparkSession, sliceDir: String, schema: String,
          stateRoot: Path, keyCol: String, ordCols: Seq[String],
          opCol: String, deleteOp: String, payloadCols: Seq[String],
          nBuckets: Int): DataFrame = {
    val applier = new Applier(spark, stateRoot, keyCol, ordCols, opCol,
      payloadCols, nBuckets)
    runIncarnation(spark, sliceDir, schema, stateRoot, applier)
    readState(spark, stateRoot, keyCol, opCol, deleteOp, payloadCols)
  }
}
