package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Pins for the foreachBatch upsert sink beyond the q202 hash gate:
  * in-JVM oracle identity with the batch CDC kernel, touched-bucket-only
  * write amplification, out-of-order tombstone retention (the reason
  * deletes are kept in state, not physically dropped), one-batch replay
  * idempotence (the crash-recovery claim), and the fail-fast on a
  * checkpoint reset over kept state (silent skip = invisible data loss). */
class UpsertSinkSpec extends SparkSpec {

  private val Schema = "k LONG, t LONG, i LONG, op STRING, v DOUBLE"

  private def df(rows: Seq[(Long, Long, Long, String, Double)]): DataFrame = {
    val session = spark
    import session.implicits._
    rows.toDF("k", "t", "i", "op", "v")
  }

  private def deleteTree(dir: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(dir))
      scala.util.Using.resource(Files.walk(dir)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
  }

  /** One parquet file per batch, name/mtime-ordered like the gate slices. */
  private def writeBatches(dir: Path, batches: Seq[DataFrame]): Unit = {
    import scala.jdk.CollectionConverters._
    deleteTree(dir); Files.createDirectories(dir)
    batches.zipWithIndex.foreach { case (b, idx) =>
      val tmp = dir.resolve(s"_tmp_$idx")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = scala.util.Using.resource(Files.list(tmp)) { ls =>
        ls.iterator().asScala.map(_.toString).find(_.endsWith(".parquet")).get
      }
      val dst = dir.resolve(f"slice_$idx%03d.parquet")
      Files.move(Paths.get(part), dst)
      deleteTree(tmp)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + idx * 1000L))
    }
  }

  private def run(root: Path, slices: Path): DataFrame =
    UpsertSink.run(spark, slices.toString, Schema, root,
      keyCol = "k", ordCols = Seq("t", "i"), opCol = "op", deleteOp = "D",
      payloadCols = Seq("v"), nBuckets = 8)

  private def collect(d: DataFrame): Seq[(Long, String, Double)] =
    d.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  private def tmpRoot(name: String): Path = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), name)
    deleteTree(p); p
  }

  test("final state = latest-op-wins over the whole log; tombstoned keys absent") {
    val root = tmpRoot("graft_upsert_spec1")
    val slices = tmpRoot("graft_upsert_spec1_in")
    val b1 = (1L to 20L).map(k => (k, 10L, k, "U", k * 1.0))
    val b2 = Seq((3L, 20L, 0L, "U", 33.0), (4L, 20L, 0L, "D", 0.0))
    val b3 = Seq((4L, 30L, 0L, "U", 44.0), (21L, 30L, 0L, "U", 21.0))
    try {
      writeBatches(slices, Seq(df(b1), df(b2), df(b3)))
      val out = collect(run(root, slices))
      val expect = ((1L to 20L).filter(k => k != 3 && k != 4)
        .map(k => (k, "U", k * 1.0)) ++
        Seq((3L, "U", 33.0), (4L, "U", 44.0), (21L, "U", 21.0)))
        .sortBy(_._1)
      assert(out == expect)
      assert(UpsertSink.lastStats.batches == 3)
    } finally { deleteTree(root); deleteTree(slices) }
  }

  test("only touched buckets are rewritten per batch") {
    val root = tmpRoot("graft_upsert_spec2")
    val slices = tmpRoot("graft_upsert_spec2_in")
    val b1 = (1L to 40L).map(k => (k, 10L, k, "U", 1.0)) // wide: many buckets
    val b2 = Seq((7L, 20L, 0L, "U", 2.0))                // narrow: one key
    try {
      writeBatches(slices, Seq(df(b1), df(b2)))
      run(root, slices)
      // Expected touched buckets, computed with the SAME hash the sink uses.
      def buckets(keys: Seq[Long]): Int =
        df(keys.map(k => (k, 0L, 0L, "U", 0.0)))
          .select(pmod(hash(col("k")), lit(8))).distinct().count().toInt
      val expected = buckets((1L to 40L).toSeq) + buckets(Seq(7L))
      assert(UpsertSink.lastStats.bucketWrites == expected,
        s"${UpsertSink.lastStats} vs expected $expected")
      assert(buckets(Seq(7L)) == 1)
    } finally { deleteTree(root); deleteTree(slices) }
  }

  test("tombstone is retained in state: an out-of-order earlier update cannot resurrect the key") {
    val root = tmpRoot("graft_upsert_spec3")
    val slices = tmpRoot("graft_upsert_spec3_in")
    val b1 = Seq((1L, 20L, 0L, "D", 0.0))  // delete at ord 20
    val b2 = Seq((1L, 10L, 0L, "U", 5.0))  // late-arriving EARLIER update
    try {
      writeBatches(slices, Seq(df(b1), df(b2)))
      assert(collect(run(root, slices)).isEmpty)
    } finally { deleteTree(root); deleteTree(slices) }
  }

  test("checkpoint reset over kept state fails fast instead of silently swallowing batches") {
    val root = tmpRoot("graft_upsert_spec4")
    val slices = tmpRoot("graft_upsert_spec4_in")
    val b1 = (1L to 10L).map(k => (k, 10L, k, "U", k * 1.0))
    val b2 = Seq((5L, 20L, 0L, "D", 0.0), (6L, 20L, 0L, "U", 66.0))
    try {
      writeBatches(slices, Seq(df(b1), df(b2)))
      val first = collect(run(root, slices))
      // The ops mistake: checkpoint wiped, sink state kept. Batch ids
      // restart at 0 BELOW the manifest (newest = 1); treating that as
      // "already committed" would silently swallow every future batch —
      // with fresh slices, unbounded invisible data loss. The sink must
      // refuse instead (only newest == batchId is a legitimate replay:
      // Spark re-runs at most the one batch after the last commit).
      deleteTree(root.resolve("_ckpt")) // lose ALL offset tracking
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run(root, slices)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("checkpoint was reset")), e.toString)
      // The refusal left the durable state intact and readable.
      assert(collect(UpsertSink.readState(spark, root,
        "k", "op", "D", Seq("v"))) == first)
    } finally { deleteTree(root); deleteTree(slices) }
  }

  test("read path trusts the manifest, not directory listing: an unmanifested version dir is invisible") {
    val root = tmpRoot("graft_upsert_spec5")
    val slices = tmpRoot("graft_upsert_spec5_in")
    val b1 = (1L to 10L).map(k => (k, 10L, k, "U", k * 1.0))
    try {
      writeBatches(slices, Seq(df(b1)))
      val before = collect(run(root, slices))
      // Plant a decoy: a higher-numbered version dir holding a poison row.
      // A "newest version dir wins" listing rule would surface key 9999;
      // the manifest rule must never consult it.
      df(Seq((9999L, 99L, 0L, "U", -1.0)))
        .withColumn("bucket", lit(0))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(root.resolve("v999").toString)
      val after = collect(UpsertSink.readState(spark, root,
        "k", "op", "D", Seq("v")))
      assert(after == before)
      assert(!after.exists(_._1 == 9999L))
    } finally { deleteTree(root); deleteTree(slices) }
  }

  test("after each batch only one manifest survives GC and it references every live bucket") {
    val root = tmpRoot("graft_upsert_spec6")
    val slices = tmpRoot("graft_upsert_spec6_in")
    val b1 = (1L to 20L).map(k => (k, 10L, k, "U", 1.0))
    val b2 = Seq((7L, 20L, 0L, "U", 2.0))
    val b3 = Seq((8L, 30L, 0L, "U", 3.0))
    try {
      writeBatches(slices, Seq(df(b1), df(b2), df(b3)))
      run(root, slices)
      import scala.jdk.CollectionConverters._
      // GC runs at batch START, so after batch 2 the manifests on disk are
      // {1, 2}; a fourth batch would collapse them to {2}. Never more than
      // the in-flight pair.
      val manifests = scala.util.Using.resource(
        Files.list(root.resolve("_manifest")))(_.iterator().asScala
          .map(_.getFileName.toString).filter(_.matches("\\d+")).toSeq)
      assert(manifests.sorted == Seq("1", "2"), manifests)
      val entries = Files.readAllLines(
        root.resolve("_manifest").resolve("2")).asScala.filter(_.nonEmpty)
      // Every referenced bucket dir exists on disk.
      entries.foreach { line =>
        val Array(b, v) = line.split('\t')
        assert(Files.isDirectory(root.resolve(v).resolve(s"bucket=$b")), line)
      }
    } finally { deleteTree(root); deleteTree(slices) }
  }

  test("forced mid-publish crash: replay GCs the staging dir, re-merges from manifested state, and converges") {
    val root = tmpRoot("graft_upsert_spec7")
    val rootRef = tmpRoot("graft_upsert_spec7_ref")
    val slices = tmpRoot("graft_upsert_spec7_in")
    val slicesRef = tmpRoot("graft_upsert_spec7_ref_in")
    val batches = Seq(
      (1L to 16L).map(k => (k, 10L, k, "U", k * 1.0)),
      Seq((3L, 20L, 0L, "U", 33.0), (4L, 20L, 0L, "D", 0.0)),
      Seq((4L, 30L, 0L, "U", 44.0), (17L, 30L, 0L, "U", 17.0)),
      Seq((5L, 40L, 0L, "D", 0.0), (18L, 40L, 0L, "U", 18.0)))
    try {
      writeBatches(slicesRef, batches.map(df))
      val uninterrupted = collect(run(rootRef, slicesRef))

      // Incarnation 1 sees only the first two slices.
      writeBatches(slices, batches.take(2).map(df))
      val applier = new UpsertSink.Applier(spark, root, "k",
        Seq("t", "i"), "op", Seq("v"), nBuckets = 8)
      UpsertSink.runIncarnation(spark, slices.toString, Schema, root, applier)
      // Crash shape: newest commit gone, newest manifest gone, newest
      // version dir back in staging — exactly a crash between the staging
      // write and the publish rename of batch 1.
      import scala.jdk.CollectionConverters._
      val commits = scala.util.Using.resource(
        Files.list(root.resolve("_ckpt").resolve("commits")))(
          _.iterator().asScala.toSeq)
        .filter(_.getFileName.toString.matches("\\d+"))
      val newest = commits.maxBy(_.getFileName.toString.toLong)
      val lastBatch = newest.getFileName.toString.toLong
      assert(lastBatch == 1L)
      Files.delete(newest)
      Files.deleteIfExists(newest.resolveSibling(s".${newest.getFileName}.crc"))
      Files.delete(root.resolve("_manifest").resolve("1"))
      Files.move(root.resolve("v1"), root.resolve("_tmp_v1"))

      // Remaining slices arrive; incarnation 2 resumes from the checkpoint.
      writeBatches(slices, batches.map(df))
      val applier2 = new UpsertSink.Applier(spark, root, "k",
        Seq("t", "i"), "op", Seq("v"), nBuckets = 8)
      UpsertSink.runIncarnation(spark, slices.toString, Schema, root, applier2)
      assert(!Files.exists(root.resolve("_tmp_v1")), "staging dir not GC'd")
      val recovered = collect(UpsertSink.readState(spark, root,
        "k", "op", "D", Seq("v")))
      assert(recovered == uninterrupted)

      // The replayed incarnation rewrote only the touched buckets of the
      // batches it ran (replayed batch 1 + batches 2, 3), never the table.
      def buckets(keys: Seq[Long]): Long =
        df(keys.map(k => (k, 0L, 0L, "U", 0.0)))
          .select(pmod(hash(col("k")), lit(8))).distinct().count()
      val expected = buckets(Seq(3L, 4L)) + buckets(Seq(4L, 17L)) +
        buckets(Seq(5L, 18L))
      assert(applier2.batches == 3 && applier2.bucketWrites == expected,
        s"batches=${applier2.batches} bucketWrites=${applier2.bucketWrites} expected=$expected")
    } finally {
      deleteTree(root); deleteTree(rootRef)
      deleteTree(slices); deleteTree(slicesRef)
    }
  }

  test("replay of a batch whose manifest already committed is a no-op: no re-publish, no delete of the live copy") {
    val root = tmpRoot("graft_upsert_spec8")
    val rootRef = tmpRoot("graft_upsert_spec8_ref")
    val slices = tmpRoot("graft_upsert_spec8_in")
    val slicesRef = tmpRoot("graft_upsert_spec8_ref_in")
    val batches = Seq(
      (1L to 16L).map(k => (k, 10L, k, "U", k * 1.0)),
      Seq((3L, 20L, 0L, "U", 33.0), (4L, 20L, 0L, "D", 0.0)),
      Seq((4L, 30L, 0L, "U", 44.0), (17L, 30L, 0L, "U", 17.0)))
    try {
      writeBatches(slicesRef, batches.map(df))
      val uninterrupted = collect(run(rootRef, slicesRef))

      // Incarnation 1 drains two slices; the crash lands BETWEEN
      // writeManifest and the checkpoint commit of batch 1 — the publish
      // is durable, only the offset commit is lost.
      writeBatches(slices, batches.take(2).map(df))
      val applier = new UpsertSink.Applier(spark, root, "k",
        Seq("t", "i"), "op", Seq("v"), nBuckets = 8)
      UpsertSink.runIncarnation(spark, slices.toString, Schema, root, applier)
      import scala.jdk.CollectionConverters._
      val commits = scala.util.Using.resource(
        Files.list(root.resolve("_ckpt").resolve("commits")))(
          _.iterator().asScala.toSeq)
        .filter(_.getFileName.toString.matches("\\d+"))
      val newest = commits.maxBy(_.getFileName.toString.toLong)
      assert(newest.getFileName.toString.toLong == 1L)
      Files.delete(newest)
      Files.deleteIfExists(newest.resolveSibling(s".${newest.getFileName}.crc"))
      assert(Files.exists(root.resolve("_manifest").resolve("1")))
      assert(Files.isDirectory(root.resolve("v1")))

      // Incarnation 2 replays batch 1 (already durable) then runs batch 2.
      writeBatches(slices, batches.map(df))
      val applier2 = new UpsertSink.Applier(spark, root, "k",
        Seq("t", "i"), "op", Seq("v"), nBuckets = 8)
      UpsertSink.runIncarnation(spark, slices.toString, Schema, root, applier2)
      val recovered = collect(UpsertSink.readState(spark, root,
        "k", "op", "D", Seq("v")))
      assert(recovered == uninterrupted)
      // The replayed batch wrote NOTHING — only batch 2's buckets moved.
      def buckets(keys: Seq[Long]): Long =
        df(keys.map(k => (k, 0L, 0L, "U", 0.0)))
          .select(pmod(hash(col("k")), lit(8))).distinct().count()
      assert(applier2.batches == 2 &&
        applier2.bucketWrites == buckets(Seq(4L, 17L)),
        s"batches=${applier2.batches} bucketWrites=${applier2.bucketWrites}")
    } finally {
      deleteTree(root); deleteTree(rootRef)
      deleteTree(slices); deleteTree(slicesRef)
    }
  }

  test("a torn (empty or unparseable) newest manifest never reads as an empty table: readers and GC fall back to the next-newest") {
    val root = tmpRoot("graft_upsert_spec9")
    val slices = tmpRoot("graft_upsert_spec9_in")
    val b1 = (1L to 12L).map(k => (k, 10L, k, "U", k * 1.0))
    try {
      writeBatches(slices, Seq(df(b1)))
      val before = collect(run(root, slices))
      // A power-crash torn write: the newest manifest file exists but is
      // empty (and a second one is garbage). Readers must fall back.
      Files.writeString(root.resolve("_manifest").resolve("99"), "")
      Files.writeString(root.resolve("_manifest").resolve("100"), "notab\n")
      assert(collect(UpsertSink.readState(spark, root,
        "k", "op", "D", Seq("v"))) == before)
      // A stray temp file from a crash mid-writeManifest.
      Files.writeString(root.resolve("_manifest").resolve(".55.tmp"), "x")
      // The next batch's GC must NOT treat the torn newest as "no live
      // buckets" (which would delete the table); it sweeps the torn files
      // and the stray temp, then applies normally.
      val applier = new UpsertSink.Applier(spark, root, "k",
        Seq("t", "i"), "op", Seq("v"), nBuckets = 8)
      applier.apply(df(Seq((1L, 20L, 0L, "U", 111.0))), 101L)
      val after = collect(UpsertSink.readState(spark, root,
        "k", "op", "D", Seq("v")))
      assert(after == before.map { case (k, op, v) =>
        if (k == 1L) (k, op, 111.0) else (k, op, v) })
      assert(!Files.exists(root.resolve("_manifest").resolve("99")))
      assert(!Files.exists(root.resolve("_manifest").resolve("100")))
      assert(!Files.exists(root.resolve("_manifest").resolve(".55.tmp")))
    } finally { deleteTree(root); deleteTree(slices) }
  }
}
