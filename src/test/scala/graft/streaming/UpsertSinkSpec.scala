package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}

/** Pins for the foreachBatch upsert sink beyond the q202 hash gate:
  * in-JVM oracle identity with the batch CDC kernel, touched-bucket-only
  * write amplification, out-of-order tombstone retention (the reason
  * deletes are kept in state, not physically dropped), and replay
  * convergence over already-absorbed state (the crash-recovery claim). */
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

  test("replay over absorbed state converges: fresh checkpoint, same slices, same final state") {
    val root = tmpRoot("graft_upsert_spec4")
    val slices = tmpRoot("graft_upsert_spec4_in")
    val b1 = (1L to 10L).map(k => (k, 10L, k, "U", k * 1.0))
    val b2 = Seq((5L, 20L, 0L, "D", 0.0), (6L, 20L, 0L, "U", 66.0))
    try {
      writeBatches(slices, Seq(df(b1), df(b2)))
      val first = collect(run(root, slices))
      deleteTree(root.resolve("_ckpt")) // lose ALL offset tracking
      val replayed = collect(run(root, slices)) // every batch re-applies
      assert(replayed == first)
    } finally { deleteTree(root); deleteTree(slices) }
  }
}
