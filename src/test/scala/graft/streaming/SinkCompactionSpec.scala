package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SinkCompaction: a many-small-files parquet relation (the shape a
  * micro-batch file sink accretes — one file per trigger per partition)
  * rewrites into `ceil(committedBytes / targetBytes)` size-targeted files
  * with content untouched. Gate q197 proves content-invariance against
  * the DuckDB oracle per tier; this spec pins the FILE-LAYOUT contract:
  * planned count, actual count, and bytes per output file. */
class SinkCompactionSpec extends SparkSpec {

  private def fileSize(uri: String): Long =
    java.nio.file.Files.size(java.nio.file.Paths.get(new java.net.URI(uri)))

  private def deleteTree(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(dir))
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
  }

  test("24 small files compact to ceil(total/target) files, content-invariant, sizes near target") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_compact_in")
    val outDir = java.nio.file.Files.createTempDirectory("graft_compact_out")
    try {
      spark.range(0, 20000)
        .select(col("id"), pmod(col("id"), lit(97)).as("k"),
          concat(lit("value_"), col("id")).as("s"))
        .repartition(24)
        .write.mode("overwrite").parquet(inDir.toString)
      val sink = spark.read.parquet(inDir.toString)
      assert(sink.inputFiles.length == 24, "small-file fixture did not fan out")

      val total = sink.inputFiles.map(fileSize).sum
      val target = (total + 2) / 3 // => exactly 3 planned files
      assert(SinkCompaction.plannedFileCount(spark, sink, target) == 3)

      val out = s"$outDir/c"
      val compacted = SinkCompaction.compact(spark, sink, target, out)
      val outFiles = compacted.inputFiles
      assert(outFiles.length == 3,
        s"expected 3 compacted files, found ${outFiles.length}")

      // Content-invariant: same rows, nothing dropped or duplicated.
      val a = sink.collect().map(_.toSeq).sortBy(_.toString()).toSeq
      val b = compacted.collect().map(_.toSeq).sortBy(_.toString()).toSeq
      assert(a == b, "compaction changed relation content")

      // Bytes/file: every output file lands within 2x of the target
      // (parquet re-encoding of row-subsets varies, but a file twice the
      // target means the partitioning math is wrong), and the rewrite
      // kept the data volume (within codec variance).
      val sizes = outFiles.map(fileSize)
      assert(sizes.forall(_ <= 2 * target),
        s"oversized compacted file: $sizes vs target $target")
      assert(sizes.sum > total / 4, s"suspicious shrink: ${sizes.sum} of $total")
    } finally {
      deleteTree(inDir); deleteTree(outDir)
    }
  }

  test("degenerate inputs: empty relation still writes one file; bad target rejects") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_compact_empty")
    val outDir = java.nio.file.Files.createTempDirectory("graft_compact_empty_out")
    try {
      spark.range(0, 0).write.mode("overwrite").parquet(inDir.toString)
      val sink = spark.read.parquet(inDir.toString)
      assert(SinkCompaction.plannedFileCount(spark, sink, 1024) == 1)
      val compacted = SinkCompaction.compact(spark, sink, 1024, s"$outDir/c")
      assert(compacted.count() == 0)
      intercept[IllegalArgumentException] {
        SinkCompaction.plannedFileCount(spark, sink, 0)
      }
    } finally {
      deleteTree(inDir); deleteTree(outDir)
    }
  }
}
