package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for streaming parquet sinks.
  *
  * A micro-batch file sink writes one file per trigger per partition: a
  * 1-minute-trigger pipeline on 200 partitions mints ~288k files/day —
  * the classic small-file swamp that kills scan planning (driver-side
  * listing), NameNode/object-store metadata, and read throughput at 100×
  * volume. The standard remedy is a periodic compaction pass that
  * rewrites the accumulated small files into size-targeted ones.
  *
  * [[compact]] reads the sink THROUGH its relation (so only files the
  * sink's transaction log committed are compacted — never an in-flight
  * trigger's uncommitted output), sizes the rewrite from the committed
  * bytes (`ceil(totalBytes / targetBytes)` files), and round-robin
  * repartitions into the output dir. Content is invariant by
  * construction — a repartition changes file boundaries, not rows — and
  * gate q197 hashes the compacted relation against the original stream's
  * oracle to machine-check exactly that.
  *
  * The rewrite is one shuffle of the sink's rows at ~targetBytes per
  * output partition: at cluster scale the same pass runs per sink
  * partition-window (compact yesterday's files while today streams), so
  * the unit of work stays bounded regardless of sink age. Writing to a
  * NEW directory (not in place) is deliberate: the sink's `_spark_metadata`
  * log keeps naming the original files, so an in-place rewrite would
  * corrupt the streaming relation for any reader that resolves it through
  * the log; readers cut over to the compacted dir atomically.
  */
object SinkCompaction {

  /** Number of output files a compaction of `sink` to `targetBytes` will
    * write: committed bytes / target, rounded up, floored at one. */
  def plannedFileCount(s: SparkSession, sink: DataFrame, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = s.sessionState.newHadoopConf()
    val total = sink.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the sink's committed files as `plannedFileCount` size-targeted
    * parquet files under `outDir` and return the compacted relation. */
  def compact(s: SparkSession, sink: DataFrame, targetBytes: Long,
              outDir: String): DataFrame = {
    val n = plannedFileCount(s, sink, targetBytes)
    sink.repartition(n).write.mode("overwrite").parquet(outDir)
    s.read.parquet(outDir)
  }
}
