package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal column support (builder-prompt family): media as opaque
  * `binary` columns + typed metadata, with per-partition batch operators
  * for decode / feature-extract / resize / frame-sample.
  *
  * What is REAL here: the schema contract, the container-format sniffing,
  * PNG/JPEG/WAV header parsing (pure JVM byte inspection — no codec
  * libraries), the mapPartitions batch shape, and the partitioning
  * behavior. What is STUBBED: pixel/sample decoding (`decodeStub`), which
  * derives a deterministic fake feature vector from the bytes — the
  * container has no imaging/audio libraries; swap `decodeStub` for a real
  * codec to productionize. The Spark plumbing (signatures, batching,
  * distribution) does not change when that swap happens.
  *
  * Scale notes: media blobs ride in parquet binary columns; operators are
  * embarrassingly parallel per-partition maps with NO shuffle. Metadata
  * extraction reads only leading bytes, so a scan projecting metadata
  * should select header prefixes at write time (store `header` alongside
  * `content` for pushdown-friendly scans at 100 TB).
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
                             channels: Int, sampleRateHz: Int, durationMs: Long)

  /** Container sniffing + header metadata from leading bytes only. */
  def parseMeta(bytes: Array[Byte]): MediaMeta = {
    def u32be(off: Int): Long =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.BIG_ENDIAN).getInt.toLong & 0xFFFFFFFFL
    def u32le(off: Int): Long =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL
    def u16le(off: Int): Int =
      ByteBuffer.wrap(bytes, off, 2).order(ByteOrder.LITTLE_ENDIAN).getShort.toInt & 0xFFFF

    if (bytes.length >= 24 &&
        bytes.startsWith(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))) {
      // PNG: IHDR is always the first chunk; width/height at offsets 16/20.
      MediaMeta("png", u32be(16).toInt, u32be(20).toInt, channels = 0,
        sampleRateHz = 0, durationMs = 0L)
    } else if (bytes.length >= 4 &&
               bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) {
      // JPEG: walk markers to the first SOFn for dimensions.
      var i = 2
      var w = 0; var h = 0
      while (i + 9 < bytes.length && w == 0) {
        if (bytes(i) == 0xFF.toByte) {
          val marker = bytes(i + 1) & 0xFF
          val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
          if (marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            h = ((bytes(i + 5) & 0xFF) << 8) | (bytes(i + 6) & 0xFF)
            w = ((bytes(i + 7) & 0xFF) << 8) | (bytes(i + 8) & 0xFF)
          } else i += 2 + len
        } else i += 1
      }
      MediaMeta("jpeg", w, h, 0, 0, 0L)
    } else if (bytes.length >= 44 && bytes.startsWith("RIFF".getBytes) &&
               new String(bytes, 8, 4) == "WAVE") {
      // WAV: fmt chunk at the canonical offset.
      val channels = u16le(22)
      val rate = u32le(24).toInt
      val byteRate = u32le(28)
      val dataSize = u32le(40)
      val durMs = if (byteRate > 0) dataSize * 1000L / byteRate else 0L
      MediaMeta("wav", 0, 0, channels, rate, durMs)
    } else MediaMeta("unknown", 0, 0, 0, 0, 0L)
  }

  /** STUB decode: a deterministic 8-dim "feature vector" derived from byte
    * content (FNV-1a rolling). Replace with a real codec; the signature —
    * bytes in, fixed-width float vector out — is the production contract. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var h = 0x811C9DC5
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xFF)) * 0x01000193
      out(i % 8) += (h & 0xFFFF) / 65535.0f
      i += 1
    }
    out
  }

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(media_id: Long, format: String, width: Int,
                                 height: Int, channels: Int, sampleRateHz: Int,
                                 durationMs: Long, features: Array[Float])

  /** The batch decode operator: per-partition map (no shuffle), one
    * metadata parse + one stub decode per blob. This is the Scala analogue
    * of a pandas mapInPandas decode stage — batch-at-a-time over Arrow-ish
    * partitions. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val meta = parseMeta(row.content)
      MediaFeatures(row.media_id, meta.format, meta.width, meta.height,
        meta.channels, meta.sampleRateHz, meta.durationMs,
        decodeStub(row.content))
    })
  }

  /** Resize contract (stub): production would decode, resample, re-encode;
    * the stub tags the metadata so the plumbing is testable end-to-end. */
  def resizeStub(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => r.copy(kind = s"${r.kind}@resized:$maxDim")))
  }

  /** Frame-sample contract (stub): every k-th "frame" boundary of a video
    * blob; here frames are fixed 1 KiB byte windows so the fan-out shape
    * (one row in, n rows out) is real. */
  def frameSampleStub(media: Dataset[MediaRow], everyK: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frames = math.max(r.content.length / 1024, 1)
      (0 until frames by everyK).map { f =>
        val from = f * 1024
        val until = math.min(from + 1024, r.content.length)
        MediaRow(r.media_id * 1000 + f, s"${r.kind}#frame$f",
          java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }
  }

  /** Metadata as columns over a binary DataFrame — usable from SQL. */
  def withMeta(df: DataFrame, binaryCol: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val parse = udf((b: Array[Byte]) => parseMeta(b))
    df.withColumn("meta", parse(col(binaryCol)))
  }
}
