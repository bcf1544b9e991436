package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Per-round oracle gates for the multimodal decode surface (q204/q207) —
  * the q195 discipline applied to the last operator family that was
  * spec-verified only: before this pack, a decode regression surfaced in
  * `sbt test` but in NO tier refresh.
  *
  * The gates are SELF-SYNTHESIZING round trips anchored in the corpus (no
  * committed binary fixtures, no oracle-side media support): a bounded,
  * deterministic slice of the `orders` table (o_orderkey <= KeyCap — dense
  * keys, so the SAME ~2000 logical rows at every tier) is expanded
  * EXECUTOR-SIDE into real media containers whose pixel/sample values are
  * pure integer arithmetic in (key, position) — PNG via ImageIO and QOI
  * hand-encoded per qoiformat.org for images; PCM16 and G.711 μ-law WAV
  * for audio. The blobs then flow through the REAL decode operator
  * ([[Multimodal.extractFeatures]]: container sniff → codec registry →
  * pixel/sample decode → feature assembly), and the oracle is DuckDB
  * computing the same statistics FROM THE GENERATOR FORMULA directly. Any
  * fault anywhere in the path — a mis-sniffed header, a wrong palette/chunk
  * walk, a clipped sample, a drifted feature formula — hash-fails.
  *
  * Exactness: every gated feature is bit-deterministic on both engines.
  * Integer pixel/sample sums are exact in doubles; derived means divide in
  * the same operation order; the luma fold is gated through the SAME
  * index-ordered list_reduce the vector oracles use (sequential double
  * adds mirror the decoder's scanline loop exactly); |sample|/32768 is a
  * dyadic rational so audio sums are exact regardless of order.
  *
  * Scale shape: generation and decode are a per-partition map over a
  * KeyCap-bounded slice — no shuffle, no driver collect, no fixture I/O;
  * at 100 TB the same plan decodes a petabyte of blobs because nothing in
  * it is corpus-sized but the scan.
  */
object MediaGateQueries extends QueryPack {

  /** Key bound of the media slice (the q195 KeyCap discipline): orderkeys
    * are dense from 0 at every tier, so this selects the SAME ~2000
    * logical rows at sf0.001 and XL2 alike. */
  private val KeyCap = 2000L

  private def writeBE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  /** Deterministic image container for key `k`: w×h pixels with
    * r/g/b = (k·a + i·b) mod 256 in row-major index i; even keys encode as
    * PNG (ImageIO — exercises the ImageIOCodec decode path), odd keys as
    * QOI (hand-encoded RGB chunk stream — exercises the hand-rolled
    * QoiCodec decoder). Both containers are lossless, so decoded pixels
    * ARE the formula values. */
  private[queries] def imageBytes(k: Long): Array[Byte] = {
    val w = 16 + (k % 8).toInt
    val h = 12 + (k % 5).toInt
    val px = Array.tabulate(w * h) { i =>
      val r = ((k * 7 + i * 13L) % 256).toInt
      val g = ((k * 11 + i * 17L) % 256).toInt
      val b = ((k * 3 + i * 19L) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    if (k % 2 == 0) {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      im.setRGB(0, 0, w, h, px, 0, w)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    } else {
      val out = new java.io.ByteArrayOutputStream(14 + 4 * w * h + 8)
      out.write("qoif".getBytes("US-ASCII"))
      writeBE(out, w); writeBE(out, h)
      out.write(3); out.write(0) // channels, colorspace
      px.foreach { p => // QOI_OP_RGB per pixel — valid, uncompressed QOI
        out.write(0xFE)
        out.write((p >> 16) & 0xFF); out.write((p >> 8) & 0xFF); out.write(p & 0xFF)
      }
      (0 until 7).foreach(_ => out.write(0)); out.write(1) // end marker
      out.toByteArray
    }
  }

  /** Deterministic WAV container for key `k`, 200 + (k mod 64) samples,
    * mono 8 kHz: even keys PCM16 with sample = ((k·31 + j·77) mod 4001) −
    * 2000 (exercises decodeWavFeatures), odd keys G.711 μ-law with
    * companded byte = (k·13 + j·29) mod 256 (exercises the CCITT expansion
    * in decodeG711Samples — the oracle replicates the expansion formula in
    * integer SQL). */
  private[queries] def audioBytes(k: Long): Array[Byte] = {
    val n = 200 + (k % 64).toInt
    val pcm = k % 2 == 0
    val dataSize = if (pcm) n * 2 else n
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(if (pcm) 1 else 7)                    // format tag
    bb.putShort(1).putInt(8000)                       // mono, 8 kHz
    bb.putInt(if (pcm) 16000 else 8000)               // byte rate
    bb.putShort(if (pcm) 2 else 1)                    // block align
    bb.putShort(if (pcm) 16 else 8)                   // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var j = 0
    while (j < n) {
      if (pcm) bb.putShort((((k * 31 + j * 77L) % 4001) - 2000).toShort)
      else bb.put(((k * 13 + j * 29L) % 256).toByte)
      j += 1
    }
    bb.array()
  }

  /** The bounded key slice as a typed media dataset — executor-side
    * generation inside the map, no driver round trip. */
  private def mediaOf(s: SparkSession, d: String, kind: String,
                      gen: Long => Array[Byte]) = {
    import s.implicits._
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= KeyCap)
      .select(col("o_orderkey"))
      .as[Long]
      .map(k => Multimodal.MediaRow(k, kind, gen(k)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IMAGE decode end-to-end under the per-round hash discipline:
    // formula pixels → PNG/QOI containers → sniff + registry decode
    // (ImageIOCodec / QoiCodec) → 8-dim feature vector; the gate projects
    // the bit-deterministic components (exact channel means, the
    // index-ordered luma fold, header geometry). Oracle: the same stats
    // from the generator formula in DuckDB.
    "q204_media_decode_image" -> ((s, d) => {
      Multimodal.extractFeatures(mediaOf(s, d, "image", imageBytes)).toDF()
        .select(col("media_id").as("o_orderkey"), col("format"),
          col("width"), col("height"),
          col("features")(0).as("mean_r"),
          col("features")(1).as("mean_g"),
          col("features")(2).as("mean_b"),
          col("features")(3).as("mean_l"),
          col("features")(4).as("std_l"),
          col("features")(7).as("aspect"))
        .orderBy(col("o_orderkey"))
    }),

    // AUDIO decode end-to-end: formula samples → PCM16 / μ-law WAV →
    // sniff + registry decode (Pcm16WavCodec's tag dispatch, including
    // the CCITT μ-law expansion) → feature vector. Every gated stat is
    // exact: |sample|/32768 is dyadic, so rms/meanAbs/peak sums are
    // order-independent; zero-crossings are integer counts; duration is
    // the container's integer byte-rate division.
    "q207_media_decode_audio" -> ((s, d) => {
      Multimodal.extractFeatures(mediaOf(s, d, "audio", audioBytes)).toDF()
        .select(col("media_id").as("o_orderkey"), col("format"),
          col("channels"), col("sampleRateHz").as("sample_rate"),
          col("durationMs").as("duration_ms"),
          col("features")(0).as("rms"),
          col("features")(1).as("mean_abs"),
          col("features")(2).as("zcr"),
          col("features")(3).as("peak"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Channel means are exact-integer sums divided in the decoder's
    // operation order; the luma mean/std go through the SAME index-ordered
    // list_reduce fold as the decoder's scanline loop (seedless reduce:
    // Scala's 0.0 + l0 == l0 in IEEE). Luma coefficients are CAST to
    // DOUBLE — bare 0.299 is DECIMAL in DuckDB and would change every
    // product.
    "q204_media_decode_image" -> s"""
      WITH keys AS (
        SELECT o_orderkey AS k,
               16 + CAST(o_orderkey % 8 AS INT) AS w,
               12 + CAST(o_orderkey % 5 AS INT) AS h
        FROM orders WHERE o_orderkey <= $KeyCap),
      px AS (
        SELECT k, w, h,
               list_transform(generate_series(0, w*h - 1), i -> (k*7 + i*13) % 256) AS rs,
               list_transform(generate_series(0, w*h - 1), i -> (k*11 + i*17) % 256) AS gs,
               list_transform(generate_series(0, w*h - 1), i -> (k*3 + i*19) % 256) AS bs
        FROM keys),
      lum AS (
        SELECT k, w, h, rs, gs, bs,
               list_transform(generate_series(1, w*h), i ->
                 CAST(0.299 AS DOUBLE) * rs[i] + CAST(0.587 AS DOUBLE) * gs[i]
                   + CAST(0.114 AS DOUBLE) * bs[i]) AS ls
        FROM px),
      st AS (
        SELECT k, w, h,
               CAST(list_sum(rs) AS DOUBLE) AS sr,
               CAST(list_sum(gs) AS DOUBLE) AS sg,
               CAST(list_sum(bs) AS DOUBLE) AS sb,
               list_reduce(ls, (x, y) -> x + y) AS sl,
               list_reduce(list_transform(ls, l -> l * l), (x, y) -> x + y) AS sl2
        FROM lum)
      SELECT k AS o_orderkey,
             CASE WHEN k % 2 = 0 THEN 'png' ELSE 'qoi' END AS format,
             CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             CAST(sr / (w*h) / 255.0 AS FLOAT) AS mean_r,
             CAST(sg / (w*h) / 255.0 AS FLOAT) AS mean_g,
             CAST(sb / (w*h) / 255.0 AS FLOAT) AS mean_b,
             CAST(sl / (w*h) / 255.0 AS FLOAT) AS mean_l,
             CAST(SQRT(GREATEST(sl2 / (w*h) - (sl / (w*h)) * (sl / (w*h)), 0.0)) / 255.0 AS FLOAT) AS std_l,
             CAST(CAST(w AS DOUBLE) / h AS FLOAT) AS aspect
      FROM st
      ORDER BY o_orderkey""",

    // μ-law expansion replicated in integer SQL (CCITT reference: with
    // u = 255 − byte, mag = ((u%16)·8 + 132) · 2^((u//16)%8) − 132, sign
    // from u ≥ 128); duration is dataSize·1000 // byteRate = n // 8 for
    // both containers.
    "q207_media_decode_audio" -> s"""
      WITH keys AS (
        SELECT o_orderkey AS k, 200 + CAST(o_orderkey % 64 AS INT) AS n
        FROM orders WHERE o_orderkey <= $KeyCap),
      raw AS (
        -- fixed-bound series + filter: DuckDB's FROM-clause generate_series
        -- cannot take a lateral column bound (max n is 200 + 63).
        SELECT k, n, j, 255 - (k*13 + j*29) % 256 AS u
        FROM keys, generate_series(0, 262) t(j)
        WHERE j < n),
      samp AS (
        SELECT k, n, j,
               CASE WHEN k % 2 = 0 THEN (k*31 + j*77) % 4001 - 2000
                    ELSE (CASE WHEN u >= 128 THEN -1 ELSE 1 END)
                         * (((u % 16) * 8 + 132) * (1 << CAST((u // 16) % 8 AS INT)) - 132)
               END AS v
        FROM raw),
      sz AS (
        SELECT k, n, j, v,
               CASE WHEN j > 0 AND ((v >= 0) <> (lag(v) OVER (PARTITION BY k ORDER BY j) >= 0))
                    THEN 1 ELSE 0 END AS zc
        FROM samp),
      agg AS (
        SELECT k, n,
               SUM(CAST(ABS(v) AS DOUBLE) / 32768.0) AS sa,
               SUM((CAST(ABS(v) AS DOUBLE) / 32768.0) * (CAST(ABS(v) AS DOUBLE) / 32768.0)) AS s2,
               MAX(CAST(ABS(v) AS DOUBLE) / 32768.0) AS peak,
               SUM(zc) AS nzc
        FROM sz GROUP BY k, n)
      SELECT k AS o_orderkey, 'wav' AS format,
             CAST(1 AS INT) AS channels, CAST(8000 AS INT) AS sample_rate,
             CAST(n // 8 AS BIGINT) AS duration_ms,
             CAST(SQRT(s2 / n) AS FLOAT) AS rms,
             CAST(sa / n AS FLOAT) AS mean_abs,
             CAST(CAST(nzc AS DOUBLE) / n AS FLOAT) AS zcr,
             CAST(peak AS FLOAT) AS peak
      FROM agg
      ORDER BY o_orderkey"""
  )
}
