package graft.multimodal

/** Pluggable media decode codec: bytes of a sniffed container format →
  * fixed-width feature vector, or None when the bytes cannot be decoded
  * (corrupt container, unsupported profile). The deployment seam for the
  * formats the JDK cannot decode — compressed audio, video codecs — whose
  * fallback today is Multimodal.decodeStub: implement this trait, register
  * it, and the Spark plumbing (schema, batching, partitioning) is
  * untouched.
  */
trait MediaCodec extends Serializable {
  /** The parseMeta format strings this codec claims (e.g. "png", "wav"). */
  def formats: Set[String]
  def decode(bytes: Array[Byte]): Option[Array[Float]]
}

/** Built-in: true pixel decode for PNG via javax.imageio (the one format
  * still on the JDK reader; PNG is lossless, so the bit-exact q204 gate
  * would catch a wrong raster immediately — unlike the lossy formats,
  * where wrongness hides inside the error envelope). */
object ImageIOCodec extends MediaCodec {
  val formats: Set[String] = Set("png")
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    Multimodal.decodeImageFeatures(bytes)
}

/** Built-in: hand-rolled baseline-JPEG decode (multimodal.Jpeg — marker
  * walk, Huffman + dequant + exact IDCT, chroma upsample, YCbCr→RGB; no
  * ImageIO). Progressive/arithmetic/12-bit/CMYK streams decode to None
  * (→ stub fallback) rather than risk a silently wrong raster — the
  * GIF-incident discipline applied to the JDK's opaque libjpeg wrapper. */
object JpegCodec extends MediaCodec {
  val formats: Set[String] = Set("jpeg")
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    Jpeg.decodeFeatures(bytes)
}

/** Built-in: true sample decode for WAV, dispatching on the fmt-chunk
  * format tag — PCM16 (tag 1), MS-ADPCM (tag 2), G.711 A-law/μ-law
  * (tags 6/7), and IMA-ADPCM (tag 0x11) are all pure byte math; other
  * tags decode to None (→ stub fallback). Each decoder rejects the
  * others' tags, so orElse is a tag dispatch, not a retry. */
object Pcm16WavCodec extends MediaCodec {
  val formats: Set[String] = Set("wav")
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    Multimodal.decodeWavFeatures(bytes)
      .orElse(Multimodal.decodeImaAdpcmWavFeatures(bytes))
      .orElse(Multimodal.decodeG711WavFeatures(bytes))
      .orElse(Multimodal.decodeMsAdpcmWavFeatures(bytes))
}

/** Built-in: true frame decode for uncompressed AVI (BI_RGB 24-bit DIB
  * frames — pure byte math, no codec dependency); the feature vector is
  * the mean of per-frame image stats. Compressed AVI decodes to None (→
  * stub fallback) — register a real codec to claim it. */
object AviCodec extends MediaCodec {
  val formats: Set[String] = Set("avi")
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    Multimodal.decodeAviFeatures(bytes)
}

/** Built-in: hand-rolled BMP pixel decode from the public
  * BITMAPINFOHEADER layout — BI_RGB 8/24/32 bpp AND the BI_RLE8
  * compressed path (run/absolute/EOL/delta escapes), no ImageIO — the
  * registry's proof that a compressed format can be claimed with a pure
  * byte-math decoder. Same 8-dim feature contract as ImageIOCodec
  * (shared imageStats). Other depths/compressions decode to None (→
  * stub fallback). */
object BmpCodec extends MediaCodec {
  val formats: Set[String] = Set("bmp")
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    Multimodal.decodeBmpFeatures(bytes)
}

/** Built-in: hand-rolled QOI pixel decode from the public qoiformat.org
  * spec — a true COMPRESSED image format (run/index/diff/luma chunk
  * stream) claimed with ~60 lines of byte math and no third-party code.
  * Same 8-dim feature contract as the other image codecs. */
object QoiCodec extends MediaCodec {
  val formats: Set[String] = Set("qoi")
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    Multimodal.decodeQoiFeatures(bytes)
}

/** Built-in: true frame decode for GIF via the hand-rolled LZW +
  * interlace decoder (Multimodal.gifWalk — no ImageIO: the JDK's GIF
  * reader silently drops the last interlace pass-4 row at heights 2–4) —
  * whole-frame rasters only (sub-rectangle delta frames fall to the
  * stub; compositing them is Multimodal.frameSample's job). Feature
  * vector is the per-frame image-stat mean over at most 16 frames with
  * the total frame count in slot 5. */
object GifCodec extends MediaCodec {
  val formats: Set[String] = Set("gif")
  def decode(bytes: Array[Byte]): Option[Array[Float]] =
    Multimodal.decodeGifFeatures(bytes)
}

/** The codec registry behind Multimodal.decodeFeatures. Format-keyed; last
  * registration wins, so a deployment can override a built-in (or claim a
  * format that currently stubs).
  *
  * Distribution contract: lookups happen EXECUTOR-side (inside
  * mapPartitions), and this registry is per-JVM static state — driver-side
  * `register` calls do not propagate to executors on a real cluster.
  * Custom codecs must be registered from a static initializer in a jar on
  * the executor classpath (the same rule as any JVM-static Spark
  * extension); the built-ins below follow it by registering at class-init.
  */
object Codecs {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MediaCodec]()

  def register(codec: MediaCodec): Unit =
    codec.formats.foreach(f => registry.put(f, codec))

  /** Remove the binding for one format (reverts it to the stub fallback). */
  def unregister(format: String): Unit = registry.remove(format)

  def forFormat(format: String): Option[MediaCodec] =
    Option(registry.get(format))

  register(ImageIOCodec)
  register(JpegCodec)
  register(Pcm16WavCodec)
  register(AviCodec)
  register(BmpCodec)
  register(QoiCodec)
  register(GifCodec)
}
