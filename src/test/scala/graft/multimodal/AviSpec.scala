package graft.multimodal

import graft.SparkSpec
import java.io.ByteArrayOutputStream

/** Uncompressed-AVI decode against a genuine container built in-test:
  * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh vids, strf BI_RGB 24}}
  * → LIST(movi){00db DIB frames}. DIB rows are bottom-up BGR with 4-byte
  * stride — the orientation test pins that explicitly. */
class AviSpec extends SparkSpec {

  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(id.getBytes); bos.write(le32(data.length)); bos.write(data)
    if (data.length % 2 == 1) bos.write(0)
    bos.toByteArray
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes ++ children)

  /** frames: per frame, rows TOP-DOWN as (r,g,b) — the builder stores them
    * bottom-up as DIB demands. */
  private def avi(w: Int, h: Int, usPerFrame: Int,
                  frames: Seq[IndexedSeq[IndexedSeq[(Int, Int, Int)]]],
                  biCompression: Int = 0): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ new Array[Byte](16)
    val strh = "vids".getBytes ++ "DIB ".getBytes ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++
      le32(0) ++ le32(frames.size) ++ le32(0) ++ le32(0) ++ le32(0) ++
      new Array[Byte](8)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(biCompression) ++ le32(stride * h) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.map { fr =>
      val dib = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = fr(y)(x)
        val row = h - 1 - y // bottom-up
        dib(row * stride + x * 3) = b.toByte
        dib(row * stride + x * 3 + 1) = g.toByte
        dib(row * stride + x * 3 + 2) = r.toByte
      }
      chunk("00db", dib)
    }.reduce(_ ++ _))
    val body = "AVI ".getBytes ++ hdrl ++ movi
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  private def solid(w: Int, h: Int, rgb: (Int, Int, Int)) =
    IndexedSeq.fill(h)(IndexedSeq.fill(w)(rgb))

  private val rgbFrames = Seq(
    solid(4, 2, (255, 0, 0)), solid(4, 2, (0, 255, 0)), solid(4, 2, (0, 0, 255)))

  test("parseMeta: avi format, dimensions, duration from avih") {
    val m = Multimodal.parseMeta(avi(4, 2, 40000, rgbFrames))
    assert(m.format === "avi" && m.width === 4 && m.height === 2)
    assert(m.durationMs === 120L) // 3 frames x 40ms
  }

  test("decodeAviFrames: frame count, colors, bottom-up row order") {
    val frames = Multimodal.decodeAviFrames(avi(4, 2, 40000, rgbFrames)).get
    assert(frames.size === 3)
    assert((frames(0).getRGB(0, 0) & 0xFFFFFF) === 0xFF0000)
    assert((frames(1).getRGB(0, 0) & 0xFFFFFF) === 0x00FF00)
    assert((frames(2).getRGB(0, 0) & 0xFFFFFF) === 0x0000FF)
    // top row white, bottom black: the decoder must flip DIB's bottom-up
    // storage back to top-down pixels.
    val twoTone = Seq(IndexedSeq(
      IndexedSeq.fill(4)((255, 255, 255)), IndexedSeq.fill(4)((0, 0, 0))))
    val f = Multimodal.decodeAviFrames(avi(4, 2, 40000, twoTone)).get.head
    assert((f.getRGB(0, 0) & 0xFFFFFF) === 0xFFFFFF)
    assert((f.getRGB(0, 1) & 0xFFFFFF) === 0x000000)
  }

  test("decodeAviFeatures: mean of per-frame stats") {
    val fv = Multimodal.decodeAviFeatures(avi(4, 2, 40000, rgbFrames)).get
    // solid R, G, B frames: each channel mean is 1/3 across frames.
    assert(math.abs(fv(0) - 1f / 3) < 1e-6 && math.abs(fv(1) - 1f / 3) < 1e-6 &&
      math.abs(fv(2) - 1f / 3) < 1e-6)
    assert(fv(5) === math.log1p(120.0).toFloat) // duration slot
  }

  test("compressed or headerless AVI decodes to None (stub fallback)") {
    assert(Multimodal.decodeAviFrames(
      avi(4, 2, 40000, rgbFrames, biCompression = 1)).isEmpty)
    val noMovi = {
      val b = avi(4, 2, 40000, rgbFrames)
      java.util.Arrays.copyOf(b, 140) // truncate before movi
    }
    assert(Multimodal.decodeAviFrames(noMovi).isEmpty)
    val stub = Multimodal.decodeFeatures("avi",
      avi(4, 2, 40000, rgbFrames, biCompression = 1))
    assert(stub === Multimodal.decodeStub(
      avi(4, 2, 40000, rgbFrames, biCompression = 1)))
  }

  test("frameSample: every k-th AVI frame becomes a standalone PNG row") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(7L, "clip", avi(4, 2, 40000, rgbFrames))).toDS()
    val rows = Multimodal.frameSample(media, everyK = 2).collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq === Seq(7000L, 7002L))
    assert(rows.map(_.kind).toSeq === Seq("clip#frame0", "clip#frame2"))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(1).content))
    assert((img.getRGB(0, 0) & 0xFFFFFF) === 0x0000FF) // frame 2 is blue
  }

  test("extractFeatures routes avi through the codec registry") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, "clip", avi(4, 2, 40000, rgbFrames))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.format === "avi" && f.width === 4 && f.height === 2 &&
      f.durationMs === 120L)
    assert(math.abs(f.features(0) - 1f / 3) < 1e-6)
  }
}
