package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** QOI codec pinned against an INDEPENDENT in-test encoder written
  * straight from the qoiformat.org spec: pixel grids are encoded here
  * (exercising every chunk op), decoded by the production codec, and the
  * resulting features must be BIT-IDENTICAL to the lossless PNG path on
  * the same pixels — the same cross-codec contract BmpSpec establishes. */
class QoiSpec extends AnyFunSuite {

  /** Reference encoder: RGB pixels (packed 0xRRGGBB, row-major) → QOI
    * bytes. Emits RUN/INDEX/DIFF/LUMA/RGB ops exactly per the spec. */
  private def encode(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
    }
    out.write("qoif".getBytes); u32(w); u32(h); out.write(3); out.write(0)
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; val a = 255
    var run = 0
    for (p <- px) {
      val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xC0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xC0 | (run - 1)); run = 0 }
        val hash = (r * 3 + g * 5 + b * 7 + a * 11) & 63
        val packed = (a << 24) | (r << 16) | (g << 8) | b
        if (index(hash) == packed) out.write(hash)
        else {
          index(hash) = packed
          val dr = ((r - pr + 128) & 0xFF) - 128
          val dg = ((g - pg + 128) & 0xFF) - 128
          val db = ((b - pb + 128) & 0xFF) - 128
          val drg = dr - dg; val dbg = db - dg
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                   dbg >= -8 && dbg <= 7) {
            out.write(0x80 | (dg + 32)); out.write(((drg + 8) << 4) | (dbg + 8))
          } else { out.write(0xFE); out.write(r); out.write(g); out.write(b) }
        }
        pr = r; pg = g; pb = b
      }
    }
    if (run > 0) out.write(0xC0 | (run - 1))
    for (_ <- 0 until 7) out.write(0)
    out.write(1)
    out.toByteArray
  }

  private def pngBytes(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** A 16×12 grid that exercises DIFF (small deltas), LUMA (medium
    * deltas), RGB (large jumps), INDEX (revisited colors), RUN (flat
    * spans). */
  private val w = 16; private val h = 12
  private val px: Array[Int] = Array.tabulate(w * h) { i =>
    val x = i % w; val y = i / w
    if (y < 3) 0x336699                             // flat → RUN
    else if (y < 6) {                               // gradient → DIFF/LUMA
      val r = (51 + x) & 0xFF; val g = (102 + 2 * x) & 0xFF
      val b = (153 + y) & 0xFF
      (r << 16) | (g << 8) | b
    }
    else if (y % 2 == 0) 0x336699                   // revisit → INDEX
    else (x * 71 % 256) << 16 | (y * 53 % 256) << 8 | (x * y % 256) // RGB
  }

  test("decoded features are bit-identical to the lossless PNG path") {
    val qoi = Multimodal.decodeQoiFeatures(encode(px, w, h))
    val png = Multimodal.decodeImageFeatures(pngBytes(px, w, h))
    assert(qoi.isDefined && png.isDefined)
    assert(qoi.get.toSeq === png.get.toSeq)
  }

  test("run-heavy solid image round-trips (OP_RUN across the 62 cap)") {
    val solid = Array.fill(40 * 5)(0xAB2301)
    val qoi = Multimodal.decodeQoiFeatures(encode(solid, 40, 5))
    val png = Multimodal.decodeImageFeatures(pngBytes(solid, 40, 5))
    assert(qoi.get.toSeq === png.get.toSeq)
  }

  test("parseMeta sniffs qoi dimensions and channels") {
    val m = Multimodal.parseMeta(encode(px, w, h))
    assert(m.format === "qoi" && m.width === w && m.height === h &&
      m.channels === 3)
  }

  test("registry claims qoi; reject paths fall back to None") {
    assert(Codecs.forFormat("qoi").contains(QoiCodec))
    val good = encode(px, w, h)
    assert(Multimodal.decodeQoiFeatures("noti".getBytes ++ good.drop(4)).isEmpty)
    assert(Multimodal.decodeQoiFeatures(good.dropRight(30)).isEmpty,
      "truncated chunk stream must not decode")
    val lying = good.clone()
    lying(7) = 99.toByte // header claims more columns than the stream fills
    assert(Multimodal.decodeQoiFeatures(lying).isEmpty)
  }
}
