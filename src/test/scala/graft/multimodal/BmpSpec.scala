package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream

/** Pixel-parity for the hand-rolled BMP codec — the registry's first
  * COMPRESSED image format (BI_RLE8). The RLE8 fixture is encoded
  * byte-by-byte in this spec (runs, absolute mode with its word-align
  * pad, end-of-line, a delta skip, end-of-bitmap), its expected pixel
  * grid is maintained independently as a literal, and the expected
  * 8-dim features come from the SAME pixels pushed through the
  * PNG/ImageIO path (lossless round-trip) — so the two codecs are
  * pinned to one feature contract. */
class BmpSpec extends AnyFunSuite {

  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** BMP container: 14-byte file header + 40-byte BITMAPINFOHEADER +
    * optional palette (BGRA quads) + pixel payload. */
  private def bmp(w: Int, h: Int, bpp: Int, comp: Int,
                  palette: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dataOff = 14 + 40 + 4 * palette.size
    out.write('B'); out.write('M')
    out.write(le32(dataOff + payload.length))
    out.write(le32(0)); out.write(le32(dataOff))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
    out.write(le16(1)); out.write(le16(bpp)); out.write(le32(comp))
    out.write(le32(payload.length)); out.write(le32(0)); out.write(le32(0))
    out.write(le32(palette.size)); out.write(le32(0))
    palette.foreach { rgb =>
      out.write(rgb & 0xFF); out.write((rgb >> 8) & 0xFF)
      out.write((rgb >> 16) & 0xFF); out.write(0)
    }
    out.write(payload)
    out.toByteArray
  }

  /** Expected features: the grid (image space, row 0 = TOP) through the
    * lossless PNG path — BufferedImage → PNG bytes → decodeImageFeatures. */
  private def featuresViaPng(w: Int, h: Int, grid: Array[Array[Int]]): Array[Float] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, grid(y)(x))
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    Multimodal.decodeImageFeatures(bos.toByteArray).get
  }

  private val pal = Seq(0x0A141E, 0xC80000, 0x009600, 0x0000FA)

  test("BI_RLE8 decodes runs, absolute mode, delta, and EOL/EOF exactly") {
    val w = 9; val h = 4
    // Opcode stream in bitmap space (x=0, y=0 = BOTTOM-left start):
    val payload = Array[Int](
      0x05, 0x01,                   // run: 5 px of idx 1
      0x00, 0x03, 2, 3, 2, 0x00,    // absolute: 3 literals + word-align pad
      0x01, 0x00,                   // run: 1 px of idx 0
      0x00, 0x00,                   // end of line -> y=1
      0x09, 0x02,                   // run: full row of idx 2
      0x00, 0x00,                   // end of line -> y=2
      0x00, 0x02, 0x03, 0x01,       // delta: skip right 3, up 1 -> (3, 3)
      0x03, 0x03,                   // run: 3 px of idx 3
      0x00, 0x01                    // end of bitmap
    ).map(_.toByte)
    val bytes = bmp(w, h, bpp = 8, comp = 1, pal, payload)

    // Independent expected grid, bitmap space (row 0 = bottom); pixels a
    // delta or EOL skips keep palette index 0.
    val bm = Array(
      Array(1, 1, 1, 1, 1, 2, 3, 2, 0),
      Array(2, 2, 2, 2, 2, 2, 2, 2, 2),
      Array(0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 0, 3, 3, 3, 0, 0, 0))
    val grid = Array.tabulate(h, w)((y, x) => pal(bm(h - 1 - y)(x)))

    val meta = Multimodal.parseMeta(bytes)
    assert(meta.format == "bmp" && meta.width == w && meta.height == h)
    val got = Multimodal.decodeBmpFeatures(bytes).get
    assert(got.toSeq == featuresViaPng(w, h, grid).toSeq,
      "RLE8 pixels must match the PNG path feature-for-feature")
  }

  test("BI_RGB 24-bpp decodes with row padding and bottom-up order") {
    val w = 3; val h = 2
    val grid = Array(
      Array(0xFF0000, 0x00FF00, 0x0000FF), // image top row
      Array(0x102030, 0xFFFFFF, 0x000000))
    // Payload rows bottom-up, BGR, each row padded to a 4-byte boundary.
    val out = new ByteArrayOutputStream()
    for (y <- (h - 1) to 0 by -1) {
      for (x <- 0 until w) {
        val p = grid(y)(x)
        out.write(p & 0xFF); out.write((p >> 8) & 0xFF); out.write((p >> 16) & 0xFF)
      }
      (w * 3 until ((w * 3 + 3) / 4) * 4).foreach(_ => out.write(0))
    }
    val bytes = bmp(w, h, bpp = 24, comp = 0, Seq.empty, out.toByteArray)
    val got = Multimodal.decodeBmpFeatures(bytes).get
    assert(got.toSeq == featuresViaPng(w, h, grid).toSeq)
    // And the registry claims it: decode through the codec seam.
    assert(Codecs.forFormat("bmp").get.decode(bytes).get.toSeq == got.toSeq)
  }

  test("unsupported depth/compression and truncated headers decode to None") {
    val ok = bmp(2, 2, bpp = 8, comp = 1, pal, Array[Byte](0x00, 0x01))
    assert(Multimodal.decodeBmpFeatures(ok).isDefined)
    val badComp = bmp(2, 2, bpp = 8, comp = 2, pal, Array[Byte](0, 0))
    assert(Multimodal.decodeBmpFeatures(badComp).isEmpty)
    val badDepth = bmp(2, 2, bpp = 4, comp = 0, pal, Array[Byte](0, 0, 0, 0))
    assert(Multimodal.decodeBmpFeatures(badDepth).isEmpty)
    assert(Multimodal.decodeBmpFeatures(ok.take(20)).isEmpty)
  }
}
