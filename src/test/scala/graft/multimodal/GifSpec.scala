package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream

/** Pins for the GifCodec decode path beyond the q213 hash gate: lossless
  * indexed round trip (decoded pixels equal the palette lookup exactly),
  * the 16-frame sampling cap with the TOTAL count in slot 5, parity with
  * the PNG path on identical pixels, sub-rectangle (delta-frame)
  * rejection, and corrupt-byte rejection — the same spec shape BmpSpec /
  * QoiSpec / AviSpec give the other codecs. */
class GifSpec extends AnyFunSuite {

  /** Full-frame GIF from explicit palette + per-frame index grids (the
    * q213 generator's shape, reduced to fixture scale). */
  private def indexedGif(w: Int, h: Int,
                         pal: (Array[Byte], Array[Byte], Array[Byte]),
                         frames: Seq[Array[Int]]): Array[Byte] = {
    val icm = new java.awt.image.IndexColorModel(8, 256, pal._1, pal._2, pal._3)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { idx =>
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val r = im.getRaster
        var i = 0
        while (i < w * h) { r.setSample(i % w, i / w, 0, idx(i)); i += 1 }
        writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private val pal = (
    Array.tabulate(256)(j => ((j * 3) % 256).toByte),
    Array.tabulate(256)(j => ((j * 5) % 256).toByte),
    Array.tabulate(256)(j => ((j * 11) % 256).toByte))

  test("lossless indexed round trip: decoded stats equal the PNG path on the same pixels") {
    val w = 9; val h = 7
    val idx = Array.tabulate(w * h)(i => (i * 7) % 256)
    val gif = indexedGif(w, h, pal, Seq(idx))
    val got = Multimodal.decodeGifFeatures(gif).get
    // The same pixels through the lossless PNG path (palette applied).
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    idx.zipWithIndex.foreach { case (j, i) =>
      im.setRGB(i % w, i / w,
        ((pal._1(j) & 0xFF) << 16) | ((pal._2(j) & 0xFF) << 8) | (pal._3(j) & 0xFF))
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val png = Multimodal.decodeImageFeatures(bos.toByteArray).get
    // Slots 0-4 are the pixel stats (single frame: fold = the stats);
    // 5 is the frame count here vs log1p(w) on the PNG path.
    assert(got.take(5).toSeq == png.take(5).toSeq, s"${got.toSeq} vs ${png.toSeq}")
    assert(got(5) == 1f)
  }

  test("multi-frame mean + the 16-frame sampling cap; slot 5 is the TOTAL count") {
    val w = 4; val h = 3
    // 18 frames; frames 16/17 are poison (index 255) — the cap must
    // exclude them from the fold while slot 5 still reads 18.
    val frames = (0 until 18).map { f =>
      Array.fill(w * h)(if (f < 16) 10 else 255)
    }
    val gif = indexedGif(w, h, pal, frames)
    val got = Multimodal.decodeGifFeatures(gif).get
    val r10 = ((pal._1(10) & 0xFF) / 255.0).toFloat
    // 16 identical frames of palette[10]: the float fold of 16 equal
    // sixteenths reassembles the per-frame mean exactly (dyadic).
    assert(math.abs(got(0) - r10) < 1e-6, s"${got(0)} vs $r10")
    assert(got(5) == 18f)
  }

  test("frames smaller than the logical screen are rejected (compositing is frameSample's job)") {
    // The JDK writer always emits full frames, so construct the delta-GIF
    // shape by widening the LOGICAL SCREEN instead: the screen descriptor's
    // width sits at the FIXED header offset 6 (u16le) — patch 6 -> 8 and
    // the stored 6x4 frame is now a sub-rectangle of an 8x4 screen.
    val gif = indexedGif(6, 4, pal, Seq(Array.fill(24)(1)))
    assert(Multimodal.decodeGifFeatures(gif).isDefined)
    val patched = gif.clone()
    patched(6) = 8; patched(7) = 0
    assert(Multimodal.parseMeta(patched).width == 8)
    assert(Multimodal.decodeGifFeatures(patched).isEmpty,
      "a frame smaller than the logical screen must fall to the stub")
  }

  /** Hand-assembled GIF with an explicit interlace flag and pixel stream:
    * GCT of 256 entries, one image descriptor, and an "uncompressed" LZW
    * stream (clear code before every literal so the dictionary never
    * grows — all codes stay 9 bits). Rows are emitted in interlace pass
    * order when `interlaced`, so the decoder's 8/8/4/2 walk is on the
    * hook — this is the shape the JDK reader corrupted at heights 2–4. */
  private def rawGif(w: Int, h: Int, interlaced: Boolean,
                     pal: (Array[Byte], Array[Byte], Array[Byte]),
                     idx: Array[Int]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    bos.write("GIF89a".getBytes)
    u16(w); u16(h)
    bos.write(0xF7); bos.write(0); bos.write(0)     // GCT, 256 entries
    (0 until 256).foreach { j =>
      bos.write(pal._1(j) & 0xFF); bos.write(pal._2(j) & 0xFF); bos.write(pal._3(j) & 0xFF)
    }
    bos.write(0x2C); u16(0); u16(0); u16(w); u16(h)
    bos.write(if (interlaced) 0x40 else 0x00)
    bos.write(8)                                     // LZW min code size
    // Row emission order: interlace passes start 0/4/2/1, step 8/8/4/2.
    val rows =
      if (!interlaced) 0 until h
      else Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s, st) => s until h by st }
    val codes = rows.flatMap(y => (0 until w).map(x => Seq(256, idx(y * w + x))))
      .flatten :+ 257                                // clear+literal pairs, then EOI
    // Pack 9-bit codes LSB-first, then split into <=255-byte sub-blocks.
    val bits = new scala.collection.mutable.ArrayBuffer[Byte]()
    var acc = 0; var nBits = 0
    codes.foreach { c =>
      acc |= c << nBits; nBits += 9
      while (nBits >= 8) { bits += (acc & 0xFF).toByte; acc >>= 8; nBits -= 8 }
    }
    if (nBits > 0) bits += (acc & 0xFF).toByte
    bits.grouped(255).foreach { blk => bos.write(blk.length); bos.write(blk.toArray) }
    bos.write(0); bos.write(0x3B)
    bos.toByteArray
  }

  test("interlaced heights 2-4 decode every row (the JDK-reader row-loss range)") {
    // Distinct index per row: a dropped/zeroed row shifts every channel
    // mean, so the PNG-parity check pins the full interlace walk.
    for (h <- 2 to 4; w = 5) {
      val idx = Array.tabulate(w * h)(i => 10 + (i / w) * 40)
      val gif = rawGif(w, h, interlaced = true, pal, idx)
      val got = Multimodal.decodeGifFeatures(gif)
        .getOrElse(fail(s"interlaced ${w}x$h GIF must decode"))
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      idx.zipWithIndex.foreach { case (j, i) =>
        im.setRGB(i % w, i / w,
          ((pal._1(j) & 0xFF) << 16) | ((pal._2(j) & 0xFF) << 8) | (pal._3(j) & 0xFF))
      }
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      val png = Multimodal.decodeImageFeatures(bos.toByteArray).get
      assert(got.take(5).toSeq == png.take(5).toSeq,
        s"h=$h: ${got.toSeq} vs ${png.toSeq}")
      // Non-interlaced same pixels must agree with the interlaced read.
      val flat = Multimodal.decodeGifFeatures(rawGif(w, h, interlaced = false, pal, idx)).get
      assert(flat.take(5).toSeq == got.take(5).toSeq)
    }
  }

  test("corrupt bytes decode to None, truncation never throws") {
    assert(Multimodal.decodeGifFeatures("GIF89a".getBytes ++ Array.fill(4)(0xFF.toByte)).isEmpty)
    assert(Multimodal.decodeGifFeatures(Array.fill(64)(0x42.toByte)).isEmpty)
    val ok = indexedGif(4, 3, pal, Seq(Array.fill(12)(0)))
    // Truncation tolerance is reader-dependent; the contract is no throw.
    (1 until ok.length by 7).foreach(n => Multimodal.decodeGifFeatures(ok.take(n)))
  }
}
