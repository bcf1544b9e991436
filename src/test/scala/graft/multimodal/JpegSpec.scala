package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled baseline-JPEG decoder (multimodal.Jpeg) against
  * JDK-encoded fixtures — the JDK ENCODER is fine (we only distrust the
  * opaque decoder), and every q214 gate blob is produced by it, so these
  * fixtures are the exact wire format the gate decodes.
  *
  * Error-envelope pins (the q214 tightening evidence):
  *  - flat fields: every decoded block is DC-only, so the only error is
  *    the encoder's DC quantization — per-channel mean within ±1.6/255
  *    (+0.35 chroma headroom over the measured r19 max of 1.23 LSB) and
  *    near-zero std;
  *  - non-flat content: our exact-cosine IDCT vs the JDK's libjpeg
  *    fixed-point path stay within ±2 LSB per pixel on a gradient.
  */
class JpegSpec extends AnyFunSuite {

  private def enc(im: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  private def flat(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = im.createGraphics()
    g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
    enc(im)
  }

  test("flat fields decode to the synthesis color within the DC-quantization envelope") {
    // k to 256 covers every channel value the q214 generator can emit
    // (colors cycle mod 256; dims cycle mod 40) — this loop IS the gate's
    // fixture space, so the bound here is the q214 band's evidence.
    var maxErr = 0.0
    for (k <- 1L to 256L) {
      val w = 16 + (k % 8).toInt; val h = 12 + (k % 5).toInt
      val r = ((k * 7) % 256).toInt; val g = ((k * 11) % 256).toInt
      val b = ((k * 3) % 256).toInt
      val bytes = flat(w, h, (r << 16) | (g << 8) | b)
      val f = Jpeg.decodeFeatures(bytes).getOrElse(fail(s"k=$k did not decode"))
      val errs = Seq(
        math.abs(f(0) - r / 255.0), math.abs(f(1) - g / 255.0),
        math.abs(f(2) - b / 255.0))
      maxErr = math.max(maxErr, errs.max)
      // The residual is the ENCODER's DC quantization (×~1.77 chroma
      // conversion gain), not ours: the JDK decoder lands on the same
      // pixels ±1 LSB (asserted below), it just can't beat the encoder.
      assert(errs.max < 3.5 / 255.0, s"k=$k ($r,$g,$b): mean err ${errs.max * 255} LSB")
      assert(f(4) < 1.0 / 255.0, s"k=$k: flat-field std ${f(4) * 255} LSB")
      assert(f(5) == math.log1p(w.toDouble).toFloat &&
             f(6) == math.log1p(h.toDouble).toFloat, s"k=$k: dims wrong")
    }
    info(f"max flat-field channel error: ${maxErr * 255}%.3f LSB")
  }

  test("flat fields: our decoder matches the JDK decoder within ±1 LSB per pixel") {
    for (k <- Seq(4L, 37L, 160L, 200L, 255L)) {
      val w = 16 + (k % 8).toInt; val h = 12 + (k % 5).toInt
      val rgb = (((k * 7) % 256).toInt << 16) |
        (((k * 11) % 256).toInt << 8) | ((k * 3) % 256).toInt
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = im.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val d = pixelDiffVsJdk(im)
      assert(d <= 1, s"k=$k: flat-field decoder divergence $d LSB")
    }
  }

  private def pixelDiffVsJdk(im: java.awt.image.BufferedImage): Int = {
    val bytes = enc(im)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (dw, dh, argb) = Jpeg.decodeRaster(bytes).getOrElse(fail("did not decode"))
    assert(dw == im.getWidth && dh == im.getHeight)
    var maxD = 0
    for (y <- 0 until dh; x <- 0 until dw) {
      val a = argb(y * dw + x); val b = jdk.getRGB(x, y)
      for (sh <- Seq(16, 8, 0))
        maxD = math.max(maxD, math.abs(((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)))
    }
    maxD
  }

  test("luma gradient: our IDCT stays within ±2 LSB of the JDK decoder per pixel") {
    // Gray ramp: Cb = Cr = 128 everywhere, so chroma upsampling plays no
    // role and the comparison isolates IDCT + YCbCr math — exact-cosine
    // doubles here vs libjpeg's scaled-integer path there.
    val w = 37; val h = 29
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = 40 + x * 3 + y * 2 // smooth, no wrap (max 40+108+56=204)
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val maxD = pixelDiffVsJdk(im)
    info(s"max per-pixel |ours - JDK| on luma gradient: $maxD LSB")
    assert(maxD <= 2, s"IDCT divergence from JDK decoder: $maxD LSB")
  }

  test("smooth color gradient: box vs libjpeg-fancy chroma upsampling stays bounded") {
    // With 4:2:0 subsampling the JDK (libjpeg) interpolates chroma while
    // we box-replicate — a DOCUMENTED algorithmic difference, not a bug.
    // On a slope-≤3/px chroma ramp the positional error is ≤2 luma px,
    // so the divergence is bounded by ~slope·2·1.77 ≈ 11 LSB.
    val w = 40; val h = 24
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, ((60 + x * 3) << 16) | ((50 + y * 3) << 8) | (80 + x + y))
    val maxD = pixelDiffVsJdk(im)
    info(s"max per-pixel |ours - JDK| on color gradient: $maxD LSB")
    assert(maxD <= 12, s"upsampling divergence beyond the algorithmic bound: $maxD LSB")
  }

  test("grayscale (1-component) baseline decodes") {
    val im = new java.awt.image.BufferedImage(20, 14,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = im.createGraphics()
    g.setColor(new java.awt.Color(0x808080)); g.fillRect(0, 0, 20, 14); g.dispose()
    val f = Jpeg.decodeFeatures(enc(im)).getOrElse(fail("grayscale did not decode"))
    assert(math.abs(f(0) - 128 / 255.0) < 2.0 / 255.0)
    assert(f(0) == f(1) && f(1) == f(2))
  }

  test("progressive JPEG is rejected to the stub, not mis-decoded") {
    val im = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = im.createGraphics()
    g.setColor(new java.awt.Color(0x406080)); g.fillRect(0, 0, 24, 16); g.dispose()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(im, null, null), p)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // Sanity: the fixture really is progressive (SOF2 marker present).
    assert(bytes.sliding(2).exists(s => (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xC2))
    assert(Jpeg.decodeRaster(bytes).isEmpty)
  }

  test("corrupt and truncated streams return None, never throw") {
    val good = flat(20, 15, 0x336699)
    assert(Jpeg.decodeRaster(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
    assert(Jpeg.decodeRaster(good.take(good.length / 2)).isEmpty)
    assert(Jpeg.decodeRaster(good.map(b => (b ^ 0x5A).toByte)).isEmpty)
    assert(Jpeg.decodeRaster(Array.fill(64)(0x41.toByte)).isEmpty)
  }

  test("the registry routes jpeg through the hand-rolled codec") {
    assert(Codecs.forFormat("jpeg").contains(JpegCodec))
    assert(Codecs.forFormat("png").contains(ImageIOCodec))
  }
}
