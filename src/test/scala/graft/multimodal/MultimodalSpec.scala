package graft.multimodal

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

class MultimodalSpec extends SparkSpec {

  /** A REAL minimal PNG (8-bit RGB, raw deflate IDAT) built with JDK-only
    * tools — so metadata parsing is tested against a genuine container. */
  private def png(width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(kind: String, data: Array[Byte]): Unit = {
      val len = ByteBufferBE(data.length)
      out.write(len); out.write(kind.getBytes); out.write(data)
      val crc = new CRC32()
      crc.update(kind.getBytes); crc.update(data)
      out.write(ByteBufferBE(crc.getValue.toInt))
    }
    def ByteBufferBE(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val ihdr = ByteBufferBE(width) ++ ByteBufferBE(height) ++
      Array[Byte](8, 2, 0, 0, 0)
    chunk("IHDR", ihdr)
    val raw = new Array[Byte](height * (1 + width * 3))
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf)
    chunk("IDAT", java.util.Arrays.copyOf(buf, n))
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  private def wav(channels: Int, rate: Int, dataBytes: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    bos.write("RIFF".getBytes); bos.write(le32(36 + dataBytes)); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); bos.write(le32(16)); bos.write(le16(1)); bos.write(le16(channels))
    val byteRate = rate * channels * 2
    bos.write(le32(rate)); bos.write(le32(byteRate)); bos.write(le16(channels * 2)); bos.write(le16(16))
    bos.write("data".getBytes); bos.write(le32(dataBytes)); bos.write(new Array[Byte](dataBytes))
    bos.toByteArray
  }

  /** IMA-ADPCM WAV (format tag 0x11, mono): standard 4-byte block headers
    * followed by the given nibble bytes; fmt carries the cbSize=2
    * extension with wSamplesPerBlock unless `omitExtension`. */
  private def adpcmWav(rate: Int, blockAlign: Int, samplesPerBlock: Int,
                       blocks: Seq[(Short, Int, Array[Byte])],
                       omitExtension: Boolean = false): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val data = new ByteArrayOutputStream()
    blocks.foreach { case (predictor, index, nibbles) =>
      data.write(le16(predictor.toInt & 0xFFFF)); data.write(index); data.write(0)
      data.write(nibbles)
    }
    val db = data.toByteArray
    val fmtLen = if (omitExtension) 16 else 20
    bos.write("RIFF".getBytes); bos.write(le32(12 + fmtLen + 8 + db.length))
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); bos.write(le32(fmtLen))
    bos.write(le16(0x11)); bos.write(le16(1)); bos.write(le32(rate))
    // byteRate for ADPCM = compressed bytes/sec
    bos.write(le32(rate * blockAlign / samplesPerBlock))
    bos.write(le16(blockAlign)); bos.write(le16(4))
    if (!omitExtension) { bos.write(le16(2)); bos.write(le16(samplesPerBlock)) }
    bos.write("data".getBytes); bos.write(le32(db.length)); bos.write(db)
    bos.toByteArray
  }

  /** G.711 WAV (format tag 6 = A-law or 7 = μ-law, 8-bit mono). */
  private def g711Wav(tag: Int, rate: Int, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    bos.write("RIFF".getBytes); bos.write(le32(36 + data.length)); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); bos.write(le32(16)); bos.write(le16(tag)); bos.write(le16(1))
    bos.write(le32(rate)); bos.write(le32(rate)); bos.write(le16(1)); bos.write(le16(8))
    bos.write("data".getBytes); bos.write(le32(data.length)); bos.write(data)
    bos.toByteArray
  }

  test("G.711 mu-law/A-law WAV bytes expand to exact CCITT int16 values") {
    // mu-law reference points (Sun g711.c table): encoded 0xFF -> +0 and
    // 0x7F -> -0 (both 0 after bias removal); encoded 0x00 complements to
    // 0xFF (sign SET) -> -(((15*8+0x84)<<7)-0x84) = -32124, and 0x80
    // complements to 0x7F (sign clear) -> +32124.
    assert(Multimodal.mulawToPcm(0xFF) == 0)
    assert(Multimodal.mulawToPcm(0x7F) == 0)
    assert(Multimodal.mulawToPcm(0x00) == -32124)
    assert(Multimodal.mulawToPcm(0x80) == 32124)
    // A-law reference points: 0xD5 ^ 0x55 = 0x80 -> seg 0, mant 0, sign
    // bit set -> +8; 0x55 -> -8; 0xAA ^ 0x55 = 0xFF -> seg 7, mant 15 ->
    // +((240+264)<<6) = +32256; 0x2A -> -32256.
    assert(Multimodal.alawToPcm(0xD5) == 8)
    assert(Multimodal.alawToPcm(0x55) == -8)
    assert(Multimodal.alawToPcm(0xAA) == 32256)
    assert(Multimodal.alawToPcm(0x2A) == -32256)

    val mu = g711Wav(7, 8000, Array(0xFF, 0x80, 0x00, 0xFF).map(_.toByte))
    assert(Multimodal.decodeG711Samples(mu).get.toSeq ==
      Seq[Short](0, 32124, -32124, 0))
    val al = g711Wav(6, 8000, Array(0xD5, 0x2A, 0xAA, 0xD5).map(_.toByte))
    assert(Multimodal.decodeG711Samples(al).get.toSeq ==
      Seq[Short](8, -32256, 32256, 8))

    // Feature path: peak of the mu-law fixture is 32124/32768, zero-cross
    // twice over 4 samples (0,-,+,0 with >=0 sign convention: -, + is one
    // crossing; + to 0 is none) — assert the exact layout positions.
    val f = Multimodal.decodeG711WavFeatures(mu).get
    assert(math.abs(f(3) - 32124 / 32768.0f) < 1e-6)
    assert(f(6) == 1.0f) // mono
    // Registry dispatch: tag 7 flows through the wav codec chain (not the
    // stub), and a tag the chain rejects (e.g. 2 = MS-ADPCM) stubs.
    assert(Multimodal.decodeFeatures("wav", mu).toSeq == f.toSeq)
  }

  /** MS-ADPCM WAV (format tag 2, mono): 7-byte block headers (u8
    * predictor, i16 delta, i16 samp1, i16 samp2) + nibble bytes; fmt
    * carries the full extension (wSamplesPerBlock, wNumCoef=7, the
    * standard pairs). */
  private def msAdpcmWav(rate: Int, blockAlign: Int, samplesPerBlock: Int,
                         blocks: Seq[(Int, Short, Short, Short, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val data = new ByteArrayOutputStream()
    blocks.foreach { case (pred, delta, s1, s2, nibbles) =>
      data.write(pred); data.write(le16(delta.toInt & 0xFFFF))
      data.write(le16(s1.toInt & 0xFFFF)); data.write(le16(s2.toInt & 0xFFFF))
      data.write(nibbles)
    }
    val db = data.toByteArray
    val stdCoeffs = Seq((256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
      (460, -208), (392, -232))
    val fmtLen = 22 + stdCoeffs.length * 4
    bos.write("RIFF".getBytes); bos.write(le32(12 + fmtLen + 8 + db.length))
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); bos.write(le32(fmtLen))
    bos.write(le16(2)); bos.write(le16(1)); bos.write(le32(rate))
    bos.write(le32(rate * blockAlign / samplesPerBlock))
    bos.write(le16(blockAlign)); bos.write(le16(4))
    bos.write(le16(fmtLen - 18)) // cbSize
    bos.write(le16(samplesPerBlock)); bos.write(le16(stdCoeffs.length))
    stdCoeffs.foreach { case (a, b) => bos.write(le16(a)); bos.write(le16(b)) }
    bos.write("data".getBytes); bos.write(le32(db.length)); bos.write(db)
    bos.toByteArray
  }

  test("MS-ADPCM WAV decodes to exact hand-computed int16 samples") {
    // Predictor 0 -> (256, 0): predict == samp1. Header delta=64,
    // samp1=100, samp2=50 -> output starts [50, 100]. Nibbles 0x21, 0x9F
    // (HIGH first -> codes 2, 1, 9, 15):
    //   code 2:  sample = 100 + 2*64  = 228; delta = 230*64/256  = 57
    //   code 1:  sample = 228 + 57    = 285; delta = 230*57/256  = 51
    //   code 9:  sample = 285 - 7*51  = -72; delta = 614*51/256  = 122
    //   code 15: sample = -72 - 122   = -194; delta = 230*122/256 = 109
    val bytes = msAdpcmWav(rate = 8000, blockAlign = 9, samplesPerBlock = 6,
      blocks = Seq((0, 64.toShort, 100.toShort, 50.toShort,
        Array(0x21, 0x9F).map(_.toByte))))
    assert(Multimodal.decodeMsAdpcmSamples(bytes).get.toSeq ==
      Seq[Short](50, 100, 228, 285, -72, -194))
    // Feature path flows through the wav codec chain (tag dispatch).
    val f = Multimodal.decodeMsAdpcmWavFeatures(bytes).get
    assert(Multimodal.decodeFeatures("wav", bytes).toSeq == f.toSeq)
    assert(f(6) == 1.0f) // mono
    // PCM16/IMA decoders must reject tag 2 (dispatch, not retry).
    assert(Multimodal.decodeWavFeatures(bytes).isEmpty)
    assert(Multimodal.decodeImaAdpcmSamples(bytes).isEmpty)
    assert(Multimodal.decodeG711Samples(bytes).isEmpty)
  }

  test("IMA-ADPCM WAV decodes to exact hand-computed int16 samples") {
    // Nibble bytes 0x84, 0xF3 = codes [4, 8, 3, 15] (LOW nibble first).
    // From predictor=0, index=0 (step 7), the public tables give exactly:
    //   code 4: diff=7        -> 7   (index -> 2, step 9)
    //   code 8: diff=1, sign  -> 6   (index -> 1, step 8)
    //   code 3: diff=1+2+4    -> 13  (index -> 0, step 7)
    //   code 15: diff=1+3+7, sign -> 2 (index -> 8)
    // Block 2 re-seeds state from its own header: predictor=100, index=4
    // (step 11); codes [4, 8, 0, 8] from bytes 0x84, 0x80:
    //   code 4: diff=1+11     -> 112 (index -> 6, step 13)
    //   code 8: diff=1, sign  -> 111 (index -> 5, step 12)
    //   code 0: diff=1        -> 112 (index -> 4, step 11)
    //   code 8: diff=1, sign  -> 111 (index -> 3)
    val bytes = adpcmWav(rate = 8000, blockAlign = 6, samplesPerBlock = 5,
      blocks = Seq(
        (0.toShort, 0, Array(0x84.toByte, 0xF3.toByte)),
        (100.toShort, 4, Array(0x84.toByte, 0x80.toByte))))
    val samples = Multimodal.decodeImaAdpcmSamples(bytes).get
    assert(samples.toSeq == Seq[Short](0, 7, 6, 13, 2, 100, 112, 111, 112, 111))
    // Feature layout matches the PCM16 decoder's (one audio feature space).
    val f = Multimodal.decodeImaAdpcmWavFeatures(bytes).get
    assert(f.length == 8 && f(6) == 1.0f)
    val expPeak = 112 / 32768.0f
    assert(math.abs(f(3) - expPeak) < 1e-6)
    // Registry dispatch: format tag 0x11 reaches the real ADPCM decode
    // through the "wav" codec, NOT the stub fallback.
    assert(Multimodal.decodeFeatures("wav", bytes).toSeq == f.toSeq)
    assert(Multimodal.decodeFeatures("wav", bytes).toSeq !=
      Multimodal.decodeStub(bytes).toSeq)
  }

  test("IMA-ADPCM edge cases: derived samplesPerBlock, rejects, clamps") {
    // No fmt extension: samplesPerBlock derives as (blockAlign-4)*2+1 = 5.
    val derived = adpcmWav(rate = 8000, blockAlign = 6, samplesPerBlock = 5,
      blocks = Seq((0.toShort, 0, Array(0x84.toByte, 0xF3.toByte))),
      omitExtension = true)
    assert(Multimodal.decodeImaAdpcmSamples(derived).get.toSeq ==
      Seq[Short](0, 7, 6, 13, 2))
    // A PCM16 container is NOT claimed by the ADPCM decoder (tag dispatch).
    assert(Multimodal.decodeImaAdpcmSamples(
      wav(channels = 1, rate = 8000, dataBytes = 4)).isEmpty)
    // Saturated codes clamp to int16 range instead of wrapping: start at
    // the max step (index 88, step 32767) and apply code 7 (diff =
    // 32767>>3 + 32767>>2 + 32767>>1 + 0 = 28672+... > headroom) twice.
    val hot = adpcmWav(rate = 8000, blockAlign = 6, samplesPerBlock = 5,
      blocks = Seq((32000.toShort, 88, Array(0x77.toByte, 0x77.toByte))))
    val hs = Multimodal.decodeImaAdpcmSamples(hot).get
    assert(hs.forall(s => s >= -32768 && s <= 32767))
    assert(hs(1) == 32767) // clamped, not wrapped
  }

  test("PNG metadata parses from real container bytes") {
    val m = Multimodal.parseMeta(png(320, 200))
    assert(m.format == "png" && m.width == 320 && m.height == 200)
  }

  test("WAV metadata: channels, rate, duration from header") {
    val m = Multimodal.parseMeta(wav(channels = 2, rate = 8000, dataBytes = 32000))
    assert(m.format == "wav" && m.channels == 2 && m.sampleRateHz == 8000)
    assert(m.durationMs == 1000L) // 32000 bytes / (8000*2*2 B/s) = 1 s
  }

  /** A solid-color image encoded with the JDK's own writer — the decode
    * test then asserts TRUE pixel-derived features, not byte hashes. */
  private def solidImage(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("PNG pixels decode to true color features via javax.imageio") {
    val bytes = solidImage(8, 4, 0xC86432, "png") // R=200 G=100 B=50
    val f = Multimodal.decodeImageFeatures(bytes).get
    assert(math.abs(f(0) - 200 / 255.0f) < 1e-6)
    assert(math.abs(f(1) - 100 / 255.0f) < 1e-6)
    assert(math.abs(f(2) - 50 / 255.0f) < 1e-6)
    assert(f(4) < 1e-6f)                 // solid color: ~zero luma variance
    assert(math.abs(f(7) - 2.0f) < 1e-6) // aspect 8/4
    // And the dispatch uses the real decode for PNG, not the stub.
    assert(Multimodal.decodeFeatures("png", bytes).toSeq == f.toSeq)
    assert(Multimodal.decodeFeatures("png", bytes).toSeq !=
      Multimodal.decodeStub(bytes).toSeq)
  }

  test("JPEG pixels decode within lossy tolerance") {
    val f = Multimodal.decodeImageFeatures(solidImage(16, 16, 0xC86432, "jpg")).get
    assert(math.abs(f(0) - 200 / 255.0) < 0.05)
    assert(math.abs(f(1) - 100 / 255.0) < 0.05)
    assert(math.abs(f(2) - 50 / 255.0) < 0.05)
  }

  test("PCM16 WAV samples decode to true signal features") {
    // Square wave at half amplitude: rms = meanAbs = peak = 0.5.
    val base = wav(channels = 1, rate = 8000, dataBytes = 400)
    val bb = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 200) bb.putShort(44 + 2 * i, (if (i % 2 == 0) 16384 else -16384).toShort)
    val f = Multimodal.decodeWavFeatures(base).get
    assert(math.abs(f(0) - 0.5f) < 1e-4 && math.abs(f(1) - 0.5f) < 1e-4)
    assert(math.abs(f(3) - 0.5f) < 1e-4)
    assert(f(2) > 0.9f) // alternating signs: zero-cross ratio ~= 1
    assert(f(6) == 1.0f)
    // Corrupt/short containers degrade to None, not an exception.
    assert(Multimodal.decodeWavFeatures("RIFFxxxx".getBytes).isEmpty)
    // Streaming-encoder 0xFFFFFFFF placeholder size: unsigned read must
    // clamp to the actual byte count, not go negative and decode nothing.
    val placeholder = wav(channels = 1, rate = 8000, dataBytes = 400)
    val pb = java.nio.ByteBuffer.wrap(placeholder).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 200) pb.putShort(44 + 2 * i, 16384.toShort)
    pb.putInt(40, 0xFFFFFFFF)
    val pf = Multimodal.decodeWavFeatures(placeholder).get
    assert(math.abs(pf(0) - 0.5f) < 1e-4, s"placeholder-size wav decoded rms ${pf(0)}")
  }

  test("WAV with extra RIFF chunks before fmt/data still decodes correctly") {
    // LIST chunk ahead of fmt/data: canonical-offset reads would see
    // garbage; the chunk walk must find the real fmt and data payloads.
    val base = wav(channels = 1, rate = 8000, dataBytes = 400)
    val bb = java.nio.ByteBuffer.wrap(base).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 200) bb.putShort(44 + 2 * i, (if (i % 2 == 0) 16384 else -16384).toShort)
    val bos = new ByteArrayOutputStream()
    bos.write(base, 0, 12)                     // RIFF size WAVE
    bos.write("LIST".getBytes); bos.write(Array[Byte](10, 0, 0, 0))
    bos.write("INFOabcdef".getBytes)           // 10-byte payload (even, no pad)
    bos.write(base, 12, base.length - 12)      // fmt + data as-is
    val shifted = bos.toByteArray
    val m = Multimodal.parseMeta(shifted)
    assert(m.format == "wav" && m.channels == 1 && m.sampleRateHz == 8000)
    val f = Multimodal.decodeWavFeatures(shifted).get
    assert(math.abs(f(0) - 0.5f) < 1e-4, s"chunk-shifted wav decoded rms ${f(0)}")
    // A WAV missing its data chunk is None, not garbage.
    val noData = java.util.Arrays.copyOf(base, 44)
    val nb = java.nio.ByteBuffer.wrap(noData).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nb.put(36, 'j'.toByte) // corrupt the data chunk id
    assert(Multimodal.decodeWavFeatures(noData).isEmpty)
  }

  test("unknown bytes degrade to format=unknown, never throw") {
    assert(Multimodal.parseMeta("garbage".getBytes).format == "unknown")
    assert(Multimodal.parseMeta(Array.empty[Byte]).format == "unknown")
  }

  test("distributed feature extraction: per-partition map, deterministic stub") {
    val session = spark
    import session.implicits._
    val media = Seq(
      Multimodal.MediaRow(1, "image", png(4, 2)),
      Multimodal.MediaRow(2, "audio", wav(1, 16000, 16000)),
      Multimodal.MediaRow(3, "blob", "xyz".getBytes)).toDS().repartition(3)
    val features = Multimodal.extractFeatures(media).collect()
      .sortBy(_.media_id)
    assert(features.map(_.format).toSeq == Seq("png", "wav", "unknown"))
    assert(features.forall(_.features.length == 8))
    // Deterministic: same bytes, same vector, regardless of partitioning.
    val again = Multimodal.extractFeatures(media.repartition(1)).collect()
      .sortBy(_.media_id)
    assert(again.map(_.features.toSeq).toSeq == features.map(_.features.toSeq).toSeq)
  }

  test("resizeImages scales oversized images down, preserves aspect, passes others through") {
    val session = spark
    import session.implicits._
    val media = Seq(
      Multimodal.MediaRow(1, "image", solidImage(64, 32, 0xC86432, "png")),
      Multimodal.MediaRow(2, "image", solidImage(8, 8, 0xC86432, "png")),
      Multimodal.MediaRow(3, "audio", wav(1, 8000, 1000))).toDS()
    val out = Multimodal.resizeImages(media, maxDim = 16).collect().sortBy(_.media_id)
    val m1 = Multimodal.parseMeta(out(0).content)
    assert(m1.format == "png" && m1.width == 16 && m1.height == 8) // 64x32 -> 16x8
    // Pixels survive the resize: still the same solid color.
    val f = Multimodal.decodeImageFeatures(out(0).content).get
    assert(math.abs(f(0) - 200 / 255.0) < 0.02)
    // Within-bounds image and non-image blob pass through byte-identical.
    assert(out(1).content.sameElements(solidImage(8, 8, 0xC86432, "png")))
    assert(out(2).content.sameElements(wav(1, 8000, 1000)))
  }

  /** A real multi-frame GIF written with the JDK's own sequence writer:
    * four solid-color frames. */
  private def animatedGif(colors: Seq[Int], w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("GIF frame sampling decodes real frames and re-encodes each as PNG") {
    val session = spark
    import session.implicits._
    val gif = animatedGif(Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF), 6, 4)
    assert(Multimodal.parseMeta(gif).format == "gif")
    assert(Multimodal.parseMeta(gif).width == 6 && Multimodal.parseMeta(gif).height == 4)
    val frames = Multimodal.frameSample(
      Seq(Multimodal.MediaRow(5, "anim", gif)).toDS(), everyK = 2)
      .collect().sortBy(_.media_id)
    assert(frames.length == 2) // frames 0 and 2 of 4
    assert(frames.map(_.kind).toSeq == Seq("anim#frame0", "anim#frame2"))
    // Each sampled frame is a standalone PNG carrying the TRUE frame color.
    val f0 = Multimodal.decodeImageFeatures(frames(0).content).get
    val f2 = Multimodal.decodeImageFeatures(frames(1).content).get
    assert(f0(0) > 0.9 && f0(1) < 0.1 && f0(2) < 0.1) // frame 0: red
    assert(f2(2) > 0.9 && f2(0) < 0.1 && f2(1) < 0.1) // frame 2: blue
    // Non-GIF blobs still fan out via the byte-window fallback.
    val blob = Multimodal.MediaRow(7, "video", new Array[Byte](4 * 1024))
    assert(Multimodal.frameSample(Seq(blob).toDS(), everyK = 2).collect().length == 2)
  }

  test("delta-encoded GIF frames composite onto the logical screen") {
    // Frame 0: full 8x4 red. Frame 1: a 4x4 green sub-rectangle at
    // left=4 — an optimized (delta) frame. The sampled logical frame 1
    // must be the COMPOSITE (red left half, green right half), not the
    // bare 4x4 stored rectangle.
    val w = 8; val h = 4
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    def frame(fw: Int, fh: Int, rgb: Int, left: Int): javax.imageio.IIOImage = {
      val img = new java.awt.image.BufferedImage(fw, fh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until fh; x <- 0 until fw) img.setRGB(x, y, rgb)
      val ts = javax.imageio.ImageTypeSpecifier.createFromBufferedImageType(
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val md = writer.getDefaultImageMetadata(ts, writer.getDefaultWriteParam)
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = tree.getChildNodes
      for (i <- 0 until kids.getLength) {
        val n = kids.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        if (n.getNodeName == "ImageDescriptor") {
          n.setAttribute("imageLeftPosition", left.toString)
          n.setAttribute("imageTopPosition", "0")
        }
      }
      md.setFromTree("javax_imageio_gif_image_1.0", tree)
      new javax.imageio.IIOImage(img, null, md)
    }
    writer.prepareWriteSequence(null)
    writer.writeToSequence(frame(w, h, 0xFF0000, 0), null)
    writer.writeToSequence(frame(4, h, 0x00FF00, 4), null)
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray
    assert(Multimodal.parseMeta(gif).format == "gif")

    val session = spark
    import session.implicits._
    val frames = Multimodal.frameSample(
      Seq(Multimodal.MediaRow(9, "anim", gif)).toDS(), everyK = 1)
      .collect().sortBy(_.media_id)
    assert(frames.length == 2)
    // Composited frame 1 keeps the logical-screen dimensions...
    val m1 = Multimodal.parseMeta(frames(1).content)
    assert(m1.width == w && m1.height == h,
      s"frame 1 is ${m1.width}x${m1.height}, expected logical $w x $h")
    // ...and carries half red + half green pixels (means ~0.5 each).
    val f1 = Multimodal.decodeImageFeatures(frames(1).content).get
    assert(math.abs(f1(0) - 0.5f) < 0.05 && math.abs(f1(1) - 0.5f) < 0.05 && f1(2) < 0.05,
      s"composited means ${f1.take(3).toSeq}")
  }

  test("frame sampling fans one blob out into bounded frame rows") {
    val session = spark
    import session.implicits._
    val blob = Multimodal.MediaRow(7, "video", new Array[Byte](10 * 1024))
    val frames = Multimodal.frameSampleStub(Seq(blob).toDS(), everyK = 2).collect()
    assert(frames.length == 5)                      // frames 0,2,4,6,8
    assert(frames.forall(_.content.length == 1024))
    assert(frames.map(_.kind).forall(_.startsWith("video#frame")))
  }

  test("codec registry: a registered codec claims a format; unregister reverts to stub") {
    val gif = animatedGif(Seq(0xFF0000), 4, 4)
    // Registry miss ("unknown" has no built-in — every sniffable format
    // is claimed since GifCodec landed): stub fallback.
    assert(Multimodal.decodeFeatures("unknown", gif).toSeq ==
      Multimodal.decodeStub(gif).toSeq)
    object ToyCodec extends MediaCodec {
      val formats: Set[String] = Set("toyfmt")
      def decode(bytes: Array[Byte]): Option[Array[Float]] =
        Some(Array.fill(8)(bytes.length.toFloat))
    }
    Codecs.register(ToyCodec)
    try {
      assert(Codecs.forFormat("toyfmt").contains(ToyCodec))
      assert(Multimodal.decodeFeatures("toyfmt", gif).toSeq ==
        Array.fill(8)(gif.length.toFloat).toSeq)
      // A codec that FAILS to decode falls through to the stub, not null.
      object NoneCodec extends MediaCodec {
        val formats: Set[String] = Set("toyfmt")
        def decode(bytes: Array[Byte]): Option[Array[Float]] = None
      }
      Codecs.register(NoneCodec) // last registration wins
      assert(Multimodal.decodeFeatures("toyfmt", gif).toSeq ==
        Multimodal.decodeStub(gif).toSeq)
    } finally Codecs.unregister("toyfmt")
    assert(Multimodal.decodeFeatures("toyfmt", gif).toSeq ==
      Multimodal.decodeStub(gif).toSeq)
    // A deployment can OVERRIDE a built-in (last registration wins) —
    // restore the built-in afterwards, never leave the registry bare.
    object OverrideGif extends MediaCodec {
      val formats: Set[String] = Set("gif")
      def decode(bytes: Array[Byte]): Option[Array[Float]] =
        Some(Array.fill(8)(-1f))
    }
    Codecs.register(OverrideGif)
    try assert(Multimodal.decodeFeatures("gif", gif).toSeq == Seq.fill(8)(-1f))
    finally Codecs.register(GifCodec)
    // The built-in is live again: a real one-frame red GIF decodes to
    // pixel stats, not the stub.
    val back = Multimodal.decodeFeatures("gif", gif)
    assert(back(0) == 1f && back(5) == 1f, back.toSeq)
  }

  test("metadata surfaces as a SQL-queryable struct column") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, png(10, 20))).toDF("id", "content")
    val row = Multimodal.withMeta(df, "content")
      .selectExpr("meta.format", "meta.width", "meta.height").collect().head
    assert((row.getString(0), row.getInt(1), row.getInt(2)) == ("png", 10, 20))
  }
}
