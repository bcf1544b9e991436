package graft.multimodal

/** Hand-rolled baseline-JPEG decoder — no `javax.imageio` (the round-18
  * GIF incident proved JDK image readers can be silently wrong, and the
  * JDK JPEG plugin is an opaque libjpeg wrapper; decoding the public wire
  * format ourselves is the same discipline as the BMP/QOI/GIF codecs).
  * ITU-T T.81 (the public JPEG spec): marker walk → DQT/DHT/SOF0/DRI/SOS
  * → Huffman-coded MCU scan (byte stuffing, restart markers, per-
  * component DC prediction) → dequant → inverse zigzag → exact separable
  * double-precision IDCT → box chroma upsample → JFIF YCbCr→RGB.
  *
  * Profile gate: baseline/extended-sequential Huffman, 8-bit, 1 or 3
  * components (SOF0/SOF1). Progressive (SOF2), arithmetic coding,
  * hierarchical, 12-bit and CMYK streams return None — they fall to the
  * byte-hash stub rather than risk a wrong raster.
  *
  * Determinism note: the IDCT here is the exact cosine-basis transform in
  * doubles, not libjpeg's scaled-integer AAN — decoded pixels can differ
  * from the JDK's by ±1 LSB on non-flat blocks (JpegSpec pins the bound).
  * On the flat-field gate fixtures every block is DC-only, so the decode
  * error is the ENCODER's DC quantization alone (≤3 LSB after the ×1.77
  * chroma→RGB gain — JpegSpec measures it across the full generator color
  * space) and the q214 envelope tightens to ±0.014 mean / 0.005 std from
  * round-18's ±0.02/0.02.
  */
object Jpeg {

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the T.81 MINCODE/MAXCODE/VALPTR form. */
  private final class HuffTable(counts: Array[Int], val values: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * stuffing removal; stops (returns -1 bits) at any non-RST marker. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var atMarker = false
    /** The restart marker index (0-7) just consumed, or -1. */
    def readRst(): Int = {
      // Byte-aligned by contract (caller discards bits first).
      if (pos + 1 < bytes.length && (bytes(pos) & 0xFF) == 0xFF) {
        val m = bytes(pos + 1) & 0xFF
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; return m - 0xD0 }
      }
      -1
    }
    def align(): Unit = { acc = 0; nBits = 0 }
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= bytes.length) { atMarker = true; return -1 }
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) { atMarker = true; return -1 }
          val b2 = bytes(pos) & 0xFF
          if (b2 == 0x00) pos += 1          // stuffed FF
          else { pos -= 1; atMarker = true; return -1 } // real marker
          b = 0xFF
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val b = bit(); if (b < 0) return -1; v = (v << 1) | b; i += 1 }
      v
    }
  }

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.bit()
    if (code < 0) return -1
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
        return t.values(t.valPtr(l) + code - t.minCode(l)) & 0xFF
      val b = br.bit()
      if (b < 0) return -1
      code = (code << 1) | b
      l += 1
    }
    -1
  }

  /** T.81 F.2.2.1 EXTEND: an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Exact separable IDCT (T.81 A.3.3 definition, doubles) + level shift;
    * output clamped to 0..255. Basis is precomputed once per JVM. */
  private val cosBasis: Array[Double] = {
    val b = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        b(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
        u += 1
      }
      x += 1
    }
    b
  }

  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {       // rows: 1-D IDCT over u for each v
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += cosBasis(x * 8 + u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {       // columns: 1-D IDCT over v
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += cosBasis(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        val p = math.round(s / 2.0 + 128.0).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  private final case class Comp(id: Int, h: Int, v: Int, qId: Int)

  /** Decode to (width, height, row-major ARGB). None for any non-baseline
    * profile or corrupt stream — never throws. */
  def decodeRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    try decodeRaster0(bytes)
    catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeRaster0(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return None
    var pos = 2
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var restartInterval = 0

    def u16(o: Int): Int = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)

    while (pos + 3 < bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      val marker = bytes(pos + 1) & 0xFF
      pos += 2
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
        // no segment body
      } else if (marker == 0xD9) {
        return None                              // EOI before any scan
      } else {
        val len = u16(pos)
        if (len < 2 || pos + len > bytes.length) return None
        val end = pos + len
        marker match {
          case 0xDB =>                           // DQT
            var p = pos + 2
            while (p < end) {
              val pq = (bytes(p) >> 4) & 0xF
              val tq = bytes(p) & 0xF
              if (tq > 3 || pq > 1) return None
              p += 1
              if (p + (if (pq == 0) 64 else 128) > end) return None
              val tbl = new Array[Int](64)
              var i = 0
              while (i < 64) {
                tbl(i) = if (pq == 0) bytes(p + i) & 0xFF
                         else u16(p + 2 * i)
                i += 1
              }
              p += (if (pq == 0) 64 else 128)
              qt(tq) = tbl
            }
          case 0xC4 =>                           // DHT
            var p = pos + 2
            while (p < end) {
              val tc = (bytes(p) >> 4) & 0xF
              val th = bytes(p) & 0xF
              if (tc > 1 || th > 3) return None
              p += 1
              val counts = new Array[Int](16)
              var total = 0
              var i = 0
              while (i < 16) { counts(i) = bytes(p + i) & 0xFF; total += counts(i); i += 1 }
              p += 16
              if (p + total > end) return None
              val values = java.util.Arrays.copyOfRange(bytes, p, p + total)
              p += total
              val t = new HuffTable(counts, values)
              if (tc == 0) dcT(th) = t else acT(th) = t
            }
          case 0xC0 | 0xC1 =>                    // SOF0/SOF1: baseline
            if ((bytes(pos + 2) & 0xFF) != 8) return None
            h = u16(pos + 3); w = u16(pos + 5)
            val nc = bytes(pos + 7) & 0xFF
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h > 64L * 1024 * 1024) return None
            comps = Array.tabulate(nc) { i =>
              val o = pos + 8 + 3 * i
              val c = Comp(bytes(o) & 0xFF, (bytes(o + 1) >> 4) & 0xF,
                bytes(o + 1) & 0xF, bytes(o + 2) & 0xFF)
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.qId > 3) return None
              c
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return None // progressive/arithmetic/hierarchical → stub
          case 0xDD =>                           // DRI
            restartInterval = u16(pos + 2)
          case 0xDA =>                           // SOS → entropy decode
            if (comps == null) return None
            val ns = bytes(pos + 2) & 0xFF
            if (ns != comps.length) return None
            val scanSel = new Array[(Int, Int)](comps.length) // (dcId, acId)
            var i = 0
            while (i < ns) {
              val cid = bytes(pos + 3 + 2 * i) & 0xFF
              val tt = bytes(pos + 4 + 2 * i) & 0xFF
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              scanSel(ci) = ((tt >> 4) & 0xF, tt & 0xF)
              i += 1
            }
            return decodeScan(bytes, end, w, h, comps, scanSel, qt, dcT, acT,
              restartInterval)
          case _ => ()                           // APPn / COM / unknown: skip
        }
        pos = end
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, w: Int, h: Int,
                         comps: Array[Comp], scanSel: Array[(Int, Int)],
                         qt: Array[Array[Int]], dcT: Array[HuffTable],
                         acT: Array[HuffTable],
                         restartInterval: Int): Option[(Int, Int, Array[Int])] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val nc = comps.length
    // Per-component planes sized to the padded MCU grid.
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planes = comps.zipWithIndex.map { case (c, i) =>
      new Array[Int](planeW(i) * mcusY * c.v * 8)
    }
    for (i <- 0 until nc) {
      if (qt(comps(i).qId) == null) return None
      if (dcT(scanSel(i)._1) == null || acT(scanSel(i)._2) == null) return None
    }
    val br = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.align()
        if (br.readRst() < 0) return None
        java.util.Arrays.fill(dcPred, 0)
        br.atMarker = false
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < nc) {
        val c = comps(ci)
        val q = qt(c.qId)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // DC
            val s = decodeHuff(br, dcT(scanSel(ci)._1))
            if (s < 0 || s > 15) return None
            val diff = if (s == 0) 0 else {
              val v = br.bits(s); if (v < 0) return None; extend(v, s)
            }
            dcPred(ci) += diff
            java.util.Arrays.fill(coef, 0)
            coef(0) = dcPred(ci) * q(0)
            // AC
            var k = 1
            var done = false
            while (!done && k < 64) {
              val rs = decodeHuff(br, acT(scanSel(ci)._2))
              if (rs < 0) return None
              val r = rs >> 4; val sz = rs & 0xF
              if (sz == 0) {
                if (r == 15) k += 16 else done = true   // ZRL / EOB
              } else {
                k += r
                if (k > 63) return None
                val v = br.bits(sz); if (v < 0) return None
                coef(Zigzag(k)) = extend(v, sz) * q(k)
                k += 1
              }
            }
            idctBlock(coef, px)
            // Place into the component plane.
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              System.arraycopy(px, yy * 8, planes(ci), (oy + yy) * planeW(ci) + ox, 8)
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // Compose ARGB with box chroma upsampling (x·h_c/maxH, y·v_c/maxV).
    val argb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var r = 0; var g = 0; var b = 0
        if (nc == 1) {
          val yv = planes(0)((y * comps(0).v / maxV) * planeW(0) + x * comps(0).h / maxH)
          r = yv; g = yv; b = yv
        } else {
          val yv = planes(0)((y * comps(0).v / maxV) * planeW(0) + x * comps(0).h / maxH)
          val cb = planes(1)((y * comps(1).v / maxV) * planeW(1) + x * comps(1).h / maxH)
          val cr = planes(2)((y * comps(2).v / maxV) * planeW(2) + x * comps(2).h / maxH)
          // JFIF / CCIR 601 full-range conversion.
          r = math.round(yv + 1.402 * (cr - 128)).toInt
          g = math.round(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)).toInt
          b = math.round(yv + 1.772 * (cb - 128)).toInt
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (b < 0) b = 0 else if (b > 255) b = 255
        }
        argb(y * w + x) = 0xFF000000 | (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Some((w, h, argb))
  }

  /** 8-dim feature vector via the shared ARGB stat fold. */
  def decodeFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    decodeRaster(bytes).map { case (w, h, argb) =>
      Multimodal.rgbStats(argb, w, h)
    }
}
