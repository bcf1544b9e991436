package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipException, ZipOutputStream}

/** Edge-of-format guards in ZipCentral's directory reader:
  *
  *  - split/spanned archives (EOCD disk fields, ZIP64 locator/record disk
  *    fields, per-entry disk-number-start) are rejected UP FRONT with a
  *    "split archives unsupported" ZipException — not a downstream
  *    LocalSig mismatch on a foreign-disk entry;
  *  - a COINCIDENTAL ZIP64-locator signature in a valid non-ZIP64
  *    archive's trailing bytes (the locator is detected by signature
  *    alone) falls back to the plain EOCD fields instead of hard-failing,
  *    whenever those fields are unsaturated;
  *  - a locator whose record offset runs past the archive end fails as a
  *    clean ZipException when ZIP64 is genuinely required (saturated
  *    EOCD), never as an EOFException from an overrun positioned read.
  */
class ZipCentralGuardSpec extends AnyFunSuite {

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def put16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }

  /** A small two-entry deflate archive from the JDK writer. */
  private def sampleZip: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    Seq("a.csv" -> "x,y\n1,2\n", "b.csv" -> "x,y\n3,4\n").foreach {
      case (name, text) =>
        zos.putNextEntry(new ZipEntry(name))
        zos.write(text.getBytes("UTF-8"))
        zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Offset of the EOCD record (last 0x06054b50 signature). */
  private def eocdAt(bytes: Array[Byte]): Int =
    (bytes.length - 22 to 0 by -1).find(i => u32(bytes, i) == 0x06054b50L).get

  test("EOCD disk fields != 0 reject with 'split archives unsupported'") {
    val bytes = sampleZip
    val e = eocdAt(bytes)
    put16(bytes, e + 4, 1) // number of this disk
    put16(bytes, e + 6, 1) // disk where the CD starts
    val ex = intercept[ZipException] { ZipCentral.centralDirectory(bytes) }
    assert(ex.getMessage.contains("split archives unsupported"), ex.getMessage)
  }

  test("a central-directory entry on another disk rejects with the real reason") {
    val bytes = sampleZip
    val e = eocdAt(bytes)
    val cdOff = u32(bytes, e + 16).toInt
    assert(u32(bytes, cdOff) == 0x02014b50L) // first CD record
    put16(bytes, cdOff + 34, 2) // disk number start
    val ex = intercept[ZipException] { ZipCentral.centralDirectory(bytes) }
    assert(ex.getMessage.contains("split archives unsupported"), ex.getMessage)
    assert(ex.getMessage.contains("disk 2"), ex.getMessage)
  }

  /** `bytes` with 20 extra bytes spliced in directly before the EOCD —
    * the position the ZIP64 locator is detected at, by signature alone. */
  private def withFakeLocator(bytes: Array[Byte], rec64At: Long): Array[Byte] = {
    val e = eocdAt(bytes)
    val loc = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    loc.putInt(0x07064b50).putInt(0).putLong(rec64At).putInt(1)
    bytes.take(e) ++ loc.array() ++ bytes.drop(e)
  }

  test("a coincidental ZIP64-locator signature before an unsaturated EOCD falls back cleanly") {
    val bytes = sampleZip
    // rec64At points INSIDE the archive but at bytes that are not a ZIP64
    // EOCD record — exactly the coincidental-signature shape.
    val spliced = withFakeLocator(bytes, rec64At = 4L)
    val entries = ZipCentral.centralDirectory(spliced)
    assert(entries.map(_.name) == Vector("a.csv", "b.csv"))
    // And the entries still inflate: the fallback preserved the CD offsets.
    assert(new String(ZipCentral.read(spliced, entries.head), "UTF-8") == "x,y\n1,2\n")
  }

  test("a coincidental locator pointing past the archive end also falls back") {
    val bytes = sampleZip
    val spliced = withFakeLocator(bytes, rec64At = bytes.length + 1000L)
    assert(ZipCentral.centralDirectory(spliced).map(_.name) ==
      Vector("a.csv", "b.csv"))
  }

  test("a required ZIP64 record past the archive end is a clean ZipException, not EOF") {
    // Hand-built tail: locator whose record offset overruns, before an
    // EOCD that IS saturated (total = 0xffff) — ZIP64 genuinely required,
    // so no fallback is allowed and the failure must be a ZipException
    // naming the offset, not readFully's EOFException.
    val loc = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    loc.putInt(0x07064b50).putInt(0).putLong(9999999L).putInt(1)
    val eocd = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    eocd.putInt(0x06054b50).putShort(0).putShort(0)
      .putShort(-1).putShort(-1) // entry counts saturated (0xffff)
      .putInt(100).putInt(0).putShort(0)
    val bytes = loc.array() ++ eocd.array()
    val ex = intercept[ZipException] { ZipCentral.centralDirectory(bytes) }
    assert(ex.getMessage.contains("outside archive"), ex.getMessage)
  }

  test("ZIP64 EOCD record disk fields != 0 reject as split archives") {
    // Minimal ZIP64 chain: record (with nonzero disk fields) + locator +
    // saturated EOCD. Parsing must fail on the DISK fields, before any CD
    // read is attempted.
    val rec = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    rec.putInt(0x06064b50).putLong(44).putShort(45).putShort(45)
      .putInt(1).putInt(1)       // number of this disk / CD start disk = 1
      .putLong(2).putLong(2).putLong(92).putLong(0)
    val loc = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    loc.putInt(0x07064b50).putInt(0).putLong(0L).putInt(1)
    val eocd = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    eocd.putInt(0x06054b50).putShort(0).putShort(0)
      .putShort(-1).putShort(-1).putInt(100).putInt(0).putShort(0)
    // File starts with the ZIP64 record's own PK\x06\x06 — passes magic.
    val bytes = rec.array() ++ loc.array() ++ eocd.array()
    val ex = intercept[ZipException] { ZipCentral.centralDirectory(bytes) }
    assert(ex.getMessage.contains("split archives unsupported"), ex.getMessage)
  }

  test("plain archives still parse after the guards (no false positives)") {
    val bytes = sampleZip
    val entries = ZipCentral.centralDirectory(bytes)
    assert(entries.map(_.name) == Vector("a.csv", "b.csv"))
    assert(u16(bytes, eocdAt(bytes) + 4) == 0) // the JDK writer is single-disk
  }
}
