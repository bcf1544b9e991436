package graft.sources

import java.util.zip.{DataFormatException, Inflater, ZipException}

/** Random-access ZIP reading via the central directory (PKWARE APPNOTE.TXT,
  * the public ZIP format spec; same archives `etl.Zips` streams).
  *
  * `etl.Zips.entries` streams the whole archive and inflates EVERY entry —
  * the right shape for the audit kernel, which consumes every file. The
  * DSv2 scan path (`ZipEntrySource`) needs the opposite: list entry
  * metadata WITHOUT inflating anything (column-pruned scans), and inflate
  * ONLY the entries a pushed-down predicate selects. The central directory
  * at the archive tail carries name/sizes/method/offset for every entry,
  * so metadata-only scans cost zero decompression and a one-entry lookup
  * inflates exactly one entry.
  *
  * Scope: single-disk, non-ZIP64 archives (audit ZIPs are bounded, one per
  * client run — reference /root/reference/src/etl.js:97-110 buffers whole
  * archives on the same assumption). ZIP64 markers throw a clear error
  * rather than mis-reading.
  */
object ZipCentral {

  /** One central-directory row. `method`: 0=stored, 8=deflate. */
  final case class Entry(name: String, method: Int, compressedSize: Long,
                         size: Long, localHeaderOffset: Long, crc32: Long) {
    def isDirectory: Boolean = name.endsWith("/")
  }

  private val EocdSig = 0x06054b50
  private val CdSig = 0x02014b50
  private val LocalSig = 0x04034b50

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Entries in central-directory order (== ZipInputStream order for
    * archives written front-to-back, which is every writer in practice). */
  def centralDirectory(bytes: Array[Byte]): Vector[Entry] = {
    if (!graft.etl.Zips.isZip(bytes))
      throw new ZipException("not a zip archive (bad magic)")
    // EOCD: fixed 22 bytes + comment (max 65535); scan back for the sig.
    val tailStart = math.max(0, bytes.length - 22 - 65535)
    var eocd = -1
    var i = bytes.length - 22
    while (i >= tailStart && eocd < 0) {
      if (u32(bytes, i) == EocdSig) eocd = i
      i -= 1
    }
    if (eocd < 0) throw new ZipException("no end-of-central-directory record")
    val total = u16(bytes, eocd + 10)
    val cdOffset = u32(bytes, eocd + 16)
    if (total == 0xffff || cdOffset == 0xffffffffL)
      throw new ZipException("ZIP64 archives not supported by ZipCentral")
    val out = Vector.newBuilder[Entry]
    var p = cdOffset.toInt
    var n = 0
    while (n < total) {
      if (p + 46 > bytes.length || u32(bytes, p) != CdSig)
        throw new ZipException(s"bad central-directory record at $p")
      val method = u16(bytes, p + 10)
      val crc = u32(bytes, p + 16)
      val csize = u32(bytes, p + 20)
      val usize = u32(bytes, p + 24)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val offset = u32(bytes, p + 42)
      if (csize == 0xffffffffL || usize == 0xffffffffL || offset == 0xffffffffL)
        throw new ZipException("ZIP64 entry not supported by ZipCentral")
      val name = new String(bytes, p + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8)
      out += Entry(name, method, csize, usize, offset, crc)
      p += 46 + nameLen + extraLen + commentLen
      n += 1
    }
    out.result()
  }

  /** Inflate ONE entry by its central-directory row. The local header's
    * own name/extra lengths position the data (they can differ from the
    * central record's); sizes come from the central record because a
    * streamed local header (flag bit 3) stores zeros there. */
  def read(bytes: Array[Byte], e: Entry): Array[Byte] = {
    val p = e.localHeaderOffset.toInt
    if (p + 30 > bytes.length || u32(bytes, p) != LocalSig)
      throw new ZipException(s"bad local header for ${e.name} at $p")
    val nameLen = u16(bytes, p + 26)
    val extraLen = u16(bytes, p + 28)
    val dataStart = p + 30 + nameLen + extraLen
    if (dataStart + e.compressedSize > bytes.length)
      throw new ZipException(s"truncated entry data for ${e.name}")
    e.method match {
      case 0 =>
        // A stored entry's two central-directory sizes must agree; on a
        // corrupt record copyOfRange would silently zero-pad (or clip) to
        // the claimed uncompressed size instead of failing.
        if (e.size != e.compressedSize)
          throw new ZipException(s"stored entry ${e.name} has size ${e.size}" +
            s" != compressed size ${e.compressedSize} (corrupt record)")
        java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + e.size.toInt)
      case 8 =>
        val inf = new Inflater(true)
        try {
          inf.setInput(bytes, dataStart, e.compressedSize.toInt)
          val out = new Array[Byte](e.size.toInt)
          var written = 0
          while (written < out.length && !inf.finished()) {
            val k = inf.inflate(out, written, out.length - written)
            if (k == 0 && inf.needsInput())
              throw new ZipException(s"truncated deflate stream for ${e.name}")
            written += k
          }
          if (written != out.length)
            throw new ZipException(s"short inflate for ${e.name}: $written/${out.length}")
          out
        } catch {
          case d: DataFormatException => throw new ZipException(s"bad deflate data for ${e.name}: ${d.getMessage}")
        } finally inf.end()
      case m => throw new ZipException(s"unsupported compression method $m for ${e.name}")
    }
  }
}
