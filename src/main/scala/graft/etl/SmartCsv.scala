package graft.etl

import java.nio.charset.StandardCharsets
import scala.collection.immutable.VectorMap

/** Encoding-sniffing, delimiter-retrying CSV reader (reference parity:
  * /root/reference/src/etl.js:9-42 `parseCsvSmart`).
  *
  * Strategy, exactly as the reference orders it:
  *   1. sniff UTF-16: a UTF-16 BOM (FFFE/FEFF) or >10% NUL bytes in the
  *      first 4096 bytes;
  *   2. if not sniffed UTF-16: try UTF-8 with delimiter auto-detection —
  *      accept unless "bad" (>5 row errors, or zero data rows);
  *   3. decode UTF-16LE and try TAB;
  *   4. fall back to UTF-16LE + COMMA (returned even if bad).
  *
  * Rows are header-keyed maps. A row shorter than the header yields NO key
  * for the missing columns (mirrors JS undefined fields — see JsRow); a row
  * with a mismatched field count counts as one error (mirrors PapaParse's
  * TooFewFields/TooManyFields).
  */
object SmartCsv {

  final case class Parsed(rows: Vector[Map[String, String]], errors: Int) {
    /** `(res.errors?.length > 5) || (!res.data || res.data.length === 0)` */
    def isBad: Boolean = errors > 5 || rows.isEmpty
  }

  def looksUtf16(bytes: Array[Byte]): Boolean = {
    val bom = bytes.length >= 2 &&
      ((bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte) ||
       (bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte))
    val probeLen = math.min(bytes.length, 4096)
    var nulls = 0
    var i = 0
    while (i < probeLen) { if (bytes(i) == 0) nulls += 1; i += 1 }
    bom || (probeLen > 0 && nulls.toDouble / probeLen > 0.10)
  }

  /** Full smart parse: returns the row maps (empty when everything failed,
    * as the reference returns `[]`). */
  def parse(bytes: Array[Byte]): Vector[Map[String, String]] = {
    if (!looksUtf16(bytes)) {
      val utf8 = parseText(new String(bytes, StandardCharsets.UTF_8), None)
      if (!utf8.isBad) return utf8.rows
    }
    val text16 = new String(bytes, StandardCharsets.UTF_16LE)
    val tab = parseText(text16, Some('\t'))
    if (!tab.isBad) return tab.rows
    parseText(text16, Some(',')).rows
  }

  /** Parse decoded text; `delimiter=None` auto-detects (PapaParse-style:
    * the candidate delimiter most frequent in the first non-empty line). */
  def parseText(text: String, delimiter: Option[Char]): Parsed = {
    val t = if (text.startsWith("\uFEFF")) text.substring(1) else text
    val delim = delimiter.getOrElse(guessDelimiter(t))
    val records = splitRecords(t, delim)
    if (records.isEmpty) return Parsed(Vector.empty, 0)
    val header = records.head
    var errors = 0
    // VectorMap preserves header order: pickCol's shadowing rules and the
    // reference's Object.keys(rows[0]) iteration both depend on it.
    val rows = records.tail.map { fields =>
      if (fields.length != header.length) errors += 1
      header.zip(fields).to(VectorMap)
    }
    Parsed(rows, errors)
  }

  private val DelimCandidates = Seq(',', '\t', '|', ';')

  def guessDelimiter(text: String): Char = {
    val firstLine = text.linesIterator.find(_.nonEmpty).getOrElse("")
    DelimCandidates.maxBy(d => firstLine.count(_ == d))
  }

  /** RFC-4180-ish record split: quoted fields (with "" escapes) may contain
    * delimiters and newlines; a trailing final newline does not produce an
    * empty record (PapaParse behavior). */
  private def splitRecords(text: String, delim: Char): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    var record = Vector.empty[String]
    val field = new StringBuilder
    var inQuotes = false
    var i = 0
    def endField(): Unit = { record = record :+ field.toString; field.clear() }
    def endRecord(): Unit = { endField(); out += record; record = Vector.empty }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field += '"'; i += 1 }
          else inQuotes = false
        } else field += c
      } else c match {
        case '"' => inQuotes = true
        case `delim` => endField()
        case '\r' =>
          if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
          endRecord()
        case '\n' => endRecord()
        case other => field += other
      }
      i += 1
    }
    // Final record unless the text ended with a record terminator.
    if (field.nonEmpty || record.nonEmpty) endRecord()
    out.result().filterNot(r => r.length == 1 && r.head.isEmpty)
  }
}
