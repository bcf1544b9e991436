package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.etl.{Fixtures, SmartCsv, Zips}

/** DSv2 graft-zip table: parity with the streaming reader, plus the two
  * properties that justify a TableProvider at scale — column pruning and
  * filter pushdown must be observable as SKIPPED DECOMPRESSION, not just
  * plan cosmetics. */
class ZipEntrySourceSpec extends SparkSpec {

  private def writeDir(archives: (String, Array[Byte])*): String = {
    val dir = Files.createTempDirectory("zipsrc").toString
    archives.foreach { case (name, bytes) =>
      Files.write(Paths.get(s"$dir/$name"), bytes)
    }
    dir
  }

  private def read(dir: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft-zip")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(dir)
  }

  /** A ZIP with one STORED and one deflated entry plus a UTF-8 name —
    * branches ZipOutputStream's defaults never produce together. */
  private def mixedMethodZip: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    val storedData = "stored,data\n1,2\n".getBytes("UTF-8")
    val e = new ZipEntry("stored_naïve.csv")
    e.setMethod(ZipEntry.STORED)
    e.setSize(storedData.length)
    val crc = new CRC32(); crc.update(storedData)
    e.setCrc(crc.getValue)
    zos.putNextEntry(e); zos.write(storedData); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("deflated.csv"))
    zos.write(("x,y\n" + "3,4\n" * 100).getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  test("ZipCentral parity: central-directory enumeration + random-access read equal the streaming reader") {
    for (bytes <- Seq(Fixtures.fullZip, Fixtures.minimalZip, mixedMethodZip)) {
      val streamed = Zips.entries(bytes)
      val cd = ZipCentral.centralDirectory(bytes).filterNot(_.isDirectory)
      assert(cd.map(_.name) == streamed.keys.toVector)
      cd.foreach { e =>
        assert(ZipCentral.read(bytes, e).toSeq == streamed(e.name).toSeq,
          s"content mismatch for ${e.name}")
        assert(e.size == streamed(e.name).length.toLong)
      }
    }
    // Empty archives and non-ZIPs behave like Zips.entries.
    assert(ZipCentral.centralDirectory(Fixtures.emptyZip).isEmpty)
    intercept[java.util.zip.ZipException] {
      ZipCentral.centralDirectory(Fixtures.notAZip)
    }
  }

  test("scan parity: one row per entry, content matches, stored and deflate both decode") {
    val dir = writeDir("a.zip" -> Fixtures.minimalZip, "m.zip" -> mixedMethodZip)
    val rows = read(dir).collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1)) ->
        (r.getString(3), r.getAs[Array[Byte]]("content").toSeq)).toMap
    val expA = Zips.entries(Fixtures.minimalZip)
    val expM = Zips.entries(mixedMethodZip)
    assert(rows.size == expA.size + expM.size)
    assert(rows(("a.zip", "ahrefs_keywords.csv"))._2 == expA("ahrefs_keywords.csv").toSeq)
    assert(rows(("m.zip", "stored_naïve.csv")) == (("stored", expM("stored_naïve.csv").toSeq)))
    assert(rows(("m.zip", "deflated.csv")) == (("deflate", expM("deflated.csv").toSeq)))
  }

  test("column pruning: a metadata-only query inflates NOTHING") {
    val dir = writeDir("a.zip" -> Fixtures.fullZip, "b.zip" -> Fixtures.minimalZip)
    ZipScanMetrics.reset()
    val manifest = read(dir).selectExpr("entry", "size", "compressed").collect()
    assert(manifest.length ==
      Zips.entries(Fixtures.fullZip).size + Zips.entries(Fixtures.minimalZip).size)
    assert(ZipScanMetrics.entriesInflated.get() == 0L,
      "metadata scan must not decompress any entry")
    assert(ZipScanMetrics.archivesOpened.get() == 2L)
  }

  test("filter pushdown: an entry predicate gates decompression to matching entries only") {
    val dir = writeDir("a.zip" -> Fixtures.fullZip, "b.zip" -> Fixtures.minimalZip)
    ZipScanMetrics.reset()
    val df = read(dir).filter("entry = 'ahrefs_keywords.csv'").select("archive", "content")
    val got = df.collect()
    assert(got.length == 2) // present in both archives
    assert(ZipScanMetrics.entriesInflated.get() == 2L,
      "only the two matching entries may be inflated")
    // The predicate is pushed into the scan, not applied post-scan.
    val scanDesc = df.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("graft-zip"), scanDesc)

    ZipScanMetrics.reset()
    assert(read(dir).filter("entry LIKE '%.json' AND size > 0").select("content")
      .collect().length == 2) // two lighthouse JSONs in fullZip
    assert(ZipScanMetrics.entriesInflated.get() == 2L)
  }

  test("nested=true expands inner archives; corrupt inner ZIPs stay as blob rows") {
    val dir = writeDir("full.zip" -> Fixtures.fullZip,
                       "partial.zip" -> Fixtures.nestedPartialZip)
    val rows = read(dir, Map("nested" -> "true"))
      .selectExpr("archive", "entry", "nested").collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1), r.getBoolean(2)))
    val innerNames = Zips.entries(Zips.entries(Fixtures.fullZip)("ahrefs_site_audit.zip")).keys
    assert(innerNames.nonEmpty)
    innerNames.foreach { n =>
      assert(rows.contains(("full.zip", s"ahrefs_site_audit.zip::$n", true)))
    }
    // The expanded inner archive's blob row is replaced by its entries...
    assert(!rows.exists(r => r._1 == "full.zip" && r._2 == "ahrefs_site_audit.zip"))
    // ...but a corrupt inner ZIP keeps its blob row (AuditEtl `partial` discipline).
    assert(rows.contains(("partial.zip", "ahrefs_site_audit.zip", false)))
    // Inner entry CONTENT round-trips through the nested read path.
    val innerContent = read(dir, Map("nested" -> "true"))
      .filter("entry LIKE 'ahrefs_site_audit.zip::%'")
      .collect().map(r => r.getString(1).split("::", 2)(1) -> r.getAs[Array[Byte]]("content").toSeq)
      .toMap
    val expInner = Zips.entries(Zips.entries(Fixtures.fullZip)("ahrefs_site_audit.zip"))
    expInner.foreach { case (n, b) => assert(innerContent(n) == b.toSeq) }
  }

  test("listing: glob excludes non-archives, recursive descends, single-file load works") {
    val dir = writeDir("a.zip" -> Fixtures.minimalZip)
    Files.write(Paths.get(s"$dir/readme.txt"), "not an archive".getBytes)
    Files.createDirectories(Paths.get(s"$dir/sub"))
    Files.write(Paths.get(s"$dir/sub/b.zip"), Fixtures.minimalZip)
    assert(read(dir).select("archive").distinct().count() == 2)
    assert(read(dir, Map("recursive" -> "false")).select("archive").distinct().count() == 1)
    assert(read(s"$dir/a.zip").count() == Zips.entries(Fixtures.minimalZip).size.toLong)
  }

  test("corrupt stored entry (size != compressed size) fails loudly, never zero-pads") {
    val bytes = mixedMethodZip
    val stored = ZipCentral.centralDirectory(bytes).find(_.method == 0).get
    val corrupt = stored.copy(size = stored.size + 4)
    val ex = intercept[java.util.zip.ZipException] { ZipCentral.read(bytes, corrupt) }
    assert(ex.getMessage.contains("corrupt record"))
    // The honest record still reads.
    assert(ZipCentral.read(bytes, stored).nonEmpty)
  }

  test("an archive past the 2 GiB single-buffer limit fails with the real reason, before any I/O") {
    val reader = new ZipPartitionReader(
      ZipArchivePartition("hdfs://nowhere/huge.zip", 3L << 30),
      new org.apache.spark.util.SerializableConfiguration(
        new org.apache.hadoop.conf.Configuration()),
      Array("entry"), nested = false, Array.empty)
    // The guard must fire on the recorded length alone — the bogus
    // hdfs:// URI proves no filesystem is ever contacted.
    val ex = intercept[java.util.zip.ZipException] { reader.next() }
    assert(ex.getMessage.contains("2 GiB"))
  }

  test("S5 scale path: SmartCsv over graft-zip content equals the driver-side parse") {
    val dir = writeDir("a.zip" -> Fixtures.fullZip, "b.zip" -> Fixtures.minimalZip)
    import spark.implicits._
    // The distributed shape: pushdown selects the one CSV of interest per
    // archive; SmartCsv (UTF-16LE sniff included) runs in executors.
    val parsed = read(dir).filter("entry = 'ahrefs_keywords.csv'")
      .select("archive", "content")
      .as[(String, Array[Byte])]
      .map { case (archive, bytes) => archive -> SmartCsv.parse(bytes).length }
      .collect().toMap
    val exp = SmartCsv.parse(Zips.entries(Fixtures.fullZip)("ahrefs_keywords.csv")).length
    assert(parsed.values.toSeq == Seq(exp, exp))
  }
}
