package graft.etl

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** In-memory audit-ZIP fixtures per FIXTURES.md §A: every encoding branch
  * of SmartCsv, every pickCol header variant, nested ZIP, Lighthouse JSONs,
  * placeholder tables. */
object Fixtures {

  def zip(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(data)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** UTF-16LE with BOM — the canonical Ahrefs export encoding. */
  def utf16le(s: String): Array[Byte] =
    ("\uFEFF" + s).getBytes(StandardCharsets.UTF_16LE)

  /** UTF-16LE without BOM — exercises the NUL-density sniff. */
  def utf16leNoBom(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_16LE)

  // --- canonical fixture entries ---

  /** NBSP in "Current position" header exercises pickCol normalization. */
  val ahrefsKeywords: Array[Byte] = utf16le(
    "Keyword\tCurrent Position\tVolume\n" +
    "plumber london\t1\t900\n" +
    "boiler repair\t4\t600\n" +
    "heating\t12\t400\n" +
    "emergency plumber\t105\t150\n" +
    "drains\tjunk\t80\n" +
    "pipes\t0\t70\n" +
    "taps\t-2\t60\n")

  val ahrefsTopPages: Array[Byte] = utf8(
    "Current URL,Traffic\n" +
    "https://ex.com/,100\n" +
    "https://ex.com/a,50\n" +
    "https://ex.com/b,25\n" +
    "https://ex.com/a,20\n" +
    "https://ex.com/c,10\n")

  val ahrefsBacklinks: Array[Byte] = utf8(
    "Referring domain,Domain Rating\n" +
    "one.com,10\n" +
    "two.com,20\n" +
    "three.com,junk\n" +
    "four.com,30\n")

  val innerSiteAudit: Array[Byte] = zip(
    "Error-4XX_page.csv" -> utf8("URL,Code\n/a,404\n/b,404\n/c,410\n"),
    "Warning-indexable-Content_thin.csv" -> utf8("URL,Words\n/t1,90\n/t2,80\n"))

  val sfInternalAll: Array[Byte] = utf8(
    "Address,Status Code\n" +
    "/,200\n/old,301\n/gone,404\n/dead,410\n/boom,500\n/odd,abc\n")

  val sfStructuredData: Array[Byte] = utf8(
    "Address,Errors,Warnings,Total Types,Unique Types\n/,0,1,2,2\n")

  val sfDuplicates: Array[Byte] = utf8("Address,Duplicate\n/x,/y\n/y,/x\n")

  val lighthouseHome: Array[Byte] = utf8(
    """{"categories":{"performance":{"score":0.9}},
      |"audits":{"largest-contentful-paint":{"numericValue":2000},
      |"cumulative-layout-shift":{"numericValue":0.05},
      |"interactive":{"numericValue":150},
      |"server-response-time":{"numericValue":300}}}""".stripMargin)

  val lighthouseService: Array[Byte] = utf8(
    """{"categories":{"performance":{"score":0.6}},
      |"audits":{"largest-contentful-paint":{"numericValue":3000},
      |"cumulative-layout-shift":{"numericValue":0.2},
      |"interactive":{"numericValue":250},
      |"server-response-time":{"numericValue":700}}}""".stripMargin)

  val brightlocalRanks: Array[Byte] = utf8(
    "Keyword,Position\nk1,1\nk2,2\nk3,7\nk4,15\nk5,0\nk6,na\n")

  val brightlocalCitations: Array[Byte] = utf8(
    "Site,Status,General Status,Citation Link\n" +
    "yelp,Live,,https://yelp.com/biz\n" +
    "bing,,,\n" +
    "yell,dead,,\n" +
    "foursquare,,OK,\n")

  val brightlocalReviewsPlaceholder: Array[Byte] = utf8(
    "status,message\nerror,login needed\n")

  val brightlocalGbpInsights: Array[Byte] = utf8(
    "Reviews,Star Rating,Photos\n120,4.6,22\n118,4.5,25\n")

  val gbpCategories: Array[Byte] = utf8(
    "category_type,category_name\n" +
    "primary,Plumber\nsecondary,Heating contractor\nsecondary,Drainage service\nother,Junk\n")

  val gbpPhotos: Array[Byte] = utf8(
    "photo_type,count\ninterior,5\nTotal,37\n")

  val gscQueries: Array[Byte] = utf8(
    "query,clicks,impressions\nplumber,10,100\nboiler,5,50\n")

  val ga4PagesPlaceholder: Array[Byte] = utf8(
    "status,message\n403,access denied\n")

  /** Scenario 1: the full happy-path ZIP. */
  def fullZip: Array[Byte] = zip(
    "ahrefs_keywords.csv" -> ahrefsKeywords,
    "ahrefs_top_pages.csv" -> ahrefsTopPages,
    "ahrefs_backlinks.csv" -> ahrefsBacklinks,
    "ahrefs_site_audit.zip" -> innerSiteAudit,
    "sf_internal_all.csv" -> sfInternalAll,
    "sf_structured_data.csv" -> sfStructuredData,
    "sf_duplicates.csv" -> sfDuplicates,
    "lighthouse_home.json" -> lighthouseHome,
    "lighthouse_service.json" -> lighthouseService,
    "brightlocal_ranks.csv" -> brightlocalRanks,
    "brightlocal_citations.csv" -> brightlocalCitations,
    "brightlocal_reviews.csv" -> brightlocalReviewsPlaceholder,
    "brightlocal_gbp_insights.csv" -> brightlocalGbpInsights,
    "gbp_categories.csv" -> gbpCategories,
    "gbp_photos.csv" -> gbpPhotos,
    "gsc_queries_28d.csv" -> gscQueries,
    "ga4_pages.csv" -> ga4PagesPlaceholder)

  /** Scenario 2: minimal ZIP — keywords only (SURVEY §7.2 slice). */
  def minimalZip: Array[Byte] = zip("ahrefs_keywords.csv" -> ahrefsKeywords)

  /** Scenario 3: valid ZIP with no entries at all. */
  def emptyZip: Array[Byte] = zip()

  /** Scenario 4: not a ZIP. */
  def notAZip: Array[Byte] = utf8("HELLO THIS IS NOT A ZIP")

  /** Scenario 5: nested-zip PARTIAL path — the outer archive is valid but
    * its ahrefs_site_audit.zip entry is garbage, so the kernel must keep
    * the audit (ok) while marking that one manifest entry
    * status=partial with the failure note (etl.js:172-176 semantics). */
  def nestedPartialZip: Array[Byte] = zip(
    "ahrefs_keywords.csv" -> ahrefsKeywords,
    "ahrefs_site_audit.zip" -> utf8("NOT AN INNER ZIP"))
}
