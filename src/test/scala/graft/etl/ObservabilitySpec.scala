package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Observability parity (reference: log.info of resolved columns at
  * etl.js:128,158,315 and the input echo at main.js:9-14): the ETL records
  * which column the fuzzy resolver actually picked for each source, so a
  * mis-resolved header is debuggable per-archive — while staying quiet by
  * default (breadcrumbs are collected, slf4j INFO is below Spark's WARN
  * threshold). */
class ObservabilitySpec extends AnyFunSuite {

  test("processZip records the resolved-column breadcrumbs for the golden fixture") {
    val log = EtlLog()
    AuditEtl.processZip(Fixtures.fullZip, "c", "d", "r", log = log)
    // The fixture header carries an NBSP ("Current Position") — the
    // breadcrumb must show the RAW resolved header, exactly what the row
    // maps are keyed by, or it would misdirect the debugging it exists for.
    assert(log.first("Ahrefs keywords: position column")
      .contains(Map("posCol" -> "Current Position")))
    assert(log.first("Ahrefs top pages: URL column")
      .contains(Map("urlCol" -> "Current URL")))
    assert(log.first("BL ranks: position column")
      .contains(Map("posCol" -> "Position")))
  }

  test("an unresolvable column records null — the reference's {posCol: undefined}") {
    val log = EtlLog()
    val z = Fixtures.zip("ahrefs_keywords.csv" -> Fixtures.utf8("Foo,Bar\n1,2\n"))
    AuditEtl.processZip(z, "c", "d", "r", log = log)
    assert(log.first("Ahrefs keywords: position column")
      .contains(Map("posCol" -> "null")))
  }

  test("runActor emits the input echo breadcrumb BEFORE validation fails") {
    val log = EtlLog()
    val kv = new AuditPipeline.KvStore {
      def set(name: String, bytes: Array[Byte]): Unit = ()
    }
    intercept[IllegalArgumentException] {
      AuditPipeline.runActor(Some(J.JObj("client" -> J.str("acme"))), kv,
        fetch = _ => Fixtures.minimalZip, log = log)
    }
    val f = log.first("Input received").get
    assert(f("client") == "\"acme\"")
    assert(f("domain") == "null" && f("hasZipUrl") == "false")
  }

  test("breadcrumbs arrive in source-processing order") {
    val log = EtlLog()
    AuditEtl.processZip(Fixtures.fullZip, "c", "d", "r", log = log)
    val names = log.events.map(_._1)
    assert(names.indexOf("Ahrefs keywords: position column") <
           names.indexOf("Ahrefs top pages: URL column"))
    assert(names.indexOf("Ahrefs top pages: URL column") <
           names.indexOf("BL ranks: position column"))
  }
}
