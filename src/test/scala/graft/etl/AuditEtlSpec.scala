package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Golden-output parity: the three JSON documents for each fixture
  * scenario are locked byte-for-byte against src/test/resources/golden/,
  * whose values were hand-audited against /root/reference/src/etl.js,
  * scoring.js, and schema.js branch by branch (see Fixtures for which
  * branch each entry exercises). */
class AuditEtlSpec extends AnyFunSuite {

  private def golden(scenario: String, file: String): String =
    Files.readString(Paths.get(s"src/test/resources/golden/$scenario/$file"))

  private def check(scenario: String, bytes: Array[Byte]): Unit = {
    val r = AuditEtl.processZip(bytes, "acme", "example.com", "2026-08-12")
    assert(r.normalized.toJson == golden(scenario, "normalized_audit.json"))
    assert(r.scores.toJson == golden(scenario, "scores.json"))
    assert(r.manifest.toJson == golden(scenario, "etl_manifest.json"))
  }

  test("minimal ZIP (keywords only) matches golden output byte-for-byte") {
    check("minimal", Fixtures.minimalZip)
  }

  test("full ZIP matches golden output byte-for-byte") {
    check("full", Fixtures.fullZip)
  }

  test("empty ZIP matches golden output byte-for-byte") {
    check("empty", Fixtures.emptyZip)
  }

  test("non-ZIP bytes throw the reference's error") {
    val e = intercept[IllegalArgumentException] {
      AuditEtl.processZip(Fixtures.notAZip, "c", "d", "r")
    }
    assert(e.getMessage.startsWith("Downloaded file is not a ZIP"))
  }

  // Spot checks of load-bearing reference quirks, independent of goldens.

  test("keywords: zero/negative/junk positions are excluded from buckets") {
    val r = AuditEtl.processZip(Fixtures.minimalZip, "c", "d", "r")
    val kw = r.normalized.obj("onsite").obj("keywords")
    assert(kw.num("top3").contains(1.0))
    assert(kw.num("top10").contains(2.0))
    assert(kw.num("top100").contains(3.0))
  }

  test("backlinks dr: junk cell toNums to 0 (JS Number('')), lowering the mean") {
    val r = AuditEtl.processZip(Fixtures.fullZip, "c", "d", "r")
    // (10 + 20 + 0 + 30) / 4 — the junk row contributes 0, not nothing.
    assert(r.normalized.obj("backlinks").num("dr").contains(15.0))
  }

  test("rank rounding is JS half-up: avg 6.25 -> 6.3") {
    val r = AuditEtl.processZip(Fixtures.fullZip, "c", "d", "r")
    assert(r.normalized.obj("local").obj("rank").num("avg_pos").contains(6.3))
  }

  test("pages_total resolves from top-pages distinct URLs, first writer wins") {
    val r = AuditEtl.processZip(Fixtures.fullZip, "c", "d", "r")
    // 5 rows, 1 duplicate URL; sf_internal_all (6 rows) must NOT overwrite.
    assert(r.normalized.obj("onsite").obj("content").num("pages_total").contains(4.0))
  }

  test("gbp photos 'total' row overwrites the insights max") {
    val r = AuditEtl.processZip(Fixtures.fullZip, "c", "d", "r")
    assert(r.normalized.obj("local").obj("gbp").num("photos_total").contains(37.0))
  }

  test("empty-zip scoring: only site_health available -> oss 100 at 0.2 coverage") {
    val r = AuditEtl.processZip(Fixtures.emptyZip, "c", "d", "r")
    assert(r.scores.num("oss").contains(100.0))
    assert(r.scores.num("oss_coverage").contains(0.2))
    assert(r.scores.num("lss").contains(0.0))
  }
}
