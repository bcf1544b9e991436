package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class AuditPipelineSpec extends SparkSpec {

  test("processDir maps the audit kernel over a binaryFile scan") {
    val dir = Files.createTempDirectory("audits").toString
    Files.write(Paths.get(s"$dir/acme__example.com__2026-08-12.zip"),
      Fixtures.fullZip)
    Files.write(Paths.get(s"$dir/beta__other.org__2026-08-12.zip"),
      Fixtures.minimalZip)
    Files.write(Paths.get(s"$dir/broken__x__y.zip"), Fixtures.notAZip)

    val rows = AuditPipeline.processDir(spark, dir).collect()
    assert(rows.length == 3)
    val byClient = rows.map(r => r.client -> r).toMap
    assert(byClient("acme").ok && byClient("beta").ok)
    assert(!byClient("broken").ok)
    assert(byClient("broken").error.contains("not a ZIP"))
    assert(byClient("acme").domain == "example.com")
    // The distributed row carries the same JSON the kernel produces.
    val local = AuditEtl.processZip(Fixtures.fullZip, "acme", "example.com",
      "2026-08-12")
    assert(byClient("acme").normalizedJson == local.normalized.toJson)
    assert(byClient("acme").scoresJson == local.scores.toJson)
  }

  test("scoresFrame lifts score scalars into SQL-queryable columns") {
    val dir = Files.createTempDirectory("audits2").toString
    Files.write(Paths.get(s"$dir/acme__example.com__2026-08-12.zip"),
      Fixtures.fullZip)
    Files.write(Paths.get(s"$dir/beta__other.org__2026-08-12.zip"),
      Fixtures.minimalZip)
    val scores = AuditPipeline.scoresFrame(AuditPipeline.processDir(spark, dir))
    scores.createOrReplaceTempView("audit_scores")
    val top = spark.sql(
      "SELECT client, oss, lss, oss_coverage FROM audit_scores ORDER BY oss DESC")
      .collect()
    assert(top.length == 2)
    // full fixture: oss 37.9 / lss 65.2; minimal fixture: oss 83.3 / lss 0.
    val byClient = top.map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byClient("acme") == (37.9, 65.2))
    assert(byClient("beta") == (83.3, 0.0))
  }
}
