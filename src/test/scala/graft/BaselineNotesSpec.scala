package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Mechanical audit-trail gate for the per-query bench baseline: any edit
  * to `BENCH_BASELINE_PERQ.json` changes its SHA-256, and this spec fails
  * until a `baseline-sha256: <12-hex-prefix>` line blessing the NEW state
  * is appended to `BASELINE_NOTES.md`. The regression guard (Bench.scala)
  * makes per-query regressions named artifacts; this makes re-baselining
  * (which would reset every ratio to ~1.0) impossible to do silently.
  */
class BaselineNotesSpec extends AnyFunSuite {

  private def repoFile(name: String) = {
    // tests run with cwd = repo root under sbt
    val p = Paths.get(name)
    assert(Files.exists(p), s"$name missing from repo root")
    p
  }

  test("every BENCH_BASELINE_PERQ.json state is blessed in BASELINE_NOTES.md") {
    val baseline = Files.readAllBytes(repoFile("BENCH_BASELINE_PERQ.json"))
    val sha = MessageDigest.getInstance("SHA-256").digest(baseline)
      .map("%02x".format(_)).mkString.take(12)
    val notes = new String(Files.readAllBytes(repoFile("BASELINE_NOTES.md")), "UTF-8")
    val blessed = "(?m)^baseline-sha256:\\s*([0-9a-f]{12})\\s*$".r
      .findAllMatchIn(notes).map(_.group(1)).toSet
    assert(blessed.contains(sha),
      s"BENCH_BASELINE_PERQ.json (sha256 prefix $sha) has no matching " +
        "'baseline-sha256: $sha' entry in BASELINE_NOTES.md — append a note " +
        "recording WHY the baseline changed before committing the edit")
  }

  test("an era-warned loop artifact has a machine-era adjudication entry in the notes") {
    // The era-normalization escape hatch, closed: `era_warn` fires when the
    // committed loop's raw canary era sits outside the notes band
    // [0.8, 1.3] or at a clamp bound (Bench.eraWarnOf) — the two incident
    // rules BASELINE_NOTES.md's r17 governance entry declares. A warned
    // era is allowed ONLY with an explicit `machine-era: <era_raw>` line
    // in the notes, so a silent 3x global slowdown can never ride the
    // normalization to a green artifact without a human on record.
    val p = Paths.get("BENCH_LOCAL_LAST.json")
    if (Files.exists(p)) {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(p.toFile)
      val warn = Option(node.get("era_warn")).filterNot(_.isNull).map(_.asText)
      warn.foreach { w =>
        val eraRaw = node.get("era_raw").asDouble()
        val notes = new String(Files.readAllBytes(repoFile("BASELINE_NOTES.md")), "UTF-8")
        val stamped = "(?m)^machine-era:\\s*([0-9.]+)\\s*$".r
          .findAllMatchIn(notes).map(_.group(1).toDouble).toSet
        assert(stamped.exists(e => math.abs(e - eraRaw) < 0.0005),
          s"BENCH_LOCAL_LAST.json carries era_warn=$w (era_raw=$eraRaw) but " +
            s"BASELINE_NOTES.md has no 'machine-era: $eraRaw' adjudication " +
            "line — write the incident entry (what drifted, why it is or is " +
            "not a shared-path regression) before committing the artifact")
      }
    }
  }
}
