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
}
