package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import J._

class ScoringSpec extends AnyFunSuite {

  private def doc(): JObj = AuditModel.emptyNormalized("c", "d", "r")

  test("avgPos falsy-zero trap: avg_pos of 0 falls back to 20 like null") {
    val d0 = doc()
    d0.obj("local").obj("rank").set("avg_pos", num(0.0))
    val dNull = doc()
    assert(Scoring.computeScores(d0).toJson == Scoring.computeScores(dNull).toJson)
  }

  test("avg_pos 1 maps to raw 1.0; avg_pos 20 maps to 0") {
    val d = doc()
    d.obj("local").obj("rank").set("avg_pos", num(1.0))
    val s = Scoring.computeScores(d)
    assert(s.obj("components").obj("lss").obj("raw").num("avg_local_rank").contains(1.0))
  }

  test("top100 falsy guard: top100 of 0 is treated as 1") {
    val d = doc()
    d.obj("onsite").obj("keywords").set("top10", num(3.0))
    d.obj("onsite").obj("keywords").set("top100", num(0.0))
    val s = Scoring.computeScores(d)
    // min(3/1, 1) = 1
    assert(s.obj("components").obj("oss").obj("raw").num("kw_top10").contains(1.0))
  }

  test("errors-per-page health: 0 at EPP >= 0.5, pages defaulting to 100") {
    val d = doc()
    d.obj("onsite").obj("errors").set("4xx", num(50.0)) // epp = 50/100 = 0.5
    val s = Scoring.computeScores(d)
    assert(s.obj("components").obj("oss").obj("raw").num("site_health").contains(0.0))
  }

  test("score rounding is half-up to one decimal (Math.round semantics)") {
    // kw_top10 raw: top10=1, top100=8 -> 0.125; only kw (20) + health (20)
    // available with health 1: (20*0.125 + 20*1)/40 = 0.5625 -> 562.5 ->
    // jsRound 563 -> 56.3
    val d = doc()
    d.obj("onsite").obj("keywords").set("top10", num(1.0))
    d.obj("onsite").obj("keywords").set("top100", num(8.0))
    val s = Scoring.computeScores(d)
    assert(s.num("oss").contains(56.3))
  }

  test("unavailable components drop out of the weighted denominator") {
    val s = Scoring.computeScores(doc())
    assert(s.num("oss_weight_used").contains(20.0))   // only site_health
    assert(s.num("oss_coverage").contains(0.2))
    assert(s.num("lss_weight_used").contains(40.0))   // only avg_local_rank
  }
}
