package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class LighthouseSpec extends AnyFunSuite {

  test("p75 lower nearest rank at n = 1..4") {
    assert(Lighthouse.p75(Seq(5.0)).contains(5.0))
    assert(Lighthouse.p75(Seq(2.0, 1.0)).contains(1.0))        // floor(.75*1)=0
    assert(Lighthouse.p75(Seq(3.0, 1.0, 2.0)).contains(2.0))   // floor(1.5)=1
    assert(Lighthouse.p75(Seq(4.0, 1.0, 3.0, 2.0)).contains(3.0)) // floor(2.25)=2
    assert(Lighthouse.p75(Nil).isEmpty)
  }

  test("pass rate counts only URLs with all three metrics") {
    val pass = Lighthouse.Metrics(Some(2000), Some(0.05), Some(150), None, None)
    val fail = Lighthouse.Metrics(Some(3000), Some(0.2), Some(250), None, None)
    val incomplete = Lighthouse.Metrics(Some(1000), None, Some(100), None, None)
    assert(Lighthouse.passRate(Seq(pass, fail, incomplete)).contains(0.5))
    assert(Lighthouse.passRate(Seq(incomplete)).isEmpty)
    assert(Lighthouse.passRate(Nil).isEmpty)
  }

  test("boundary thresholds are inclusive (<=)") {
    val edge = Lighthouse.Metrics(Some(2500), Some(0.1), Some(200), None, None)
    assert(Lighthouse.passRate(Seq(edge)).contains(1.0))
  }

  test("metric extraction tolerates missing audits and null scores") {
    val m = Lighthouse.parse(Fixtures.utf8("""{"audits":{}}"""))
    assert(m.lcpMs.isEmpty && m.perfScore.isEmpty)
    val m2 = Lighthouse.parse(Fixtures.utf8(
      """{"audits":{"interactive":{"numericValue":123}},
        |"categories":{"performance":{"score":null}}}""".stripMargin))
    assert(m2.inpMs.contains(123.0) && m2.perfScore.isEmpty)
  }

  test("malformed JSON throws (caller marks manifest partial)") {
    intercept[Exception] { Lighthouse.parse(Fixtures.utf8("{nope")) }
  }
}
