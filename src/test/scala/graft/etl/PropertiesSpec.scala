package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import J._

/** The SURVEY §5.3 property suite (ScalaCheck): p75 membership and
  * order-invariance, score/coverage bounds and the coverage = used/total
  * invariant, and score invariance under the kw_top10 cap. Pure-kernel
  * properties — no SparkSession needed. */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val doubles = Gen.chooseNum(-1e6, 1e6)

  test("p75 lower-nearest-rank: result is a member of the input set") {
    check(Prop.forAll(Gen.nonEmptyListOf(doubles)) { xs =>
      Lighthouse.p75(xs).exists(v => xs.contains(v))
    })
  }

  test("p75 is order-invariant and equals the sorted lower-nearest-rank index") {
    check(Prop.forAll(Gen.nonEmptyListOf(doubles)) { xs =>
      val sorted = xs.sorted
      val expected = sorted(math.floor(0.75 * (xs.length - 1)).toInt)
      Lighthouse.p75(xs).contains(expected) &&
        Lighthouse.p75(scala.util.Random.shuffle(xs)) == Lighthouse.p75(xs)
    })
  }

  /** A normalized doc with the keyword/rank fields the scorecard reads. */
  private def doc(top10: Long, top100: Long, avgPos: Double,
                  rating: Option[Double]): JObj = {
    val d = AuditModel.emptyNormalized("c", "d", "r")
    val kw = d.obj("onsite").obj("keywords")
    kw.set("top3", int(0)); kw.set("top10", num(top10.toDouble))
    kw.set("top100", num(top100.toDouble))
    val rank = d.obj("local").obj("rank")
    rank.set("avg_pos", num(avgPos))
    rating.foreach(r => d.obj("local").obj("reviews").set("avg_rating", num(r)))
    d
  }

  private val docGen = for {
    t10 <- Gen.chooseNum(0L, 500L)
    t100 <- Gen.chooseNum(0L, 1000L)
    pos <- Gen.chooseNum(0.0, 50.0)
    rating <- Gen.option(Gen.chooseNum(0.0, 5.0))
  } yield doc(t10, t100, pos, rating)

  test("scores stay in [0,100], coverages in [0,1], used <= total = 100") {
    check(Prop.forAll(docGen) { d =>
      val s = Scoring.computeScores(d)
      def n(k: String) = s.num(k).get
      n("oss") >= 0 && n("oss") <= 100 && n("lss") >= 0 && n("lss") <= 100 &&
        n("oss_coverage") >= 0 && n("oss_coverage") <= 1 &&
        n("lss_coverage") >= 0 && n("lss_coverage") <= 1 &&
        n("oss_weight_used") <= n("oss_weight_total") &&
        n("lss_weight_used") <= n("lss_weight_total") &&
        n("oss_weight_total") == 100.0 && n("lss_weight_total") == 100.0
    })
  }

  test("coverage equals round2(used/total) exactly") {
    check(Prop.forAll(docGen) { d =>
      val s = Scoring.computeScores(d)
      def n(k: String) = s.num(k).get
      def round2(x: Double) = math.floor(x * 100 + 0.5) / 100
      n("oss_coverage") == round2(n("oss_weight_used") / n("oss_weight_total")) &&
        n("lss_coverage") == round2(n("lss_weight_used") / n("lss_weight_total"))
    })
  }

  test("kw_top10 cap: raising top10 past top100 never changes the score") {
    check(Prop.forAll(Gen.chooseNum(1L, 500L), Gen.chooseNum(0L, 300L)) { (t100, extra) =>
      val base = Scoring.computeScores(doc(t100, t100, 5.0, None)).num("oss").get
      val over = Scoring.computeScores(doc(t100 + extra, t100, 5.0, None)).num("oss").get
      base == over
    })
  }
}
