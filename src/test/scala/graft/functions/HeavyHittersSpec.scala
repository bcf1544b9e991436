package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import scala.util.Random

/** Property gate for the Misra-Gries kernel: over random skewed streams,
  * random partitionings, and random merge orders, the two theorems the q66
  * gate relies on must hold — presence of every f(x) > n/(k+1) token, and
  * per-token error within [0, n/(k+1)]. The merge path is exercised
  * explicitly (the streaming `reduce` path alone never builds oversized
  * maps, so a broken `merge` would otherwise only surface in the
  * distributed gate).
  */
class HeavyHittersSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Zipf-ish stream over a small alphabet: token i gets weight 1/(i+1). */
  private def stream(rnd: Random, n: Int, alphabet: Int): Seq[String] = {
    val weights = (0 until alphabet).map(i => 1.0 / (i + 1))
    val total = weights.sum
    Seq.fill(n) {
      var r = rnd.nextDouble() * total
      var i = 0
      while (r > weights(i) && i < alphabet - 1) { r -= weights(i); i += 1 }
      s"t$i"
    }
  }

  private def runPartitioned(mg: MisraGries, xs: Seq[String], parts: Int,
                             rnd: Random): Map[String, Long] = {
    val chunks = xs.grouped(math.max(1, xs.size / parts)).toSeq
    val summaries = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
    rnd.shuffle(summaries).foldLeft(mg.zero)(mg.merge)
  }

  test("MG guarantees hold over random streams, partitionings, merge orders") {
    val gen = for {
      seed     <- Gen.choose(0L, Long.MaxValue)
      n        <- Gen.choose(200, 5000)
      alphabet <- Gen.choose(5, 60)
      k        <- Gen.choose(2, 24)
      parts    <- Gen.choose(1, 16)
    } yield (seed, n, alphabet, k, parts)

    check(Prop.forAll(gen) { case (seed, n, alphabet, k, parts) =>
      val rnd = new Random(seed)
      val xs = stream(rnd, n, alphabet)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sketch = runPartitioned(MisraGries(k), xs, parts, rnd)
      val bound = n.toDouble / (k + 1)

      val sizeOk = sketch.size <= k
      val noOver = exact.keys.forall(t => sketch.getOrElse(t, 0L) <= exact(t))
      val noPhantom = sketch.keys.forall(exact.contains)
      val errOk = exact.forall { case (t, f) =>
        f - sketch.getOrElse(t, 0L) <= bound + 1e-9
      }
      val presenceOk = exact.forall { case (t, f) =>
        f <= bound || sketch.contains(t)
      }
      sizeOk && noOver && noPhantom && errOk && presenceOk
    })
  }

  test("single-counter and exact-capacity edges") {
    val xs = Seq("a", "a", "b", "a", "c", "a") // f(a)=4, n=6
    val one = xs.foldLeft(MisraGries(1).zero)(MisraGries(1).reduce)
    // k=1: bound n/2 = 3; f(a)=4 > 3 so a must survive with est >= 1.
    assert(one.keySet == Set("a") && one("a") >= 1 && one("a") <= 4)

    val wide = xs.foldLeft(MisraGries(10).zero)(MisraGries(10).reduce)
    // capacity never reached: MG degenerates to exact counts.
    assert(wide == Map("a" -> 4L, "b" -> 1L, "c" -> 1L))
  }
}
