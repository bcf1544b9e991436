package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {

  private def naiveP(values: Seq[Double], q: Double): Double = {
    val s = values.sorted
    s(math.floor(q * (s.length - 1)).toInt)
  }

  test("matches the reference's sorted[floor(q*(n-1))] for n = 1..6") {
    import spark.implicits._
    for (n <- 1 to 6) {
      val values = (1 to n).map(i => (i * 37 % 11).toDouble + i * 0.5)
      val df = values.map(v => ("g", v)).toDF("g", "v")
      val got = Percentiles.nearestRankByGroup(df, Seq("g"), "v", 0.75)
        .collect().head.getDouble(1)
      assert(got == naiveP(values, 0.75), s"n=$n")
    }
  }

  test("grouped: each group gets its own exact rank, all-equal short-circuit") {
    import spark.implicits._
    val rows = Seq.tabulate(101)(i => ("a", i.toDouble)) ++
      Seq.fill(7)(("b", 42.0))
    val df = rows.toDF("g", "v")
    val out = Percentiles.nearestRankByGroup(df, Seq("g"), "v", 0.75)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 75.0)   // floor(0.75*100) = 75
    assert(out("b") == 42.0)   // degenerate min==max path
  }

  test("multiple buckets: large spread still selects the exact element") {
    import spark.implicits._
    val values = (0 until 1000).map(i => ((i * 613) % 1000).toDouble)
    val df = values.map(v => ("g", v)).toDF("g", "v")
    val got = Percentiles.nearestRankByGroup(df, Seq("g"), "v", 0.25, buckets = 8)
      .collect().head.getDouble(1)
    assert(got == naiveP(values, 0.25))
  }

  test("multi-quantile: one histogram serves every rank, incl. shared buckets") {
    import spark.implicits._
    val values = (0 until 500).map(i => ((i * 613) % 500).toDouble)
    val rows = values.map(v => ("a", v)) ++ Seq.fill(5)(("b", 9.0))
    val df = rows.toDF("g", "v")
    // buckets=4 forces several quantiles into the SAME bucket — the
    // rank-then-attach order in stage 3 must not duplicate rows.
    val qs = Seq(0.05, 0.33, 0.5, 0.67, 0.95)
    val out = Percentiles.nearestRanksByGroup(df, Seq("g"), "v", qs, buckets = 4)
    assert(out.columns.toSeq == Seq("g", "p5", "p33", "p50", "p67", "p95"))
    val byG = out.collect().map(r => r.getString(0) -> r).toMap
    for ((q, i) <- qs.zipWithIndex)
      assert(byG("a").getDouble(i + 1) == naiveP(values, q), s"q=$q")
    for (i <- qs.indices) assert(byG("b").getDouble(i + 1) == 9.0)
  }

  test("multi-quantile agrees with repeated single-quantile calls") {
    import spark.implicits._
    val rows = (0 until 300).map(i => (s"g${i % 3}", ((i * 97) % 113).toDouble))
    val df = rows.toDF("g", "v")
    val multi = Percentiles.nearestRanksByGroup(df, Seq("g"), "v", Seq(0.05, 0.95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val lo = Percentiles.nearestRankByGroup(df, Seq("g"), "v", 0.05)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val hi = Percentiles.nearestRankByGroup(df, Seq("g"), "v", 0.95)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (g <- multi.keys) assert(multi(g) == ((lo(g), hi(g))), g)
  }

  test("named quantiles: explicit labels for ranks whose default names collide") {
    import spark.implicits._
    val values = (0 until 400).map(i => ((i * 271) % 400).toDouble)
    val df = values.map(v => ("a", v)).toDF("g", "v")
    // 0.497/0.5/0.503 all round to `p50` — the q61 bracket shape that
    // motivates explicit names.
    val qs = Seq(0.497 -> "lo", 0.5 -> "mid", 0.503 -> "hi")
    val out = Percentiles.nearestRanksByGroupNamed(df, Seq("g"), "v", qs)
    assert(out.columns.toSeq == Seq("g", "lo", "mid", "hi"))
    val r = out.collect().head
    for (((q, _), i) <- qs.zipWithIndex)
      assert(r.getDouble(i + 1) == naiveP(values, q), s"q=$q")
    // And the single-quantile FAST PATH lands on the identical values.
    for ((q, name) <- qs) {
      val single = Percentiles.nearestRanksByGroupNamed(df, Seq("g"), "v",
        Seq(q -> name)).collect().head.getDouble(1)
      assert(single == naiveP(values, q), s"fast path q=$q")
    }
  }
}
