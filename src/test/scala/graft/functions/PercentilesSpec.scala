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
}
