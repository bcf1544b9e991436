package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NumSpec extends SparkSpec {

  test("toNum column parity with JS Number semantics") {
    import spark.implicits._
    val cases = Seq(
      "Customer#000000001" -> Some(1.0),
      "5." -> Some(5.0),
      "-.5" -> Some(-0.5),
      "007" -> Some(7.0),
      "$1,234.56" -> Some(1234.56),
      "junk" -> Some(0.0),      // strips to '' -> Number('') = 0
      "" -> Some(0.0),
      "1-2" -> None,
      "1.2.3" -> None,
      "-" -> None,
      "." -> None)
    val df = cases.map(_._1).toDF("s").select(Num.toNum(col("s")).as("n"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == cases.map(_._2))
  }

  test("toNum of NULL input is 0 (JS String(null ?? '') -> '')") {
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("s").select(Num.toNum(col("s")).as("n"))
    assert(df.collect().head.getDouble(0) == 0.0)
  }

  test("fixedSum is invariant to partitioning (order-independent)") {
    import spark.implicits._
    val values = (1 to 10000).map(i => i * 0.01 + 0.001)
    val a = values.toDF("v").repartition(1)
      .agg(Num.fixedSum(col("v"), 2).as("s")).collect().head.getDouble(0)
    val b = values.toDF("v").repartition(37)
      .agg(Num.fixedSum(col("v"), 2).as("s")).collect().head.getDouble(0)
    assert(a == b)
  }

  test("clamp01 bounds") {
    import spark.implicits._
    val df = Seq(-0.5, 0.0, 0.25, 1.0, 7.0).toDF("v")
      .select(Num.clamp01(col("v")).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 0.0, 0.25, 1.0, 1.0))
  }
}
