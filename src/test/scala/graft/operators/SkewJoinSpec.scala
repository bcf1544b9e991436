package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join under skew") {
    val session = spark
    import session.implicits._
    // 90% of fact rows share one hot key.
    val facts = (0 until 20000).map { i =>
      (if (i % 10 == 0) i % 7 else 999L, i.toLong)
    }.toDF("k", "row_id")
    val dim = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "label")

    val plain = facts.join(dim, Seq("k"))
      .select("k", "row_id", "label").collect().toSet
    val salted = SkewJoin.saltedInner(facts, dim, Seq("k"),
        saltSource = col("row_id"), salt = 16)
      .select("k", "row_id", "label").collect().toSet
    assert(salted == plain)
    assert(salted.size == 20000)
  }

  test("join key includes the salt (plan-level check)") {
    val session = spark
    import session.implicits._
    val facts = Seq((1L, 10L)).toDF("k", "row_id")
    val dim = Seq((1L, "x")).toDF("k", "label")
    val plan = SkewJoin.saltedInner(facts, dim, Seq("k"), col("row_id"), 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"))
  }
}
