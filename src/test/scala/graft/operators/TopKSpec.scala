package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  test("two-level top-k equals the naive per-key sort") {
    import spark.implicits._
    val rows = for (k <- Seq("a", "b", "c"); i <- 0 until 500)
      yield (k, i.toLong, ((i * 7919) % 1000).toDouble)
    val df = rows.toDF("k", "id", "score")
    val got = TopK.perKey(df, Seq("k"), Seq(col("score").desc, col("id")),
        k = 10, saltExpr = col("id"), salt = 8)
      .select("k", "rank", "id", "score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      g.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
        .map { case (t, i) => (k, i + 1, t._2) }
    }
    assert(got.toSet == expected.toSet)
    assert(got.length == 30)
  }

  test("keys with fewer than k rows keep all rows") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 3.0)).toDF("k", "id", "score")
    val got = TopK.perKey(df, Seq("k"), Seq(col("score").desc, col("id")),
      k = 10, saltExpr = col("id"), salt = 4)
    assert(got.count() == 2)
  }
}
