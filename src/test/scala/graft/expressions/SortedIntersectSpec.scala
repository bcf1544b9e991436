package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_sorted_icount must be result-identical to size(array_intersect)
  * on sorted-distinct inputs — the substitution q37 relies on. */
class SortedIntersectSpec extends SparkSpec {

  test("sorted-merge count equals size(array_intersect) on random sorted sets") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(40).toLong).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        expr("graft_sorted_icount(a, b)").as("merged"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
    val bad = df.filter(col("merged") =!= col("builtin")).count()
    assert(bad == 0)
    // Sanity on the distribution: the fixture produces real overlaps, so
    // the parity above is not vacuously over empty intersections.
    assert(df.filter(col("merged") > 0).count() > 100)
  }

  test("edges: empty, disjoint, identical, single-element") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3),
      (Seq(7L), Seq(7L), 1),
      (Seq(7L), Seq(8L), 0)
    ).toDF("a", "b", "expected")
    assert(df.filter(
      expr("graft_sorted_icount(a, b)") =!= col("expected")).count() == 0)
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array(1L, 4L, 9L, 16L))
    val b = new GenericArrayData(Array(2L, 4L, 8L, 16L, 32L))
    assert(SortedIntersectCountExpr.compute(a, b, true, true) == 2)
  }
}
