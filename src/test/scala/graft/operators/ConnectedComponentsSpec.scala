package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ConnectedComponents vs a driver-side union-find reference: fixed shapes
  * (chain, disjoint cliques, star), a long path (exercises pointer jumping
  * — plain propagation would need ~length rounds, the operator must finish
  * inside its 30-round budget), and seeded random graphs. */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    ConnectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to its minimum") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint cliques keep separate minima") {
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L), (21L, 22L))
    val got = run(edges)
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("star with high-id center") {
    val edges = Seq((100L, 1L), (100L, 7L), (100L, 3L))
    val got = run(edges)
    assert(got.values.toSet === Set(1L))
  }

  test("long path converges within the round budget (pointer jumping)") {
    // 400-vertex path, ids descending so the min is at the far end —
    // worst case for one-hop propagation.
    val edges = (1L until 400L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size === 400 && got.values.forall(_ == 1L))
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 120
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(n, edges)
      assert(run(edges) === want)
    }
  }

  test("empty edge set yields empty labels") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents(df, "a", "b").count() === 0L)
  }
}
