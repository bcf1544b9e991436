package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** q115's sum-vector identity (Σ_{i≠j} x_i·x_j = |Σx|² − Σ|x_i|²) pinned
  * against the brute-force all-pairs means it replaces: at sf0.001 the
  * 500-vector corpus is small enough to enumerate every pair in-process,
  * so the spec proves the O(n·d) aggregate computes EXACTLY the same
  * rounded statistics as the O(n²·d) definition — same 1e-3 quantization,
  * same division order, same 6-dp rounding. */
class LabelCohesionSpec extends SparkSpec {

  private def fix(x: Float): Long =
    BigDecimal(x.toDouble * 1000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("q115 equals brute-force pairwise means [sf0.001]") {
    val d = "/root/testdata/sf0.001"
    val vecs = Tables.embeddings(spark, d)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(fix).toArray))
    val n = vecs.length.toLong
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      BigInt(a.indices.map(i => a(i) * b(i)).sum)

    val got = SparkEntry.queries("q115_label_cohesion")(spark, d).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    for ((lab, members) <- vecs.groupBy(_._1)) {
      val vs = members.map(_._2)
      val nl = vs.length.toLong
      val intraSum = (for (i <- vs.indices; j <- vs.indices if i < j)
        yield dot(vs(i), vs(j))).sum * 2 // ordered pairs
      val interSum = (for ((l2, v2) <- vecs if l2 != lab; v1 <- vs)
        yield dot(v1, v2)).sum
      val ia = intraSum.toDouble / 1e6 / (nl * (nl - 1))
      val ie = interSum.toDouble / 1e6 / (nl * (n - nl))
      val (gn, gIntra, gInter, gCoh) = got(lab)
      assert(gn === nl, s"label $lab n")
      assert(gIntra === round6(ia), s"label $lab intra")
      assert(gInter === round6(ie), s"label $lab inter")
      assert(gCoh === round6(ia - ie), s"label $lab cohesion")
    }
  }
}
