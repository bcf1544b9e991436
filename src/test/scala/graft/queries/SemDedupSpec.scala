package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup keeper semantics (q189's public body, semDedupVerdict),
  * pinned on a hand-built geometry where the paper's rule — keep the
  * duplicate-neighborhood member FARTHEST from its cluster centroid —
  * disagrees with the q47/q35 lowest-id rule, so a refactor that silently
  * reverts to min-id keeping fails here even though both rules produce
  * "one keeper per neighborhood".
  *
  * Geometry (4-dim, two orthogonal centroids c0=(1,0,0,0), c1=(0,1,0,0)):
  *   v0=(1,0,0,0)    cluster 0, cos_cent 1.0    — dup of v1/v6, DROPPED
  *   v1=(1,0,0.2,0)  cluster 0, cos_cent ~0.98  — farthest dup, KEPT
  *   v6=(1,0,0.2,0)  cluster 0, = v1 exactly    — cos_cent ties v1,
  *                                                higher id, DROPPED
  *   v2=(0.3,0,-0.954,0) cluster 0 — cosine to v0/v1 below DupCos, KEPT
  *   v3=(0,1,0,0)    cluster 1, cos_cent 1.0    — dup of v4, DROPPED
  *   v4=(0,1,0,0.3)  cluster 1, cos_cent ~0.96  — farther, KEPT
  *   v5=(0,0.2,0,-0.98) cluster 1 — no dup, KEPT
  */
class SemDedupSpec extends SparkSpec {

  test("keeper is the member farthest from the centroid, id-tiebroken") {
    import spark.implicits._
    val emb = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0.2f, 0f),
      2L -> Seq(0.3f, 0f, -0.954f, 0f),
      3L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(0f, 1f, 0f, 0.3f),
      5L -> Seq(0f, 0.2f, 0f, -0.98f),
      6L -> Seq(1f, 0f, 0.2f, 0f)
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f)
    ).toDF("c_id", "c_emb")

    val out = VectorQueries.semDedupVerdict(emb, cents)
      .orderBy(col("vec_id"))
      .select(col("vec_id"), col("cluster"), col("is_dropped"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    assert(out.map(t => t._1 -> t._2).toMap ===
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 6L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L),
      "cluster assignment")
    val dropped = out.collect { case (id, _, 1) => id }.toSet
    assert(dropped === Set(0L, 3L, 6L),
      "keeper must be the farthest-from-centroid member (v1/v4), " +
        s"with the cos_cent tie (v1 vs v6) broken by lower id; got dropped=$dropped")
  }
}
