package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The q196 sub-split layout under the ADVERSARIAL skew tier (30% of the
  * corpus is one hot embedding cluster — exactly the distribution where a
  * flat IVF index serves its hottest posting list from one task per
  * probe). q112 flags that cluster (`is_hot`); ivfSubSplits is the
  * operator that ACTS on the flag. Pinned here:
  *   - the tier genuinely arms the scenario (hottest flat posting list
  *     past 2× the even share);
  *   - the sub-split layout's largest (cluster, sub) posting list drops
  *     BELOW the flat index's hottest cluster, and lands within the
  *     design bound (≤ ~2× even share × 1.5 hash wobble);
  *   - serve results over the sub-split layout are IDENTICAL to the flat
  *     [[VectorQueries.ivfSearch]] — layout must never change a result
  *     (the per-tier gate checks this against DuckDB; here it's checked
  *     in-JVM on the skew distribution the uniform tiers can't produce).
  * Tier self-arms in beforeAll (GenCorpusSkew.write is deterministic),
  * the SkewTierSpec convention. */
class IvfSubSplitSpec extends SparkSpec {

  private val tier = "testdata_skew"
  private def armed = new java.io.File(s"$tier/embeddings.parquet").exists()

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (!armed) graft.GenCorpusSkew.write(spark, tier, 10000L, 4000L)
  }

  test("skew tier: sub-split bounds the hot posting list and serves identically to flat") {
    assert(armed, "testdata_skew missing after beforeAll arming")
    val emb = Tables.embeddings(spark, tier)
    val n = emb.count()
    // cache(): both relations feed several actions below (size audits +
    // two serve paths); uncached, every action would re-run Lloyd
    // training. Spec-local only — unpersisted in the finally.
    val cents = VectorQueries.trainIvfCentroids(emb, n).cache()
    val assigned = VectorQueries.assignTo(emb, cents).cache()
    try {
      val flatSizes = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => r.getLong(1))
      val kOcc = flatSizes.length.toLong
      val evenShare = n.toDouble / kOcc
      val maxFlat = flatSizes.max
      // The planted 30% hot cluster must make a genuinely hot posting
      // list, or this spec tests nothing.
      assert(maxFlat > 2 * evenShare,
        s"hottest flat posting list $maxFlat under 2x even share $evenShare — tier ineffective")

      val splits = VectorQueries.ivfSubSplits(assigned)
      val sub = VectorQueries.ivfSubSplitAssignments(assigned, splits)
      val maxSub = sub.groupBy(col("cluster"), col("sub"))
        .agg(count(lit(1)).as("c")).agg(max(col("c"))).head().getLong(0)
      assert(maxSub < maxFlat,
        s"sub-split did not reduce the hottest posting list: $maxSub vs $maxFlat")
      assert(maxSub <= 3 * evenShare + 1,
        s"sub-list $maxSub past the 2x-target x 1.5-hash-wobble bound (${3 * evenShare})")

      // Layout never changes results: same probes, same top-k, bit-equal.
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.toString()).toSeq
      val flat = rowsOf(VectorQueries.ivfSearch(assigned, cents, qs, 10, 2))
      val viaSub = rowsOf(VectorQueries.ivfSearchSubSplit(sub, splits, cents, qs, 10, 2))
      assert(flat == viaSub,
        s"sub-split serve diverged from flat (${flat.diff(viaSub).take(2)})")
    } finally { assigned.unpersist(); cents.unpersist() }
  }
}
