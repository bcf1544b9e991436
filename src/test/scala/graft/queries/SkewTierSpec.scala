package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Task-level bounds of the pair family at the SKEW tier
  * (testdata_skew — GenCorpusSkew: 90% one-language, 30% boilerplate
  * 8-gram, 30% hot embedding cluster). CORRECTNESS_SKEW.json proves the
  * q34/q37/q47/q102/q149 VALUES stay exact under this distribution; these
  * tests prove the tier genuinely stresses the salting guard and that the
  * guard keeps every join bucket's candidate-pair count bounded — the
  * property that makes the family survive one hot key at 100 TB.
  * The tier self-arms: beforeAll generates the two skewed tables when
  * absent (GenCorpusSkew.write is deterministic), so these bounds run on
  * every checkout — no auto-cancel. */
class SkewTierSpec extends SparkSpec {

  private val tier = "testdata_skew"
  private def armed = new java.io.File(s"$tier/embeddings.parquet").exists()

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (!armed) graft.GenCorpusSkew.write(spark, tier, 10000L, 4000L)
  }

  // VectorQueries.MaxBucket — the maxGroup every SaltedSelfPairs call
  // site in the gate uses.
  private val MaxGroup = 1000L

  test("skew tier: the hot LSH bucket exceeds maxGroup, and salting bounds every join bucket") {
    assert(armed, "testdata_skew missing after beforeAll arming")
    val emb = Tables.embeddings(spark, tier)
    val n = emb.count()
    val bd = VectorQueries.bandTable(emb, VectorQueries.planesPerBand(n))
    val sizes = bd.groupBy(col("band"), col("key")).agg(count(lit(1)).as("gs"))
    val maxBucket = sizes.agg(max(col("gs"))).head().getLong(0)
    // The planted 30% hot cluster shares every band key — the tier MUST
    // produce a bucket past the cap, or this spec tests nothing (the
    // uniform tiers never reach it).
    assert(maxBucket > MaxGroup,
      s"hot bucket $maxBucket does not exceed maxGroup=$MaxGroup — skew tier ineffective")

    // Recompute the sub-group assignment exactly as SaltedSelfPairs.pairs
    // does; a join bucket for sub-pair (i, j) holds |sub i|·|sub j|
    // candidates, so maxSub² bounds every task's pair count.
    val dd = bd.join(sizes, Seq("band", "key"))
      .withColumn("__g", ceil(col("gs").cast("double") / MaxGroup).cast("int"))
      .withColumn("__sub", pmod(hash(col("vec_id")), col("__g")).cast("int"))
    val maxSub = dd.groupBy(col("band"), col("key"), col("__sub"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    assert(maxSub <= 3L * MaxGroup / 2,
      s"sub-group $maxSub past the 1.5×maxGroup hash-wobble bound")
    assert(maxSub * maxSub <= (3L * MaxGroup / 2) * (3L * MaxGroup / 2))
    // And the salted unit of work genuinely beats the unsalted hot task.
    assert(maxSub * maxSub < maxBucket * (maxBucket - 1) / 2,
      s"salting did not reduce the hot bucket's single-task pair count")
  }

  test("skew tier: boilerplate tokens cross the q149 df cap; one language owns ~90%") {
    assert(armed, "testdata_skew missing after beforeAll arming")
    val docs = Tables.documents(spark, tier)
    val nDocs = docs.count()
    // Document frequency of a boilerplate token: must exceed the df≤1000
    // posting-list cap, proving q149's hot-token prune actually engaged
    // on this tier (its gate row is exact BECAUSE both engines prune).
    val df = docs.filter(array_contains(
      graft.functions.TextFns.tokens(col("text")), "sitemap")).count()
    assert(df > 1000L, s"boilerplate df $df under the posting cap")
    val enShare = docs.filter(col("lang") === "en").count().toDouble / nDocs
    assert(enShare > 0.85 && enShare < 0.95, s"en share $enShare")
  }
}
