package graft.queries

import graft.SparkSpec
import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The vector incremental dedup (public dedupAgainstDropped, the q52 gate
  * body) must reproduce the full-corpus LSH dedup on a fixture whose
  * near-dup clusters CROSS the corpus/batch split — pinned here directly
  * against an unsalted reference computation built from the same public
  * band table, independent of the gate corpus. */
class VectorDedupSpec extends SparkSpec {

  private val Dim = 64
  private val DupCos = 0.4

  /** 40 vectors: cluster A (ids 0-4) near-identical, cluster B (ids 28-35)
    * near-identical and SPANNING the 80% split at t = 32, the rest unique
    * random directions (seeded — deterministic). */
  private def embeddings(): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(Dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centerA = unit(); val centerB = unit()
    def near(c: Array[Float], i: Int): Seq[Float] =
      c.zipWithIndex.map { case (x, j) => x + (if (j == i % Dim) 0.001f else 0f) }.toSeq
    (0 until 40).map { i =>
      val emb: Seq[Float] =
        if (i < 5) near(centerA, i)
        else if (i >= 28 && i < 36) near(centerB, i)
        else unit().toSeq
      (i.toLong, emb)
    }.toDF("vec_id", "embedding")
  }

  /** Unsalted reference: ids with ANY lower-id band-bucket neighbor at
    * cosine >= DupCos — the full-corpus drop rule, computed plainly. */
  private def referenceDropped(emb: DataFrame, bands: DataFrame): Set[Long] = {
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b")).distinct()
    cand
      .join(emb.select(col("vec_id").as("ia"), col("embedding").as("ea")), col("id_a") === col("ia"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("eb")), col("id_b") === col("ib"))
      .filter(Vectors.cosine(col("ea"), col("eb")) >= DupCos)
      .select(col("id_b")).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("incremental embedding dedup equals the full-corpus dedup across the split") {
    val emb = embeddings()
    val np = VectorQueries.planesPerBand(40)
    val bands = VectorQueries.bandTable(emb, np)
    val t = 32L // (max_id + 1) * 4 / 5, as the q52 gate derives it
    val corpus = emb.filter(col("vec_id") < t)
    val batch = emb.filter(col("vec_id") >= t)

    val full = referenceDropped(emb, bands)
    val withinCorpus = referenceDropped(corpus, bands.filter(col("vec_id") < t))
    val fromBatch = VectorQueries.dedupAgainstDropped(corpus, batch, np)
      .collect().map(_.getLong(0)).toSet
    val incremental = withinCorpus ++ fromBatch

    assert(full.nonEmpty, "fixture must produce confirmed near-dups")
    // Cluster B spans the boundary: batch members 32-35 have corpus
    // near-dups 28-31, so the incremental path must drop them all.
    assert((32L to 35L).toSet.subsetOf(fromBatch))
    assert(incremental == full)
  }
}
