package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batch/standing boundary of the incremental IVF path (q188): the
  * standing index must be a pure function of the CORPUS side, and serving
  * an arriving batch by assignment-only must equal the one-pass
  * formulation. The q188 gate machine-checks the end-to-end search
  * equality against DuckDB; these tests pin the two boundary properties
  * the gate composes, on a synthetic corpus small enough to falsify by
  * hand. */
class IvfIncrementalSpec extends SparkSpec {

  private val dim = 8

  /** Deterministic unit-norm vector per id (id-seeded LCG — no RNG
    * state shared across rows). */
  private def vec(id: Long, salt: Long): Array[Float] = {
    var x = id * 6364136223846793005L + salt
    val raw = Array.fill(dim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33).toDouble / (1L << 31).toDouble) - 1.0
    }
    val n = math.sqrt(raw.map(v => v * v).sum)
    raw.map(v => (v / n).toFloat)
  }

  private def embDf(ids: Seq[Long], salt: Long = 0xabcL): DataFrame = {
    val session = spark
    import session.implicits._
    ids.map(i => (i, vec(i, salt))).toDF("vec_id", "embedding")
  }

  test("incremental assignment ≡ one-pass assignment against the standing centroids") {
    val corpus = embDf(0L until 80L)
    val batch = embDf(80L until 100L)
    val cents = VectorQueries.trainIvfCentroids(corpus, 80L)
    val onePass = VectorQueries.assignTo(corpus.union(batch), cents)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incremental = VectorQueries.assignTo(corpus, cents)
      .union(VectorQueries.assignTo(batch, cents))
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incremental.size == 100 && incremental == onePass)
  }

  test("the standing index never reads the arriving batch") {
    val corpus = embDf(0L until 80L)
    val centsA = VectorQueries.trainIvfCentroids(corpus, 80L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // A different arriving batch (same ids, perturbed content) must leave
    // the standing centroids bit-identical — training draws init and
    // Lloyd sample from corpus rows only.
    val centsB = VectorQueries.trainIvfCentroids(corpus, 80L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(centsA == centsB)
    // And the serve side sees batch content ONLY through assignment:
    // changing the batch changes its own clusters at most, never the
    // standing rows' clusters.
    val standing = VectorQueries.assignTo(corpus, VectorQueries.trainIvfCentroids(corpus, 80L))
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch1 = embDf(80L until 100L, salt = 0x111L)
    val withB1 = VectorQueries.assignTo(corpus.union(batch1),
        VectorQueries.trainIvfCentroids(corpus, 80L))
      .filter(col("vec_id") < 80)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withB1 == standing)
  }
}
