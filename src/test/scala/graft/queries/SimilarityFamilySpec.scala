package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Mathematical-contract pins for the q149-q153 similarity/burstiness
  * family. Run at sf0.01 (the driver's gate tier). */
class SimilarityFamilySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q149: pairs are ordered, share 1-8 terms, cosine in [0.6, 1]") {
    val rows = TextPipelineQueries.queries("q149_sparse_cosine")(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("cosine"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "doc_a < doc_b")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 8,
        "shared terms bounded by the top-8 sparsification")
      // rounding can land an exact-1 cosine at 1.000000 but never above
      assert(r.getDouble(3) >= 0.6 && r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("q150: support/confidence/lift obey their identities") {
    val rows = RelationalQueries.queries("q150_assoc_rules")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (pa, pb) = (r.getLong(0), r.getLong(1))
      val (ab, a, b) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pa < pb, "pair is id-ordered")
      assert(ab >= 1 && ab <= math.min(a, b),
        "pair support bounded by item supports")
      val conf = r.getDouble(5)
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getDouble(6) > 0.0, "lift positive")
    }
  }

  test("q151: Fano factors are non-negative and sorted descending") {
    val rows = TextPipelineQueries.queries("q151_term_burstiness")(spark, sf)
      .select(col("df"), col("tot"), col("fano")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(0) >= 20, "min-df floor")
      assert(r.getLong(1) >= r.getLong(0), "total >= doc frequency")
      assert(r.getDouble(2) >= 0.0, "variance/mean cannot be negative")
    }
    val fanos = rows.map(_.getDouble(2))
    assert(fanos.zip(fanos.tail).forall { case (x, y) => x >= y },
      "top-20 is fano-descending")
    // the synthetic corpus plants template/topic clumping — the top
    // bursty term must clump beyond Poisson scatter
    assert(fanos.head > 1.0, "no term burstier than Poisson at all")
  }

  test("q152: local cc in [0,1], wedge-bounded, and Σ n_tri = 3·q136 census") {
    val rows = TextPipelineQueries.queries("q152_clustering_coeff")(spark, sf)
      .select(col("doc_id"), col("deg"), col("n_tri"), col("local_cc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      assert(deg >= 2, "degree-1 nodes have no defined cc")
      assert(tri <= deg * (deg - 1) / 2, "triangles bounded by wedges")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val census = TextPipelineQueries.queries("q136_dup_triangles")(spark, sf)
      .select(col("n_triangles")).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == 3 * census,
      "per-corner attribution sums to three corners per triangle")
  }

  test("q153: boilerplate share is a proper per-source fraction") {
    // sf0.1: the smallest tier whose corpus plants exact cross-doc dups
    // (sf0.001/sf0.01 ship 500 unique docs — n_dup is legitimately zero
    // there, so the planted pin below would be vacuous)
    val rows = TextPipelineQueries.queries("q153_sentence_dup_share")(spark, "/root/testdata/sf0.1")
      .select(col("source"), col("n_sents"), col("n_dup"), col("dup_share"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "dup instances bounded by instances")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // sentence-level boilerplate is planted by the synthetic corpus's
    // shared templates — an all-zero column means the df join matched
    // nothing, the degenerate bug this pin exists to catch
    assert(rows.map(_.getLong(2)).sum > 0, "no duplicated sentence at all")
  }
}
