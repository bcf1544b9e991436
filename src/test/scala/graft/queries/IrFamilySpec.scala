package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Mathematical-contract pins for the q124-q129 IR/LM-audit family —
  * properties the oracle hash cannot see drifting together on both
  * engines (a shared formula bug produces matching wrong numbers; these
  * assert the numbers mean what the operator names claim).
  *
  * Run at sf0.01 (the driver's gate tier). */
class IrFamilySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q124: Kneser-Ney probabilities are a valid distribution head") {
    val rows = TextPipelineQueries.queries("q124_kneser_ney")(spark, sf)
      .select(col("p_kn"), col("c12"), col("c1")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getDouble(0)
      assert(p > 0.0 && p <= 1.0, s"p_kn $p outside (0, 1]")
      assert(r.getLong(1) <= r.getLong(2), "bigram count exceeds left-unigram count")
    }
    // top-20 is ordered by the exact fixed-point key underlying p_kn
    val ps = rows.map(_.getDouble(0))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b }, "p_kn not descending")
  }

  test("q125: Heaps fits are sane for natural-ish text (0 < beta < 1, r2 in [0,1])") {
    val rows = TextPipelineQueries.queries("q125_heaps_fit")(spark, sf)
      .select(col("beta"), col("r2")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(0), "degenerate fit on a 25-doc source")
      val beta = r.getDouble(0); val r2 = r.getDouble(1)
      assert(beta > 0.0 && beta < 1.0, s"Heaps beta $beta outside (0, 1)")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2 outside [0, 1]")
    }
  }

  test("q126: the coverage cutoff actually covers >= 95% with the minimal rank") {
    val rows = TextPipelineQueries.queries("q126_vocab_coverage")(spark, sf)
      .select(col("vocab"), col("k95"), col("cov95")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.95, s"cov95 ${r.getDouble(2)} below threshold")
      assert(r.getLong(1) >= 1L && r.getLong(1) <= r.getLong(0),
        "k95 outside [1, vocab]")
    }
  }

  test("q127: query-likelihood scores are log-probabilities (negative, finite)") {
    val rows = TextPipelineQueries.queries("q127_query_likelihood")(spark, sf)
      .select(col("score")).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val s = r.getDouble(0)
      assert(s < 0.0 && !s.isInfinite && !s.isNaN, s"score $s not a finite log-prob")
    }
  }

  test("q128: DCG never exceeds the ideal DCG and both cumulate monotonically") {
    val rows = TextPipelineQueries.queries("q128_ndcg")(spark, sf)
      .orderBy(col("k")).select(col("dcg"), col("idcg"), col("ndcg")).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getDouble(0) <= r.getDouble(1) + 1e-9, "dcg exceeds idcg")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0 + 1e-9,
        s"ndcg ${r.getDouble(2)} outside (0, 1]")
    }
    val is = rows.map(_.getDouble(1))
    assert(is.zip(is.tail).forall { case (a, b) => b >= a - 1e-9 },
      "idcg not monotone in k")
  }

  test("q129: truncated-dim recalls are fractions; 16-dim recall degrades vs exact") {
    val r = VectorQueries.queries("q129_dim_truncation")(spark, sf)
      .select(col("recall_d16"), col("recall_d32")).collect()
    assert(r.length == 5)
    r.foreach { row =>
      Seq(row.getDouble(0), row.getDouble(1)).foreach(x =>
        assert(x >= 0.0 && x <= 1.0, s"recall $x outside [0, 1]"))
    }
    // A 4x dim cut on random-ish 64-dim vectors must lose real recall —
    // if truncation ever reports ~perfect recall the slice wiring broke.
    val m16 = r.map(_.getDouble(0)).sum / r.length
    assert(m16 < 0.95, s"mean 16-dim recall $m16 suspiciously high")
  }
}
