package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Imperative replays of the round-12 normalization/selection windows at
  * sf0.001: q120's per-lang quantile rank and q121's greedy token-budget
  * selection must equal the single-threaded walk over the same rows. */
class BudgetSelectionSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q120 quantile rank equals an explicit per-lang sort") {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ranks = docs.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(x => (x._3, x._1)).zipWithIndex.toSeq.map { case (x, i) =>
        x._1 -> (i + 1L, ds.length.toLong)
      }
    }.toMap
    val got = SparkEntry.queries("q120_quantile_normalize")(spark, d).collect()
    assert(got.length === docs.length)
    got.foreach { r =>
      val (rn, nl) = ranks(r.getLong(0))
      assert(r.getLong(3) === rn, s"rn at doc ${r.getLong(0)}")
      assert(r.getLong(4) === nl)
      if (nl > 1) {
        val q = BigDecimal.valueOf((rn - 1).toDouble / (nl - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(5) === q)
        assert(r.getInt(6) === math.min(9L, math.floor(q * 10).toLong).toInt)
      } else assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("q121 keep set equals the greedy per-lang walk") {
    val got = SparkEntry.queries("q121_token_budget")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // Re-derive the greedy selection from the query's OWN (n_toks, cum)
    // columns plus an independent ordering reconstruction: within a
    // language, cum must be the prefix sum of n_toks in (quality DESC,
    // doc_id) order, and kept <=> cum <= budget.
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val budget = rows.head._5
      assert(rows.forall(_._5 === budget), s"budget constant within $lang")
      assert(3 * rows.map(_._3).sum / 10 === budget, s"budget formula $lang")
      // cum values sorted ascending reconstruct the selection order;
      // successive differences must be exactly the row's n_toks.
      val order = rows.sortBy(_._4)
      var run = 0L
      order.foreach { r =>
        run += r._3
        assert(r._4 === run, s"cum prefix-sum at doc ${r._1}")
        assert(r._6 === (run <= budget), s"kept verdict at doc ${r._1}")
      }
    }
  }
}
