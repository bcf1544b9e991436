package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Plan linting across the ENTIRE gate surface: no query may plan a
  * scale-killer. Catches regressions the value-level gate cannot see —
  * a query can stay hash-correct while silently degrading to a
  * cartesian product or an unbounded nested-loop join.
  *
  * BroadcastNestedLoopJoin is allowed only where one side is provably
  * bounded by a query constant (the ANN query/centroid sides, ≤ 16
  * rows at any corpus scale) — those are the documented intent, not an
  * accident. */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries where a nested-loop join against a constant-bounded
    * broadcast side is the intended design. */
  private val nestedLoopAllowed = Set(
    "q38_cosine_topk",   // query vectors (< 5 rows) cross corpus
    "q44_ann_ivf",       // centroids (~sqrt(n), broadcast) and probes (<= 10)
    "q50_ann_recall")    // composes q38/q44, inheriting their bounded sides
    // q47_embed_dedup left OUT deliberately: since round 5 its candidate
    // generation is a fully keyed (band, key, sub) equi-join; q39 left out
    // since round 6's multi-band rework — band-key equi-joins throughout.

  test("no gate query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      plan.contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("BroadcastNestedLoopJoin appears only where a side is constant-bounded") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(nestedLoopAllowed)
      .filter { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        plan.contains("BroadcastNestedLoopJoin")
      }
    assert(offenders.isEmpty, s"unintended nested-loop joins in: $offenders")
  }
}
