package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Mathematical-contract pins for the q130-q136 corpus-operations family —
  * invariants the oracle hash cannot see drifting together on both engines
  * (a shared formula bug produces matching wrong numbers; these assert the
  * numbers mean what the operator names claim).
  *
  * Run at sf0.01 (the driver's gate tier). */
class CorpusOpsFamilySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q130: sessions partition each user's events and the split is exact") {
    val sess = RelationalQueries.queries("q130_sessionization")(spark, sf)
      .select(col("user_id"), col("n_events"), col("dur_s")).collect()
    assert(sess.nonEmpty)
    // every event lands in exactly one session
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(sess.map(_.getLong(1)).sum == nEvents,
      "session event counts must partition the event stream")
    // a session whose duration exceeds its event count × 30 min would
    // have to contain a break gap — impossible by construction
    sess.foreach { r =>
      assert(r.getLong(2) <= (r.getLong(1) - 1) * 1800L,
        s"session duration ${r.getLong(2)}s cannot exceed (n-1)×30min")
    }
  }

  test("q131: rule-failure counts are consistent with survivor counts") {
    val rows = TextPipelineQueries.queries("q131_rule_cascade")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val fails = (2 to 5).map(r.getLong)
      val kept = r.getLong(6)
      assert(kept <= n && fails.forall(_ <= n))
      // survivors + the union of failures covers all docs:
      // kept >= n - sum(fails) (inclusion-exclusion lower bound)
      assert(kept >= n - fails.sum, "kept below inclusion-exclusion bound")
    }
  }

  test("q132: the min-k quintile mean never exceeds the full mean") {
    val rows = TextPipelineQueries.queries("q132_mink_surprisal")(spark, sf)
      .select(col("mink_nll"), col("avg_nll"), col("k"), col("n_bigrams"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) <= r.getDouble(1) + 1e-9,
        "mean of the lowest k surprisals must be <= the overall mean")
      assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(3))
    }
  }

  test("q133: CMS estimates are one-sided (est >= exact, always)") {
    val rows = TextPipelineQueries.queries("q133_cms_audit")(spark, sf)
      .select(col("exact"), col("est")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(0),
      "count-min can only overestimate"))
  }

  test("q134: edit distances respect the threshold and the length bound") {
    val rows = TextPipelineQueries.queries("q134_editdist_join")(spark, sf)
      .select(col("la"), col("lb"), col("led")).collect()
    rows.foreach { r =>
      val led = r.getInt(2)
      assert(led >= 0 && led <= 20, s"led $led outside the banded cap")
      assert(led >= math.abs(r.getLong(0) - r.getLong(1)),
        "edit distance below the length-difference lower bound")
    }
  }

  test("q135: fertility ratios are positive and chars/tok >= 1") {
    val rows = TextPipelineQueries.queries("q135_tokenizer_fertility")(spark, sf)
      .select(col("chars_per_tok"), col("subs_per_tok"), col("toks_per_doc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 1.0, "a token has at least one character")
      assert(r.getDouble(1) > 0.0 && r.getDouble(2) > 0.0)
    }
  }

  test("q136: triangle census matches a brute-force count of the edge set") {
    val e = TextPipelineQueries.queries("q34_minhash_pairs")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val es = e.toSet
    val brute = (for {
      (a, b) <- e
      (b2, c) <- e if b2 == b && es.contains((a, c))
    } yield 1).size
    val row = TextPipelineQueries.queries("q136_dup_triangles")(spark, sf)
      .collect().head
    assert(row.getLong(3) == brute.toLong, "triangle count vs brute force")
    assert(row.getLong(1) == e.length.toLong, "edge count")
    // wedges >= 3 * triangles always (each triangle closes three wedges)
    assert(row.getLong(2) >= 3 * row.getLong(3))
  }
}
