package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Mathematical-contract pins for the q137-q142 corpus-audit family.
  * Run at sf0.01 (the driver's gate tier). */
class CorpusAuditFamilySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("q137: diversity indices live in their ranges") {
    val rows = TextPipelineQueries.queries("q137_ngram_diversity")(spark, sf)
      .select(col("simpson"), col("top_share"), col("ttr"), col("n_grams"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0, "simpson in [0,1]")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0, "ttr in (0,1]")
      assert(r.getDouble(1) >= 1.0 / r.getLong(3), "top share >= uniform floor")
    }
  }

  test("q138: Hill alpha is positive with the pinned k = min(50, n/10)") {
    val rows = TextPipelineQueries.queries("q138_hill_tail")(spark, sf)
      .select(col("n"), col("k"), col("alpha")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == math.min(50L, r.getLong(0) / 10))
      if (!r.isNullAt(2)) assert(r.getDouble(2) > 0.0, "tail index positive")
    }
  }

  test("q139: the budgeted vocab leaves genuine OOV mass on the eval half") {
    val rows = TextPipelineQueries.queries("q139_oov_projection")(spark, sf)
      .select(col("eval_tokens"), col("oov_tokens"), col("oov_rate")).collect()
    assert(rows.nonEmpty)
    // the 30-type synthetic vocabulary minus a top-20 budget MUST leak
    // OOV — an all-zero column would mean the anti-join matched nothing,
    // i.e. the degenerate bug this pin exists to catch
    assert(rows.map(_.getLong(1)).sum > 0, "no OOV mass at all")
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), "OOV mass bounded by eval mass")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("q140: label-pair census is id-ordered and counts the confirmed pairs") {
    val rows = VectorQueries.queries("q140_crosslabel_neardup")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) <= r.getLong(1), "label_a <= label_b")
      assert(r.getBoolean(3) == (r.getLong(0) != r.getLong(1)))
      assert(r.getLong(2) > 0)
    }
  }

  test("q141: latency percentiles are monotone per stage") {
    val rows = RelationalQueries.queries("q141_funnel_latency")(spark, sf)
      .select(col("stage"), col("p50_s"), col("p75_s"), col("p90_s")).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("view_to_click", "click_to_purchase"))
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3),
        "p50 <= p75 <= p90")
    }
  }

  test("q142: where SNM and blocked Jaccard see the same pair, the values agree") {
    val q37 = TextPipelineQueries.queries("q37_trigram_jaccard")(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("jacc")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val snm = TextPipelineQueries.queries("q142_sorted_neighborhood")(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("jacc")).collect()
    assert(snm.nonEmpty)
    var common = 0
    snm.foreach { r =>
      assert(r.getDouble(2) >= 0.5, "below the confirm threshold")
      q37.get((r.getLong(0), r.getLong(1))).foreach { j =>
        common += 1
        assert(math.abs(j - r.getDouble(2)) < 1e-6,
          "the two dedup passes disagree on a shared pair's Jaccard")
      }
    }
    assert(common > 0, "no overlap between SNM and blocked-Jaccard pairs")
  }

  test("q144: dup fractions are bounded and the planted exact copies hit 1.0") {
    val rows = TextPipelineQueries.queries("q144_gram_dup_fraction")(spark, sf)
      .select(col("n_grams"), col("n_dup"), col("dup_frac")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // the corpus plants exact text copies (slot-99 rule): a verbatim copy
    // shares every 8-gram with its source, so SOME doc must reach 1.0
    assert(rows.exists(_.getDouble(2) == 1.0), "no fully-duplicated doc found")
  }

  test("q145: the size histogram partitions the clustered docs") {
    val hist = TextPipelineQueries.queries("q145_cluster_sizes")(spark, sf)
      .collect()
    assert(hist.nonEmpty)
    hist.foreach { r =>
      assert(r.getLong(0) >= 2, "a component has at least two members")
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
    }
    val clustered = TextPipelineQueries.queries("q34_minhash_pairs")(spark, sf)
      .select(col("doc_a")).union(
        TextPipelineQueries.queries("q34_minhash_pairs")(spark, sf)
          .select(col("doc_b")))
      .distinct().count()
    assert(hist.map(_.getLong(2)).sum == clustered,
      "histogram mass must equal the distinct docs appearing in dup pairs")
  }
}
