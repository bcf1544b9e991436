package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Plan linting across the ENTIRE gate surface: no query may plan a
  * scale-killer. Catches regressions the value-level gate cannot see —
  * a query can stay hash-correct while silently degrading to a
  * cartesian product or an unbounded nested-loop join.
  *
  * Linted at BOTH sf0.001 and sf0.1: planning is size-driven (file-size
  * stats feed broadcast decisions), so a plan that is clean at the tiny
  * sf can flip strategy at bench scale — the round-7 finding was that
  * sf0.001-only linting left exactly that window open. documents/
  * embeddings only actually scale at sf0.1 (sf0.001 and sf0.01 ship the
  * same 500 rows), so sf0.1 is the smallest sf where derived index
  * geometry and size-driven planning genuinely differ.
  *
  * BroadcastNestedLoopJoin is allowed only where one side is provably
  * bounded by a query constant (the ANN query/centroid sides, ≤ 16
  * rows at any corpus scale) — those are the documented intent, not an
  * accident. */
class PlanGuardSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")

  /** Queries where a nested-loop join against a constant-bounded
    * broadcast side is the intended design. */
  private val nestedLoopAllowed = Set(
    "q38_cosine_topk",   // query vectors (< 5 rows) cross corpus
    "q44_ann_ivf",       // centroids (~sqrt(n), broadcast) and probes (<= 10)
    "q50_ann_recall",    // composes q38/q44, inheriting their bounded sides
    "q188_ivf_incremental", // q44's bounded sides (centroids ~sqrt(n), probes <= 10)
    "q189_semdedup",     // centroids (~sqrt(n), broadcast) cross corpus, as q44
    "q196_ivf_subsplit_serve", // q44's bounded sides + the 1-row size-totals aggregate, broadcast
    "q205_ivf_centroid_refresh", // centroids (~sqrt(n), broadcast) cross corpus as q44, + the 1-row drift-threshold aggregate, broadcast
    "q210_ivf_refreshed_serve", // q205's refresh chain (bounded drift-threshold aggregate) + q44's bounded probe sides, broadcast
    "q190_semdedup_incremental", // q189's assignTo: centroids (~sqrt(n), broadcast) cross corpus
    "q85_pmi_phrases",   // the 1-row N1/N2 scalar-agg totals, broadcast
    "q88_textrank",      // the 1-row node-count scalar aggregate, broadcast
    "q93_bm25",          // the 1-row corpus N/avgdl scalar aggregate, broadcast
    "q94_source_kl",     // the 1-row corpus token total, broadcast
    "q99_pca_power",     // 1-row max/sign scalar aggregates, broadcast
    "q100_hard_negatives", // query vectors (< 5 rows) cross corpus, as q38
    "q101_temperature_resample", // the 1-row corpus-total aggregate, broadcast
    "q106_score_roc",    // the 1-row bucket-total scalar aggregate, broadcast
    "q109_bloom_audit",  // the 1-row filter-geometry (n_ref, m) aggregate, broadcast
    "q112_ivf_balance",  // centroids (~sqrt(n)) as q44, plus the 1-row totals aggregate
    "q115_label_cohesion", // the 1-row corpus-total scalar aggregate, broadcast
    "q117_score_psi",    // the 1-row halves-total scalar aggregate, broadcast
    "q118_type_lift",    // the 1-row distinct-user-count aggregate, broadcast
    "q124_kneser_ney",   // the 1-row bigram-type-total aggregate, broadcast
    "q127_query_likelihood", // the 1-row corpus token total, broadcast (q93 shape)
    "q128_ndcg",         // rank pair-count against the BROADCAST top-10 itself (≤ K rows)
    "q129_dim_truncation",   // composes q38 thrice, inheriting its bounded query side
    "q132_mink_surprisal",   // the 1-row |V| scalar aggregate, broadcast (q81's LM shape)
    "q133_cms_audit",        // the 1-row corpus-token-total aggregate, broadcast
    "q136_dup_triangles",    // three 1-row census aggregates, broadcast
    "q146_boilerplate_origin", // the 1-row corpus-size aggregate, broadcast
    "q150_assoc_rules",  // the 1-row distinct-order-count aggregate, broadcast
    "q154_score_calibration", // the 1-row score min/max aggregate, broadcast
    "q155_idf_drift",    // the 1-row half-sizes aggregate, broadcast
    "q157_split_leakage", // the 1-row pair-total aggregate, broadcast
    "q162_quant_recall", // query vectors (< 5 rows) cross corpus, as q38
    "q163_knn_label_kappa", // the 1-row marginal-product aggregate, broadcast
    "q171_ks_drift",     // the 1-row half-totals aggregate, broadcast
    "q172_split_balance", // the 1-row corpus-total aggregate, broadcast
    "q178_top_suppliers", // the 1-row quarter-total aggregate, broadcast
    "q183_doc_keywords", // the 1-row corpus-count aggregate, broadcast
    "q185_abc_classification") // the 1-row revenue-total aggregate, broadcast (×2)
    // q47_embed_dedup left OUT deliberately: since round 5 its candidate
    // generation is a fully keyed (band, key, sub) equi-join; q39 left out
    // since round 6's multi-band rework — band-key equi-joins throughout.

  /** Memoized per (query, sf): the three lint tests below each sweep the
    * full surface, and deriving a plan is not free — the micro-batch
    * gates EXECUTE their stream to produce the sink relation, so an
    * uncached sweep would run every stream three times per sf. */
  private val planCache =
    scala.collection.mutable.Map.empty[(String, String), SparkPlan]
  private def planOf(name: String, sf: String): SparkPlan =
    planCache.getOrElseUpdate((name, sf),
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)

  /** Single-partition shuffles that funnel UNAGGREGATED data through one
    * task — the plan-shape that turns a distributed query into a
    * single-node one at scale. Two forms are sanctioned: (a) the exchange
    * under a FINAL scalar aggregate, whose input is the partial-aggregate
    * output (≤ one row per upstream partition — bounded by partition
    * count, not data size); (b) nothing else. The gate's final global
    * sorts are rangepartitioning exchanges, not SinglePartition, so they
    * never trip this. */
  private def unsanctionedSinglePartitionExchanges(p: SparkPlan): Seq[String] = {
    val whole = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    whole.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition &&
          !e.child.nodeName.contains("Aggregate") =>
        s"${e.nodeName} <- ${e.child.nodeName}"
    }
  }

  /** Queries sanctioned to plan a GLOBAL (empty-partitioning) window.
    * The sanction (cf. q106's bucket census) is for CONSTANT-bounded
    * window inputs only — a fixed bucket/label/partition-count census
    * whose row count is a query or config constant, never a relation
    * that grows with the corpus. The lint below additionally requires
    * every whitelisted global window to sit over an Aggregate, so the
    * whitelist cannot hide a raw-data global sort. The round-18 audit
    * found exactly the violation this catches: q156's ntile windows over
    * the LINEAR-cardinality per-user aggregate sat unnoticed for six
    * rounds because the single-partition-exchange lint sanctions any
    * aggregate child. */
  private val globalWindowAllowed: Map[String, String] = Map(
    // K-bounded by Spark's rank-limit rewrite: the `rank <= K` filter
    // plans WindowGroupLimit + TakeOrderedAndProject(K) BELOW the window,
    // so the window runs over ≤K rows. The pattern pins that shape — if
    // the rewrite ever stops firing, the child reverts to Sort and the
    // lint fails.
    "q76_bpe_merge_step"   -> "TakeOrderedAndProject",
    "q85_pmi_phrases"      -> "TakeOrderedAndProject",
    "q87_postings"         -> "TakeOrderedAndProject",
    "q88_textrank"         -> "TakeOrderedAndProject",
    "q178_top_suppliers"   -> "TakeOrderedAndProject",
    // Constant-bounded aggregate inputs (a fixed bucket/label/value-domain
    // census, never a per-entity relation):
    "q66_heavy_hitters_bound" -> "aggInput=true", // ~60 (char,count) rows
    "q80_mixture_balance"  -> "aggInput=true",    // |langs| rows (5)
    "q106_score_roc"       -> "aggInput=true",    // ~15 score buckets
    "q171_ks_drift"        -> "aggInput=true",    // length VALUE domain
    "q209_pipeline_curation" -> "aggInput=true",  // |langs| quota rows
    // GlobalRank meta windows: per-range-partition counts/sums, ≤P rows
    // where P = shuffle partitions (a config constant, not a data size).
    "q156_user_rfm"        -> "aggInput=true",
    "q185_abc_classification" -> "aggInput=true")

  /** Global windows in a plan, tagged with whether the window's input
    * subtree is an aggregate (the only shape the whitelist may cover). */
  private def globalWindowHits(p: SparkPlan): Seq[String] = {
    val whole = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    whole.collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty =>
        val agg = w.child.exists(_.nodeName.contains("Aggregate"))
        s"${w.nodeName}(aggInput=$agg) <- ${w.child.nodeName}"
    }
  }

  for (sf <- sfs) {
    val sfName = sf.split('/').last

    test(s"global windows only where sanctioned, and only over aggregates [$sfName]") {
      val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val hits = globalWindowHits(planOf(name, sf))
        if (hits.isEmpty) None
        else if (!globalWindowAllowed.contains(name))
          Some(s"$name UNSANCTIONED: ${hits.mkString("; ")}")
        else {
          val pat = globalWindowAllowed(name)
          val bad = hits.filterNot(_.contains(pat))
          if (bad.nonEmpty)
            Some(s"$name sanctioned for '$pat' but planned: ${bad.mkString("; ")}")
          else None
        }
      }
      assert(offenders.isEmpty,
        s"global-window lint: ${offenders.mkString("\n")}")
    }

    test(s"no gate query plans a CartesianProduct [$sfName]") {
      val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
        planOf(name, sf).toString.contains("CartesianProduct")
      }
      assert(offenders.isEmpty, s"cartesian products in: $offenders")
    }

    test(s"BroadcastNestedLoopJoin only where a side is constant-bounded [$sfName]") {
      val offenders = SparkEntry.queries.keys.toSeq.sorted
        .filterNot(nestedLoopAllowed)
        .filter(name => planOf(name, sf).toString.contains("BroadcastNestedLoopJoin"))
      assert(offenders.isEmpty, s"unintended nested-loop joins in: $offenders")
    }

    test(s"no unaggregated single-partition Exchange in any gate plan [$sfName]") {
      val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val hits = unsanctionedSinglePartitionExchanges(planOf(name, sf))
        if (hits.isEmpty) None else Some(s"$name: ${hits.mkString("; ")}")
      }
      assert(offenders.isEmpty,
        s"single-partition exchanges over unaggregated data: $offenders")
    }
  }

  /** The static lint above inspects the INITIAL plan; under AQE the final
    * plan can differ (runtime-stat-driven join demotion, skew splitting).
    * EXECUTE the join-heavy dedup family plus the two window-heavy gates
    * at sf0.1 and lint the FINAL adaptive plan — join shape AND the
    * single-partition-exchange rule (an AQE coalesce that collapsed a
    * window shuffle to one partition would pass the static lint and still
    * serialize the query at scale). Kept to this set: it carries every
    * join shape the gate uses (banded equi-joins, salted triangles,
    * anti/left joins) and the two heaviest window partitionings; executing
    * all 53 at sf0.1 in the shared small-session would turn a lint into a
    * second benchmark. */
  test("AQE final plans at sf0.1 stay clean for the dedup + window families") {
    val names = Seq("q34_minhash_pairs", "q47_embed_dedup",
      "q51_dedup_incremental", "q52_embed_dedup_incremental",
      "q08_window_running", "q41_session_window",
      // round-11 join shapes: the as-of union+window and the
      // range-predicate interval join
      "q56_asof_join", "q57_interval_join")
    val sf = "/root/testdata/sf0.1"
    val offenders = names.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan
      val finalPlan = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      val spx = unsanctionedSinglePartitionExchanges(plan)
      val bad =
        (if (finalPlan.contains("CartesianProduct")) Seq("CartesianProduct") else Nil) ++
        (if (finalPlan.contains("BroadcastNestedLoopJoin")) Seq("BroadcastNestedLoopJoin") else Nil) ++
        spx.map(s => s"single-partition exchange [$s]")
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty, s"AQE-final offenders: $offenders")
  }

  /** Every dim-table scan (by file name) that can reach the plan root
    * without crossing a BroadcastExchange — i.e. dim rows that would flow
    * through a shuffle or the streamed side of a join at scale. */
  private def dimScansNotUnderBroadcast(p: SparkPlan,
                                        dims: Set[String]): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    def walk(n: SparkPlan, underB: Boolean): Seq[String] = {
      val here = n match {
        case f: FileSourceScanExec if !underB =>
          dims.filter(d => f.metadata.get("Location").exists(_.contains(d))).toSeq
        case _ => Nil
      }
      val childB = underB || n.isInstanceOf[BroadcastExchangeExec]
      here ++ n.children.flatMap(walk(_, childB))
    }
    walk(p, underB = false)
  }

  /** The TPC-H-shape composites (q176–q185) carry the three plan
    * properties that make them 100×-scale-safe, asserted DIRECTLY so a
    * refactor or an AQE/statistics flip cannot silently lose them:
    * (a) date-range predicates live in the FACT SCAN's pushed filters —
    * below every join, partition-prunable at scale; (b) fact/dim scans
    * read only the projected columns; (c) the constant-bounded dims
    * (nation/region) reach the plan only through BroadcastExchange — a
    * plan that shuffles nation rows or streams them into a join has lost
    * the snowflake shape. Linted at both sfs like the global tests:
    * planning is size-driven. */
  for (sf <- sfs) {
    val sfName = sf.split('/').last

    test(s"TPC-H composites: date filters at the scan, pruned columns, dims broadcast-only [$sfName]") {
      def unwrapped(n: String): SparkPlan = planOf(n, sf) match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      def str(n: String): String = unwrapped(n).toString

      // (a) date predicates pushed into the fact scans
      assert(str("q176_pricing_summary").contains("LessThanOrEqual(l_shipdate"),
        "q176: l_shipdate cutoff not pushed to the lineitem scan")
      val s177 = str("q177_regional_revenue")
      assert(s177.contains("GreaterThanOrEqual(o_orderdate") &&
             s177.contains("LessThan(o_orderdate"),
        "q177: o_orderdate range not pushed to the orders scan")
      val s178 = str("q178_top_suppliers")
      assert(s178.contains("GreaterThanOrEqual(l_shipdate") &&
             s178.contains("LessThan(l_shipdate"),
        "q178: l_shipdate quarter not pushed to the lineitem scan")
      val s179 = str("q179_order_priority")
      assert(s179.contains("GreaterThanOrEqual(o_orderdate") &&
             s179.contains("LessThan(o_orderdate"),
        "q179: o_orderdate range not pushed to the orders scan")

      // (b) column pruning reaches the scans
      assert(str("q184_brand_trend")
          .contains("ReadSchema: struct<p_partkey:bigint,p_brand:string>"),
        "q184: part scan reads more than (p_partkey, p_brand)")
      assert(str("q185_abc_classification")
          .contains("ReadSchema: struct<l_partkey:bigint,l_extendedprice:double,l_discount:double>"),
        "q185: lineitem scan reads more than the revenue columns")

      // (c) nation/region rows flow only through broadcast
      for (q <- Seq("q177_regional_revenue", "q180_market_share")) {
        val bad = dimScansNotUnderBroadcast(unwrapped(q),
          Set("nation.parquet", "region.parquet"))
        assert(bad.isEmpty,
          s"$q: constant dims outside broadcast subtrees: $bad")
      }
    }
  }

  /** Same static lint at the XL tier (TESTDATA_XL.md): 25k docs/10k
    * embeddings is the second point where corpus-derived index geometry
    * (planes 9, centroids 100, active Lloyd sampling) and size-driven
    * planning genuinely differ from every driver sf. Conditional on the
    * engine-generated tier existing — `runMain graft.GenCorpusXl` arms
    * it. Static-only (no execution): the full AQE execution pass at this
    * size belongs to the slope/bench runs, not the unit suite. */
  test("static plan lint stays clean at the XL tier (when generated)") {
    assume(new java.io.File("testdata_xl/embeddings.parquet").exists(),
      "testdata_xl not generated — runMain graft.GenCorpusXl")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = planOf(name, "testdata_xl")
      val s = plan.toString
      val bad =
        (if (s.contains("CartesianProduct")) Seq("CartesianProduct") else Nil) ++
        (if (s.contains("BroadcastNestedLoopJoin") && !nestedLoopAllowed(name))
           Seq("BroadcastNestedLoopJoin") else Nil) ++
        unsanctionedSinglePartitionExchanges(plan)
          .map(x => s"single-partition exchange [$x]")
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty, s"XL-tier offenders: $offenders")
  }
}
