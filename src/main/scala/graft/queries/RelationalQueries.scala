package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Num._

/** General relational surface over the TPC-H-ish corpus: scans with
  * pushdown, aggregations, joins of every flavor, windows, top-k, set ops.
  *
  * The reference (/root/reference/src/etl.js) has no relational surface at
  * all — every aggregate is a whole-file scalar reduction (SURVEY.md §2.4-2.6
  * marks joins/windows/sorts "absent"). These queries are the engine's
  * general-purpose layer, built purely from Catalyst-optimized built-ins.
  *
  * Determinism rules (see graft.functions.Num): double sums go through
  * fixed-point longs; every output is ordered by a unique key.
  */
object RelationalQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style grouped aggregation: one shuffle, partial aggregation
    // map-side; all sums fixed-point for cross-engine determinism.
    "q01_groupby_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          fixedSum(col("l_quantity"), 2).as("sum_qty"),
          fixedSum(col("l_extendedprice"), 2).as("sum_base_price"),
          fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          fixedAvg(col("l_quantity"), 2).as("avg_qty"),
          fixedAvg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q6-style selective scan: both filters and the 2-column read
    // schema reach the parquet scan (PushedFilters in explain).
    "q02_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(fixedSum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    // Hash join on the customer key. No broadcast hint: customer grows
    // linearly with SF (it would OOM the driver at the 100 TB design
    // point), so AQE decides shuffle-vs-broadcast from runtime stats.
    "q03_join_broadcast" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             fixedSum(col("o_totalprice"), 2).as("sum_totalprice"))
        .orderBy(col("c_mktsegment"))
    }),

    // TPC-H Q5-style 6-way join. Only the FIXED-size dimensions
    // (nation: 25 rows, region: 5 rows at every SF) carry broadcast hints;
    // customer/supplier grow linearly with SF, so AQE picks their join
    // strategy from runtime stats. The lineitem-orders join shuffles on the
    // order key — the one unavoidable shuffle at 100 TB, keyed on the join
    // key so AQE can split skew.
    "q04_join_multi" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // Left-semi join = EXISTS: customers that placed at least one 'F' order.
    "q05_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Left-anti join = NOT EXISTS: customers with no orders at all.
    "q06_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Ranking window: top-3 orders per customer. Sort key includes
    // o_orderkey so row_number is deterministic under ties.
    "q07_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
                round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Running-total window: cumulative spend per customer in cents (exact
    // integer accumulation → deterministic double at the end).
    "q08_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("running_spend", (sum(col("cents")).over(w) / 100.0).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Top-k: global orderBy + limit plans as TakeOrderedAndProject — no full
    // sort, per-partition heaps then a driver merge. Deterministic tiebreak.
    "q09_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"),
                round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // Exact distinct counts (SURVEY §2.5 A2 requires exact, not approx).
    "q10_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Set operations: nations that have customers vs nations that have
    // suppliers — union / intersect / except distinct semantics. Computed
    // in ONE pass: tag each side, aggregate membership flags per key, then
    // derive all three ops from the flags (union = any, intersect = both,
    // except = left only). One scan per input and one shuffle, vs the naive
    // six scans of running the three set operators independently.
    "q11_setops" -> ((s, d) => {
      val cn = Tables.customer(s, d)
        .select(col("c_nationkey").cast("int").as("nationkey"),
                lit(1).as("in_c"), lit(0).as("in_s"))
      val sn = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("int").as("nationkey"),
                lit(0).as("in_c"), lit(1).as("in_s"))
      cn.unionAll(sn)
        .groupBy(col("nationkey"))
        .agg(max(col("in_c")).as("in_c"), max(col("in_s")).as("in_s"))
        .select(col("nationkey"), explode(array_compact(array(
          lit("union"),
          when(col("in_c") === 1 && col("in_s") === 1, lit("intersect")),
          when(col("in_c") === 1 && col("in_s") === 0, lit("except"))))).as("op"))
        .select(col("op"), col("nationkey"))
        .orderBy(col("op"), col("nationkey"))
    }),

    // Conditional-count buckets in one pass (SURVEY §2.5 A3: the reference's
    // fixed predicate buckets, e.g. top3/top10/top100 and 4xx/5xx counts).
    "q12_cond_buckets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("l_quantity") <= 3, 1).otherwise(0)).as("qty_le3"),
          sum(when(col("l_quantity") <= 10, 1).otherwise(0)).as("qty_le10"),
          sum(when(col("l_quantity") <= 25, 1).otherwise(0)).as("qty_le25"),
          sum(when(col("l_quantity").between(40, 49), 1).otherwise(0)).as("qty_40s"),
          sum(when(col("l_quantity") >= 50, 1).otherwise(0)).as("qty_ge50"))
        .orderBy(col("l_linestatus"))
    }),

    // Lower-nearest-rank p75 (SURVEY §2.5 A7: index floor(0.75*(n-1)) of the
    // sorted values — NOT interpolated, NOT approximate). Implemented as a
    // distributed sort-based window per group: no collect, no giant arrays,
    // scales to arbitrary group sizes.
    "q13_p75_nearest_rank" -> ((s, d) => {
      graft.functions.Percentiles.nearestRankByGroup(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_extendedprice", 0.75)
        .select(col("l_returnflag"), round(col("p75"), 2).as("p75"))
        .orderBy(col("l_returnflag"))
    }),

    // Approximate percentile under a HARD accuracy gate (the q58 pattern:
    // sketches are only usable at 100 TB if their error is governed, so
    // the gate asserts the bound instead of the sketch value). Spark's
    // percentile_approx (Greenwald-Khanna) guarantees rank error <=
    // n/accuracy; the gate brackets the approx value between the EXACT
    // nearest-rank quantiles at p +/- 3/accuracy — if the sketch ever
    // drifts past its contract, within_bound flips false and the oracle
    // hash-compare fails. The exact p50 column itself must match DuckDB.
    "q61_approx_percentile_bound" -> ((s, d) => {
      val acc = 1000
      val li = Tables.lineitem(s, d)
      // The three exact bracket quantiles (p ± 3/accuracy and p itself)
      // ride ONE histogram pass via the named multi-quantile API — three
      // separate nearestRankByGroup calls cost three corpus scans for the
      // same rows (the round-13 q61 growth). Names are explicit because
      // 0.497/0.5/0.503 all round to the same default `p50` label.
      val exact = graft.functions.Percentiles.nearestRanksByGroupNamed(
        li, Seq("l_returnflag"), "l_extendedprice",
        Seq(0.5 - 3.0 / acc -> "lo", 0.5 -> "exact_p50", 0.5 + 3.0 / acc -> "hi"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc))
          .as("approx"))
      exact.join(approx, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(col("exact_p50"), 2).as("exact_p50"),
          (col("approx") >= col("lo") && col("approx") <= col("hi"))
            .as("within_bound"))
        .orderBy(col("l_returnflag"))
    }),

    // GROUP BY + HAVING: parts appearing in many lineitems.
    "q14_having" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), fixedSum(col("l_quantity"), 2).as("sum_qty"))
        .filter(col("n") >= 20)
        .orderBy(col("l_partkey"))
    }),

    // ROLLUP hierarchy totals (grouping-set nulls replaced by sentinels so
    // sort keys are never NULL — avoids engine NULL-ordering divergence).
    "q15_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), fixedSum(col("o_totalprice"), 2).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority"))
    }),

    // Scalar string/math surface (SURVEY §2.7): lower/trim/substring/
    // concat/length/regexp + greatest/least/round, all codegen'd built-ins.
    "q16_scalar_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          lower(col("p_brand")).as("brand_lower"),
          substring(col("p_type"), 1, 6).as("type_prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          greatest(col("p_size"), lit(10)).as("size_floor10"),
          // price*1.1 has 3 true decimals; fixed-point at 3dp avoids the
          // cross-engine round-half divergence on arbitrary doubles.
          (round(col("p_retailprice") * 1100).cast("long") / 1000.0).as("price_bump"))
        .orderBy(col("p_partkey"))
    }),

    // Date/time kit over timestamps: truncation, extraction, date math.
    // Timestamps leave the query as strings so both engines serialize
    // identically.
    "q17_date_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"),
                 month(col("o_orderdate")).cast("int").as("o_month"))
        .agg(count(lit(1)).as("n"), fixedSum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("o_year"), col("o_month"))
    }),

    // JSON extraction from events.props (SURVEY §2.7 json class; reference
    // navigates Lighthouse JSON by path — same capability over a column).
    // from_json with a one-field schema, not get_json_object: the typed
    // parse is ~1.5x faster warm (0.76s vs 1.2s at sf0.1, BASELINE_NOTES.md
    // r9 entry) because the path-query variant re-tokenizes the document
    // per call while from_json parses straight into an unsafe row.
    "q18_json" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      Tables.events(s, d)
        .select(col("event_id"),
                from_json(col("props"), StructType(Seq(StructField("k", LongType))))
                  .getField("k").as("k"))
        .filter(col("k").isNotNull && col("k") % 10 === 0)
        .orderBy(col("event_id"))
    }),

    // NULL-handling kit: coalesce / null-safe aggregation over a column made
    // artificially sparse (every 3rd acctbal nulled) — mirrors the
    // reference's ??-coalescing (SURVEY §2.5 A9) on a relational surface.
    "q19_null_handling" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("bal", when(col("c_custkey") % 3 === 0, lit(null).cast("double"))
                             .otherwise(col("c_acctbal")))
        .groupBy(col("c_mktsegment"))
        .agg(count(col("bal")).as("n_nonnull"),
             count(lit(1)).as("n_rows"),
             fixedSum(coalesce(col("bal"), lit(0.0)), 2).as("sum_bal_coalesced"))
        .orderBy(col("c_mktsegment"))
    }),

    // CUBE: all grouping-set combinations (complements q15's ROLLUP).
    "q43_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), fixedSum(col("o_totalprice"), 2).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy(col("status"), col("priority"))
    }),

    // PIVOT (long→wide reshape): per-cohort counts of each event type as
    // columns. The pivot values are PINNED literals — with an explicit
    // list Spark skips the extra distinct-discovery job and the output
    // schema is static, which is the only sane form at 100 TB (a
    // discovered pivot both scans twice and can explode the schema).
    // Empty cells are coalesced to 0 so the wide table is join-ready.
    "q60_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, d)
        .withColumn("cohort", pmod(col("user_id"), lit(10)))
        .groupBy(col("cohort"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("cohort") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("cohort"))
    }),

    // UNPIVOT (wide→long reshape, the inverse of q60): per-returnflag
    // fixed-point sums of three measures, melted to (key, measure, value)
    // rows with Dataset.unpivot. The reshape runs AFTER the aggregation, so
    // the melt touches |keys|·|measures| rows, never the fact table — the
    // only sane order at 100 TB (melting the fact table first would
    // triple its row count before the shuffle).
    "q64_unpivot" -> ((s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          fixedSum(col("l_quantity"), 2).as("sum_qty"),
          fixedSum(col("l_extendedprice"), 2).as("sum_price"),
          fixedSum(col("l_discount"), 2).as("sum_disc"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // GROUPING SETS (the general form of q15's rollup / q43's cube): the
    // two single-dimension marginals plus the grand total in ONE pass —
    // Spark expands the sets map-side and aggregates once, vs. the naive
    // 3-scan UNION ALL. grouping() disambiguates a real 'ALL' value from
    // the set-placeholder NULL (cast to int: Spark emits tinyint, DuckDB
    // emits a wider int — pin the narrowest common type).
    "q65_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n"),
          fixedSum(col("l_extendedprice"), 2).as("sum_price"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"), col("n"), col("sum_price"))
        .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))
    }),

    // Z-ORDER layout key (multi-dimensional clustering for scan locality):
    // the Morton interleave of (user, hour) — the key a 100 TB events
    // table would be range-partitioned and sorted by so that BOTH
    // per-user and per-time-range scans prune contiguous file ranges.
    // The gate pins the bit-exact key and the induced order; zblock
    // (top 16 bits) is the file-granularity prefix a writer would split
    // on. Pure per-row long arithmetic (graft.functions.ZOrder), no
    // shuffle but the presentation sort — which IS the layout operation.
    "q73_zorder_key" -> ((s, d) => {
      val a = pmod(col("user_id"), lit(65536L))
      val b = pmod(expr("unix_micros(ts) DIV 3600000000"), lit(65536L))
      Tables.events(s, d)
        .select(col("event_id"), a.as("dim_user"), b.as("dim_hour"),
          graft.functions.ZOrder.zkey(a, b).as("zkey"))
        .withColumn("zblock", shiftright(col("zkey"), 16))
        .orderBy(col("zkey"), col("event_id"))
    }),

    // Funnel analysis (ordered-step conversion): per user, the earliest
    // view, the earliest click AFTER that view, the earliest purchase
    // AFTER that click — the sequential-dependency pattern that does NOT
    // decompose into one aggregation. Three conditional min-aggs chained
    // by user-keyed equi-joins: each stage shuffles on user_id only, and
    // every stage's right side is the per-user stage table (|users| rows,
    // far under the fact table at any scale). Timestamps exit as
    // epoch_us longs (the q56/q57 convention for cross-engine hashing).
    "q74_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.join(c, Seq("user_id"), "left_outer")
        .join(p, Seq("user_id"), "left_outer")
        .select(col("user_id"),
          unix_micros(col("t_view")).as("t_view_us"),
          unix_micros(col("t_click")).as("t_click_us"),
          unix_micros(col("t_purchase")).as("t_purchase_us"),
          (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
                  + when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
        .orderBy(col("user_id"))
    }),

    // Lenient numeric cast parity (SURVEY §2.2 P2 toNum): strip junk chars,
    // cast, NULL on malformed — applied to customer names ("Customer#0001"
    // → 1.0) exactly as both engines' regexp_replace+cast evaluate it.
    "q20_tonum" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"), toNum(col("c_name")).as("name_num"))
        .orderBy(col("c_custkey"))
    }),

    // Markov transition matrix over event streams (the sequence-model
    // companion to q74's funnel): per-user next-event via ONE lead()
    // window (partitioned by user — never global), transition counts by
    // one keyed shuffle agg, and per-source totals ride a window over
    // that |event_types|²-bounded AGGREGATE — the sanctioned shape.
    // Both engines order by (µs timestamp, event_id): the ns→µs
    // truncation is identical (Tables.events DIV 1000 ≡ DuckDB's
    // internal cast), so window ties break the same way.
    "q91_event_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
      val t = pairs.groupBy(col("event_type").as("src_type"), col("nxt").as("dst_type"))
        .agg(count(lit(1)).as("n"))
      t.withColumn("n_src", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src_type"))))
        .select(col("src_type"), col("dst_type"), col("n"), col("n_src"),
          round(col("n").cast("double") / col("n_src"), 6).as("p"))
        .orderBy(col("src_type"), col("dst_type"))
    }),

    // CUSUM drift detection over the event stream (the pipeline-
    // observability primitive: "did this event type's hourly rate shift,
    // and when?"): per-(type, hour) counts are one keyed agg; the
    // deviation-from-mean is computed in EXACT integer arithmetic
    // (n·n_hours − total — the rational mean cleared of its denominator,
    // so no float drift enters the cumulative sum), CUSUM is a running
    // sum window PARTITIONED BY TYPE over the hour-level aggregate
    // (|types|·|hours| rows, never raw events), and the peak |CUSUM|
    // hour — the changepoint estimate — is a rank window on the same
    // aggregate. Output is |types| rows; only the final drift score
    // divides into a double, rounded to 6 dp on both engines.
    "q110_cusum_drift" -> ((s, d) => {
      val hb = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val tot = hb.groupBy(col("event_type"))
        .agg(sum(col("n")).as("total"), count(lit(1)).as("nh"))
      val cs = hb.join(tot, Seq("event_type"))
        .withColumn("cusum", sum(col("n") * col("nh") - col("total")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("hr"))))
      cs.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"))
            .orderBy(abs(col("cusum")).desc, col("hr"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("total").as("n_events"),
          col("nh").as("n_hours"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("peak_hour"),
          col("cusum").as("peak_cusum_fp"),
          round(abs(col("cusum")).cast("double") / (col("total") * col("nh")), 6)
            .as("drift"))
        .orderBy(col("event_type"))
    }),

    // Cohort retention matrix (the engagement view every event pipeline
    // ships): cohort = each user's first active day, cell (cohort, day
    // offset) = distinct users from that cohort active that day. The
    // corpus collapses to the DISTINCT (user, day) relation first (one
    // keyed agg, |users|·|days|-bounded), the cohort day is a per-user
    // min (keyed agg on user), and the matrix is one keyed agg over the
    // joined compact relations — |days|²-bounded output, no window over
    // raw events at any scale. All-integer until the final ratio.
    "q113_retention" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
      val sizes = cohort.groupBy(col("d0")).agg(count(lit(1)).as("cohort_n"))
      ud.join(cohort, Seq("user_id"))
        .groupBy(col("d0"), datediff(col("day"), col("d0")).as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(sizes, Seq("d0"))
        .select(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_active"), col("cohort_n"),
          round(col("n_active").cast("double") / col("cohort_n"), 6)
            .as("retention"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Last-touch attribution (the marketing twin of q74's funnel): each
    // purchase is credited to the user's most recent PRECEDING
    // non-purchase event. One last(ignoreNulls) window per user over
    // (ts, event_id) — the same deterministic ordering as q91 — with a
    // strictly-preceding row frame, then one keyed agg over |event
    // types| rows. Revenue sums ride 1e-2 fixed-point longs (the q01
    // cents discipline) so the total is order-independent and
    // hash-exact. Window is user-partitioned — never global.
    "q116_attribution" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("attr", last(
          when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("attr"), lit("none")).as("attr_type"))
        .agg(count(lit(1)).as("n_purchases"),
          (sum(expr("cast(round(value * 100) as bigint)")) / 100.0)
            .as("revenue"))
        .orderBy(col("attr_type"))
    }),

    // Event-type co-occurrence lift (market-basket association over the
    // behavioral log): for each unordered type pair, lift =
    // P(a,b) / (P(a)·P(b)) over users. The corpus collapses to the
    // DISTINCT (user, type) relation (≤ |users|·|types| rows), the pair
    // relation is a user-keyed self-equi-join of that compact relation
    // (≤ C(|types|,2) rows per user — constant-bounded fan-out), and
    // the per-type totals and the 1-row user count broadcast back
    // (whitelisted scalar-agg NLJ, the q88 shape). Output ≤ C(|types|,2)
    // rows; integers exact until the final lift division.
    "q118_type_lift" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val nU = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val per = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
      ut.as("a").join(ut.as("b"), "user_id")
        .filter(col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
        .join(per.select(col("event_type").as("type_a"),
          col("n_t").as("n_a")), Seq("type_a"))
        .join(per.select(col("event_type").as("type_b"),
          col("n_t").as("n_b")), Seq("type_b"))
        .join(broadcast(nU), expr("true"))
        .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"),
          col("n_b"), col("n_users"),
          round(col("n_both").cast("double") * col("n_users")
            / (col("n_a") * col("n_b")), 6).as("lift"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Gap-based sessionization (the boundary operator q74/q91/q113 assume
    // upstream: a session breaks when a user's inter-event gap exceeds
    // 30 min): ONE lag() + ONE cumulative-sum window, both partitioned BY
    // USER over the unique (µs, event_id) order — user-bounded tasks,
    // never a global sort — then a keyed per-session agg. All gap/
    // duration arithmetic is exact µs integers (the ns→µs truncation is
    // identical cross-engine, see q91), so session boundaries can never
    // drift between engines.
    "q130_sessionization" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("brk", when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("brk")).over(w))
      ev.groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          min(col("us")).as("min_us"), max(col("us")).as("max_us"),
          min(col("event_id")).as("first_event"))
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("n_types"), expr("(max_us - min_us) div 1000000").as("dur_s"),
          col("first_event"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // Funnel conversion-latency percentiles (q74's funnel + the exact
    // lower-nearest-rank percentile idiom of q13/q82): per-user stage
    // gaps in exact integer seconds, then p50/p75/p90 per stage via a
    // stage-partitioned rank window over the unique (gap_s, user_id)
    // order — rank selection is pure integer arithmetic ((q·(n−1)) div
    // 100 + 1), no float quantile ever computed. Two stages → two
    // window partitions, each user-population-bounded.
    "q141_funnel_latency" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      val g1 = c.join(v, Seq("user_id")).select(lit("view_to_click").as("stage"),
        col("user_id"),
        expr("(unix_micros(t_click) - unix_micros(t_view)) div 1000000").as("gap_s"))
      val g2 = p.join(c, Seq("user_id")).select(lit("click_to_purchase").as("stage"),
        col("user_id"),
        expr("(unix_micros(t_purchase) - unix_micros(t_click)) div 1000000").as("gap_s"))
      val g = g1.union(g2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("stage")).orderBy(col("gap_s"), col("user_id"))
      val r = g.withColumn("rn", row_number().over(w))
      val tot = g.groupBy(col("stage")).agg(count(lit(1)).as("n"))
      r.join(tot, Seq("stage"))
        .groupBy(col("stage"), col("n"))
        .agg(
          max(when(col("rn") === expr("(50 * (n - 1)) div 100 + 1"),
            col("gap_s"))).as("p50_s"),
          max(when(col("rn") === expr("(75 * (n - 1)) div 100 + 1"),
            col("gap_s"))).as("p75_s"),
          max(when(col("rn") === expr("(90 * (n - 1)) div 100 + 1"),
            col("gap_s"))).as("p90_s"))
        .orderBy(col("stage"))
    }),

    // Market-basket association rules over order baskets (the mixture-
    // curation primitive applied to relational data: which item pairs
    // co-occur beyond chance?): pair candidates come from a self-join
    // keyed on the BASKET id — per-key fanout is the per-order item
    // count (≤ 7 in TPC-H, bounded by basket size at any corpus scale),
    // so the pair relation grows linearly in orders, never quadratically
    // in items. Support/confidence/lift are exact int64 counts divided
    // into doubles once; top-20 by support is a TakeOrdered on the
    // pair-bounded aggregate with (pa, pb) tie-break.
    "q150_assoc_rules" -> ((s, d) => {
      // r19 A/B note: an eager localCheckpoint of the distinct (order,
      // part) relation (four consumers) measured NEUTRAL isolated (~1.65 s
      // / 11 jobs either way — the runtime already shares the distinct's
      // exchange across branches); kept the simpler recompute shape.
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val supp = items.groupBy(col("pk")).agg(count(lit(1)).as("supp"))
      val nOrders = items.agg(countDistinct(col("ok")).as("n_orders"))
      val pairs = items.as("a")
        .join(items.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("supp_ab"))
      pairs
        .join(supp.select(col("pk").as("pa"), col("supp").as("supp_a")), Seq("pa"))
        .join(supp.select(col("pk").as("pb"), col("supp").as("supp_b")), Seq("pb"))
        .join(broadcast(nOrders), expr("true"))
        .orderBy(col("supp_ab").desc, col("pa"), col("pb")).limit(20)
        .select(col("pa"), col("pb"), col("supp_ab"), col("supp_a"), col("supp_b"),
          // Both rule directions: (pa, pb) is the arbitrary partkey-id order,
          // so publishing only supp_ab/supp_a would pin "confidence" to an
          // id-order accident. conf_ab = P(pb|pa), conf_ba = P(pa|pb).
          round(col("supp_ab").cast("double") / col("supp_a"), 6).as("conf_ab"),
          round(col("supp_ab").cast("double") / col("supp_b"), 6).as("conf_ba"),
          round(col("supp_ab").cast("double") * col("n_orders") /
            (col("supp_a") * col("supp_b")), 6).as("lift"))
        .orderBy(col("supp_ab").desc, col("pa"), col("pb"))
    }),

    // RFM user segmentation (the audience-curation primitive: quintile-
    // code every user by recency/frequency/monetary, then census the
    // segments): the corpus collapses to one user-level aggregate
    // (monetary through 1e-2 fixed-point longs, the q01 cents
    // discipline). The per-user aggregate has LINEAR cardinality, so a
    // global ntile(5) window over it is a single-task sort of every user
    // at scale (the round-18 audit finding); instead each dimension gets
    // an exact global rank from operators/GlobalRank (range-partition +
    // in-partition sort + broadcast prefix-sum offsets — no single-
    // partition exchange over the users) and the quintile code is
    // NTILE's remainder arithmetic applied to (rank, n) — bit-identical
    // to the window, user_id tie-breaks keeping every quintile edge
    // deterministic on both engines. Output is the ≤ 125-row census.
    "q156_user_rfm" -> ((s, d) => {
      import graft.operators.GlobalRank
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("value"))
      val u = ev.groupBy(col("user_id")).agg(
        max(col("ts")).as("t_last"),
        count(lit(1)).as("freq"),
        sum(round(col("value") * 100).cast("long")).as("mon_c"))
      val r1 = GlobalRank.withRankAndTotal(u,
        Seq(to_date(col("t_last")).desc, col("user_id")), "__rr", "__n")
      val r2 = GlobalRank.withRankAndTotal(r1,
        Seq(col("freq").desc, col("user_id")), "__fr", "__n2")
      val r3 = GlobalRank.withRankAndTotal(r2,
        Seq(col("mon_c").desc, col("user_id")), "__mr", "__n3")
      val coded = r3
        .withColumn("r_q", GlobalRank.ntileFromRank(col("__rr"), col("__n"), 5))
        .withColumn("f_q", GlobalRank.ntileFromRank(col("__fr"), col("__n"), 5))
        .withColumn("m_q", GlobalRank.ntileFromRank(col("__mr"), col("__n"), 5))
      coded.groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("freq")).as("n_events"),
          round((sum(col("mon_c")) / lit(100.0)), 2).as("monetary"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    }),

    // Weekly retention cohorts (q113's daily matrix re-keyed to the week
    // granularity a growth dashboard actually reads — 7× denser cells,
    // 1/49th the output — and with NO engine date functions in the key:
    // calendar weeks are exact integer epoch-week indices, µs div 7-day
    // µs, the q130 integer-time discipline, immune to cross-engine
    // week-numbering conventions).
    // The corpus collapses to the distinct (user, week) activity relation
    // and a per-user first-week aggregate; both joins are user-keyed
    // equi-joins, cohort sizes are a |cohorts|-row broadcast, and the
    // output is the |cohorts|·|offsets|-bounded triangle.
    "q161_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
      val act = ev.distinct()
        .join(first, Seq("user_id"))
        .select(col("user_id"), col("w0").as("cohort_wk"),
          (col("wk") - col("w0")).as("offset_wk"))
        .distinct()
      val sizes = first.groupBy(col("w0")).agg(count(lit(1)).as("n_cohort"))
      act.groupBy(col("cohort_wk"), col("offset_wk"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), col("cohort_wk") === col("w0"))
        .select(col("cohort_wk"), col("offset_wk"), col("n_active"), col("n_cohort"),
          round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
        .orderBy(col("cohort_wk"), col("offset_wk"))
    }),

    // Revenue concentration per event type (the Pareto/whale audit beside
    // q156's segment census: what share of value comes from the top 10%
    // of users, and how unequal is the whole distribution?): the corpus
    // collapses to the (event_type, user) cents aggregate (1e-2 fixed-
    // point, the q01 discipline); ONE ascending rank window per type over
    // that |users|-bounded aggregate feeds BOTH stats — the top decile is
    // the ranks above n − ⌈n/10⌉ (exact integer arithmetic), the Gini is
    // the q164 rank formulation with exact decimal moments.
    "q165_revenue_pareto" -> ((s, d) => {
      val u = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cents"), col("user_id"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      u.withColumn("i", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .withColumn("topk", col("i") > col("cnt") - expr("(cnt + 9) div 10"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("cents")).as("total_c"),
          sum(expr("cast(i as decimal(18,0)) * cast(cents as decimal(18,0))"))
            .as("swx"),
          sum(when(col("topk"), col("cents")).otherwise(0L)).as("top_c"))
        .select(col("event_type"), col("n_users"),
          round(col("total_c") / lit(100.0), 2).as("revenue"),
          expr("case when total_c > 0 then round(" +
            "cast(top_c as double) / total_c, 6) end").as("top_decile_share"),
          expr("case when n_users > 1 and total_c > 0 then round(" +
            "2.0 * cast(swx as double)" +
            " / (cast(n_users as double) * cast(total_c as double))" +
            " - (cast(n_users as double) + 1) / n_users, 6) end").as("gini"))
        .orderBy(col("event_type"))
    }),

    // Audience-overlap matrix (the Jaccard companion to q118's lift over
    // the SAME distinct (event_type, user) pair relation: lift says
    // whether two audiences co-occur MORE THAN CHANCE, Jaccard says how
    // LARGE the shared audience actually is — a rare pair can have huge
    // lift and negligible overlap): pairs from the user-keyed self-join
    // (per-key fanout ≤ |types| — linear in users at any scale, never
    // types×types over raw events), sizes a |types|-row broadcast,
    // Jaccard divides exact ints once; publishes the set sizes q118's
    // probability ratios hide.
    "q168_audience_overlap" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
      val sz = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      ut.as("a").join(ut.as("b"),
          col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
        .join(broadcast(sz.select(col("event_type").as("type_a"), col("n").as("n_a"))),
          Seq("type_a"))
        .join(broadcast(sz.select(col("event_type").as("type_b"), col("n").as("n_b"))),
          Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
          round(col("n_both").cast("double")
            / (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Hour-of-day × day-of-week seasonality χ² (the independence test
    // behind every traffic heatmap: is the weekly activity profile of a
    // type real structure or noise?): cell/margin counts are exact
    // integer keyed aggs over (type, dow, hr) — dow/hr derived from the
    // exact µs integers (epoch day 0 = Thursday → +4 mod 7; no engine
    // date functions in the key) — and the χ² over the FULL 7×24 grid
    // folds empty cells in closed form (Σ_empty E = N − Σ_obs E), so only
    // observed cells are ever joined: χ² = Σ_obs[(O−E)²/E − E] + N with
    // per-cell terms ×1e6 fixed-pointed before the sum. Margins are
    // |cells|-bounded broadcasts; dof uses the observed margins.
    "q169_seasonality_chi2" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
          expr("(unix_micros(ts) div 3600000000) % 24").as("hr"))
      val cells = ev.groupBy(col("event_type"), col("dow"), col("hr"))
        .agg(count(lit(1)).as("o"))
      val rm = cells.groupBy(col("event_type"), col("dow")).agg(sum(col("o")).as("r"))
      val cm = cells.groupBy(col("event_type"), col("hr")).agg(sum(col("o")).as("c"))
      val nt = cells.groupBy(col("event_type")).agg(sum(col("o")).as("nn"))
      val dof = rm.groupBy(col("event_type")).agg(count(lit(1)).as("nr"))
        .join(cm.groupBy(col("event_type")).agg(count(lit(1)).as("nc")),
          Seq("event_type"))
      cells
        .join(broadcast(rm), Seq("event_type", "dow"))
        .join(broadcast(cm), Seq("event_type", "hr"))
        .join(broadcast(nt), Seq("event_type"))
        .withColumn("term_fp", expr(
          "cast(round((power(o - cast(r as double) * c / nn, 2)" +
          " / (cast(r as double) * c / nn)" +
          " - cast(r as double) * c / nn) * 1e6) as bigint)"))
        .groupBy(col("event_type"), col("nn"))
        .agg(sum(col("term_fp")).as("s_fp"))
        .join(broadcast(dof), Seq("event_type"))
        .select(col("event_type"), col("nn").as("n_events"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          round(col("s_fp").cast("double") / 1e6 + col("nn"), 6).as("chi2"))
        .orderBy(col("event_type"))
    }),

    // TPC-H Q1-shape pricing summary (q01 proves the grouped-sum
    // primitive; THIS is the full classic report — qty/price/discounted/
    // charged sums plus three means per (returnflag, linestatus) — the
    // canonical map-side-partial aggregation workload: 4-value key, every
    // money sum through the fixedSum cents/bp discipline so a 600M-row
    // scan reduces to exact int64 partials; the means divide the already-
    // exact sums in one final tree, never a float avg over rows).
    "q176_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          fixedSum(col("l_quantity"), 2).as("sum_qty"),
          fixedSum(col("l_extendedprice"), 2).as("sum_base_price"),
          fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("sum_disc_price"),
          fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          fixedAvg(col("l_quantity"), 2).as("avg_qty"),
          fixedAvg(col("l_extendedprice"), 2).as("avg_price"),
          fixedAvg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q5-shape local-supplier revenue (the classic snowflake join:
    // fact table against four dims with an intra-row equality — customer
    // and supplier must share a nation): orders date-filtered BEFORE the
    // fact join (partition-prunable at scale), nation/region broadcast
    // (constant-bounded), customer/supplier left to AQE (they scale with
    // the corpus — the q03 rule), revenue cents-exact. The c_nation =
    // s_nation predicate rides the join output, not a cartesian.
    "q177_regional_revenue" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val nat = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q15-shape top suppliers (the rank-over-aggregate idiom on
    // the fact side: quarterly revenue per supplier — fact scan collapses
    // to the |suppliers|-bounded aggregate FIRST, the rank window and the
    // 1-row total broadcast both ride that aggregate, and the ranking key
    // is the EXACT ×1e4 integer revenue so no float ordering exists).
    "q178_top_suppliers" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")).as("rev_fp"),
          count(lit(1)).as("n_items"))
      val tot = rev.agg(sum(col("rev_fp")).as("tot_fp"))
      val top = rev.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("rev_fp").desc, col("l_suppkey"))))
        .filter(col("rank") <= 5)
      top.join(broadcast(tot), expr("true"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("rank"), col("s_name"), col("n_items"),
          (col("rev_fp") / 1e4).cast("double").as("revenue"),
          round(col("rev_fp").cast("double") / col("tot_fp"), 6).as("share"))
        .orderBy(col("rank"))
    }),

    // TPC-H Q4-shape late-shipment priority census (the EXISTS semi-join
    // with a non-equi residual: an order counts when ANY of its lineitems
    // shipped > 30 days after the order date): the semi-join is keyed on
    // the orderkey with the lateness predicate as the join residual —
    // never a fact×fact cartesian — and the lateness itself is exact µs
    // integer arithmetic (the q130 discipline, no engine date functions).
    "q179_order_priority" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("lus"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
          col("lus") - col("ous") > 30L * 86400000000L, "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q8-shape market-share trend (the two-level conditional
    // aggregation: one nation's share of a region's yearly revenue —
    // numerator and denominator from ONE pass, never two scans): the
    // same snowflake join as q177 restricted to EUROPE customers, then
    // per order-year the NATION_3-supplier revenue over total revenue,
    // both cents-exact conditional sums in a single keyed agg.
    "q180_market_share" -> ((s, d) => {
      val nat = Tables.nation(s, d)
      val eur = nat
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000))
            .cast("long").as("rev_fp"))
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(eur), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .join(Tables.supplier(s, d).select(col("s_suppkey"),
            col("s_nationkey").as("sn")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat.select(col("n_nationkey").as("snk"), col("n_name"))),
          col("sn") === col("snk"))
        .groupBy(col("o_year"))
        .agg(sum(col("rev_fp")).as("tot_fp"),
          sum(when(col("n_name") === "NATION_3", col("rev_fp")).otherwise(0L))
            .as("nat_fp"))
        .select(col("o_year"),
          (col("tot_fp") / 1e4).cast("double").as("total_revenue"),
          (col("nat_fp") / 1e4).cast("double").as("nation_revenue"),
          expr("case when tot_fp > 0 then round(cast(nat_fp as double) / tot_fp, 6) end")
            .as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Brand × year product-mix trend (the dim-table rollup that finally
    // exercises `part` beyond a key lookup: revenue/volume per brand per
    // order year): fact joined to its ONE needed dim column (Catalyst
    // prunes p_brand's siblings at the scan), year from the order join —
    // two keyed equi-joins left to AQE, money cents-exact, |brands|×
    // |years|-bounded output.
    "q184_brand_trend" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("o_year"))
        .agg(fixedSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue"),
          fixedSum(col("l_quantity"), 2).as("qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"), col("o_year"))
    }),

    // ABC inventory classification (the 80/15/5 Pareto partitioning every
    // supply-chain dashboard runs: class A parts produce 80% of revenue):
    // part-level revenue aggregate FIRST (fact scan collapses to
    // |parts|-bounded), a RANGE-PARTITIONED prefix sum over that
    // aggregate with the exact ×1e4 integer revenue, class edges tested
    // in exact decimal arithmetic (5·cum ≤ 4·tot, 20·cum ≤ 19·tot — no
    // float share ever compared), then the ≤ 3-row class census.
    "q185_abc_classification" -> ((s, d) => {
      // The per-part aggregate is LINEAR in the corpus, so the running
      // revenue share comes from operators/GlobalRank's range-partitioned
      // prefix sum (exact ×1e4 longs end to end), not a global cumsum
      // window — and the grand total rides the same broadcastable ≤P-row
      // per-partition meta relation, replacing both 1-row nested-loop
      // total joins the round-18 shape carried.
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000).cast("long")).as("rev_fp"))
      graft.operators.GlobalRank.withPrefixSumAndTotal(rev,
          Seq(col("rev_fp").desc, col("l_partkey")), col("rev_fp"),
          "cum_fp", "tot_fp")
        .withColumn("cls", expr(
          "case when 5 * cast(cum_fp as decimal(38,0)) <= 4 * cast(tot_fp as decimal(38,0)) then 'A'" +
          " when 20 * cast(cum_fp as decimal(38,0)) <= 19 * cast(tot_fp as decimal(38,0)) then 'B'" +
          " else 'C' end"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev_fp")).as("cls_fp"),
          max(col("tot_fp")).as("tot_fp"))
        .select(col("cls"), col("n_parts"),
          (col("cls_fp") / 1e4).cast("double").as("revenue"),
          round(col("cls_fp").cast("double") / col("tot_fp"), 6).as("share"))
        .orderBy(col("cls"))
    }),

    // CDC MERGE (operators/CdcApply): the events table read as a change
    // log on user_id — each event an upsert carrying (event_type, value),
    // 'error' a delete tombstone, latest-op-wins under the unique
    // (ts, event_id) order — applied to the customer base table. The
    // operator is ONE max_by aggregation (map-side partial — the log
    // never shuffles whole) plus ONE key join; deleted keys vanish,
    // untouched customers pass through with null payloads. This is the
    // serving-table materialization every CDC/event pipeline ends in,
    // and the batch kernel the streaming upsert sink (q202) must match.
    "q201_cdc_apply" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val log = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"), col("value"))
      graft.operators.CdcApply.applyLog(base, log,
          baseKeyCol = "c_custkey", changeKeyCol = "user_id",
          ordCols = Seq("us", "event_id"), opCol = "event_type",
          deleteOp = "error", payloadCols = Seq("event_type", "value"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"))
        .orderBy(col("c_custkey"))
    })
  )

  /** DuckDB twin of [[graft.functions.ZOrder.spread16]], generated from the
    * SAME (shift, mask) table so the two engines cannot drift. */
  private def zSpreadSql(e0: String): String =
    graft.functions.ZOrder.spreadMasks.foldLeft(s"(($e0) % 65536)") {
      case (e, (s, m)) => s"(($e | ($e << $s)) & $m)"
    }

  val oracles: Map[String, String] = Map(
    "q73_zorder_key" -> {
      val a = zSpreadSql("user_id")
      val b = zSpreadSql("epoch_us(ts) // 3600000000")
      s"""
      SELECT event_id,
             (user_id % 65536) AS dim_user,
             ((epoch_us(ts) // 3600000000) % 65536) AS dim_hour,
             ($a | ($b << 1)) AS zkey,
             (($a | ($b << 1)) >> 16) AS zblock
      FROM events
      ORDER BY zkey, event_id"""
    },

    "q74_funnel" -> """
      WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1),
      c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      SELECT v.user_id,
             epoch_us(v.t_view) AS t_view_us,
             epoch_us(c.t_click) AS t_click_us,
             epoch_us(p.t_purchase) AS t_purchase_us,
             CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS stage
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id""",

    // Same (ts, event_id) ordering on both engines (µs truncation is
    // identical); totals partition the aggregated transition relation.
    "q91_event_transitions" -> """
      WITH o AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events),
      t AS (
        SELECT event_type AS src_type, nxt AS dst_type, COUNT(*) AS n
        FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2),
      tot AS (
        SELECT src_type, dst_type, n,
               CAST(SUM(n) OVER (PARTITION BY src_type) AS BIGINT) AS n_src
        FROM t)
      SELECT src_type, dst_type, CAST(n AS BIGINT) AS n, n_src,
             ROUND(CAST(n AS DOUBLE) / n_src, 6) AS p
      FROM tot ORDER BY src_type, dst_type""",

    // Same integer CUSUM (n·nh − total cleared of the mean's
    // denominator), same (|cusum| DESC, hr) changepoint pick.
    "q110_cusum_drift" -> """
      WITH hb AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      tot AS (
        SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS nh
        FROM hb GROUP BY 1),
      cs AS (
        SELECT hb.event_type, hb.hr, t.total, t.nh,
               CAST(SUM(hb.n * t.nh - t.total)
                 OVER (PARTITION BY hb.event_type ORDER BY hb.hr) AS BIGINT)
                 AS cusum
        FROM hb JOIN tot t USING (event_type)),
      rk AS (
        SELECT event_type, hr, total, nh, cusum,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY ABS(cusum) DESC, hr) AS rn
        FROM cs)
      SELECT event_type, total AS n_events, nh AS n_hours,
             strftime(hr, '%Y-%m-%d %H:%M:%S') AS peak_hour,
             cusum AS peak_cusum_fp,
             ROUND(CAST(ABS(cusum) AS DOUBLE) / (total * nh), 6) AS drift
      FROM rk WHERE rn = 1
      ORDER BY event_type""",

    "q01_groupby_agg" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT))/COUNT(l_quantity)/100.0 AS DOUBLE) AS avg_qty,
             CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT))/COUNT(l_discount)/100.0 AS DOUBLE) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_filter_pushdown" -> """
      SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*10000) AS BIGINT))/10000.0 AS DOUBLE) AS revenue,
             COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q03_join_broadcast" -> """
      SELECT c_mktsegment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q04_join_multi" -> """
      SELECT n_name,
             CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY n_name""",

    "q05_semi_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey""",

    "q06_anti_join" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q07_window_rank" -> """
      SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey,
             ROUND(base_totalprice, 2) AS o_totalprice
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice AS base_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",

    "q08_window_running" -> """
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS DOUBLE)
               AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey""",

    "q09_topk" -> """
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10""",

    "q10_distinct" -> """
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q11_setops" -> """
      WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer),
           sn AS (SELECT DISTINCT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier)
      SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn)
      UNION ALL
      SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
      UNION ALL
      SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
      ORDER BY op, nationkey""",

    "q12_cond_buckets" -> """
      SELECT l_linestatus,
             CAST(SUM(CASE WHEN l_quantity <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS qty_le3,
             CAST(SUM(CASE WHEN l_quantity <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS qty_le10,
             CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS qty_le25,
             CAST(SUM(CASE WHEN l_quantity BETWEEN 40 AND 49 THEN 1 ELSE 0 END) AS BIGINT) AS qty_40s,
             CAST(SUM(CASE WHEN l_quantity >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_ge50
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus""",

    "q13_p75_nearest_rank" -> """
      SELECT l_returnflag, ROUND(p75, 2) AS p75 FROM (
        SELECT l_returnflag, l_extendedprice AS p75,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
      WHERE rn = CAST(FLOOR(0.75 * (n - 1)) AS BIGINT) + 1
      ORDER BY l_returnflag""",

    // Oracle pins the exact nearest-rank p50 and the bound verdict as a
    // literal TRUE (the engine-side sketch value is engine-specific; its
    // CONTRACT is what's gated — same shape as q58).
    "q61_approx_percentile_bound" -> """
      SELECT l_returnflag, ROUND(p50, 2) AS exact_p50, TRUE AS within_bound
      FROM (
        SELECT l_returnflag, l_extendedprice AS p50,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
      WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
      ORDER BY l_returnflag""",

    "q14_having" -> """
      SELECT l_partkey, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY l_partkey
      HAVING COUNT(*) >= 20
      ORDER BY l_partkey""",

    "q15_rollup" -> """
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",

    "q16_scalar_funcs" -> """
      SELECT p_partkey,
             LOWER(p_brand) AS brand_lower,
             SUBSTRING(p_type, 1, 6) AS type_prefix,
             CAST(LENGTH(p_name) AS INTEGER) AS name_len,
             CONCAT_WS('|', p_brand, p_type) AS brand_type,
             REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
             CAST(GREATEST(p_size, 10) AS INTEGER) AS size_floor10,
             CAST(ROUND(p_retailprice * 1100) AS BIGINT) / 1000.0 AS price_bump
      FROM part
      ORDER BY p_partkey""",

    "q17_date_funcs" -> """
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY 1, 2
      ORDER BY o_year, o_month""",

    "q18_json" -> """
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
        AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
      ORDER BY event_id""",

    "q19_null_handling" -> """
      SELECT c_mktsegment,
             COUNT(bal) AS n_nonnull,
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(ROUND(COALESCE(bal, 0.0)*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_bal_coalesced
      FROM (SELECT c_mktsegment,
                   CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS bal,
                   c_custkey
            FROM customer)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q43_cube" -> """
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",

    "q64_unpivot" -> """
      WITH w AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, measure, value
      FROM (UNPIVOT w ON sum_qty, sum_price, sum_disc INTO NAME measure VALUE value)
      ORDER BY l_returnflag, measure""",

    "q65_grouping_sets" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_price
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY g_rf, g_ls, rf, ls""",

    "q60_pivot" -> """
      SELECT user_id % 10 AS cohort,
             COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
             COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
             COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
      FROM events
      GROUP BY 1
      ORDER BY 1""",

    "q20_tonum" -> """
      SELECT c_custkey,
             CASE WHEN REGEXP_REPLACE(COALESCE(c_name, ''), '[^0-9.\-]', '', 'g') = ''
                  THEN 0.0
                  ELSE TRY_CAST(REGEXP_REPLACE(c_name, '[^0-9.\-]', '', 'g') AS DOUBLE)
             END AS name_num
      FROM customer
      ORDER BY c_custkey""",

    // Same distinct-(user, day) collapse, per-user min cohort day, and
    // integer day_diff; UTC wall-clock dates on both engines.
    "q113_retention" -> """
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      cohort AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY 1),
      sizes AS (SELECT d0, CAST(COUNT(*) AS BIGINT) AS cohort_n FROM cohort GROUP BY 1),
      cell AS (
        SELECT c.d0, CAST(date_diff('day', c.d0, ud.day) AS INTEGER) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM ud JOIN cohort c USING (user_id)
        GROUP BY 1, 2)
      SELECT strftime(cell.d0, '%Y-%m-%d') AS cohort_day, day_offset,
             n_active, cohort_n,
             ROUND(CAST(n_active AS DOUBLE) / cohort_n, 6) AS retention
      FROM cell JOIN sizes USING (d0)
      ORDER BY cohort_day, day_offset""",

    // Same strictly-preceding last(ignore nulls) frame over the same
    // (ts, event_id) ordering; revenue via the identical cents
    // fixed-point longs.
    "q116_attribution" -> """
      WITH a AS (
        SELECT event_type, value,
               LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
        FROM events)
      SELECT COALESCE(attr, 'none') AS attr_type,
             COUNT(*) AS n_purchases,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS revenue
      FROM a WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1""",

    // Same distinct-(user, type) collapse, user-keyed pair self-join,
    // exact integer counts, final lift division identical.
    "q118_type_lift" -> """
      WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
      per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t FROM ut GROUP BY 1),
      p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n_both, pa.n_t AS n_a, pb.n_t AS n_b, n.n_users,
             ROUND(CAST(n_both AS DOUBLE) * n.n_users / (pa.n_t * pb.n_t), 6) AS lift
      FROM p
      JOIN per pa ON pa.event_type = p.type_a
      JOIN per pb ON pb.event_type = p.type_b, n
      ORDER BY type_a, type_b""",

    // Same unique (µs, event_id) window order, same exact-µs gap test,
    // same cumulative break-sum session index; RANGE-vs-ROWS default
    // frames agree because the ordering is unique.
    "q130_sessionization" -> """
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      o AS (
        SELECT user_id, event_id, event_type, us,
               LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        FROM e),
      f AS (
        SELECT user_id, event_id, event_type, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM o),
      sid AS (
        SELECT user_id, event_id, event_type, us,
               CAST(SUM(brk) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) AS BIGINT) AS session_idx
        FROM f)
      SELECT user_id, session_idx,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS dur_s,
             CAST(MIN(event_id) AS BIGINT) AS first_event
      FROM sid GROUP BY 1, 2
      ORDER BY user_id, session_idx""",

    // Same funnel min-timestamps, same exact integer gap seconds, same
    // lower-nearest-rank selection arithmetic.
    "q141_funnel_latency" -> """
      WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1),
      c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1),
      g AS (
        SELECT 'view_to_click' AS stage, c.user_id,
               (epoch_us(c.t_click) - epoch_us(v.t_view)) // 1000000 AS gap_s
        FROM c JOIN v USING (user_id)
        UNION ALL
        SELECT 'click_to_purchase' AS stage, p.user_id,
               (epoch_us(p.t_purchase) - epoch_us(c.t_click)) // 1000000 AS gap_s
        FROM p JOIN c USING (user_id)),
      r AS (
        SELECT stage, gap_s,
               ROW_NUMBER() OVER (PARTITION BY stage ORDER BY gap_s, user_id) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY stage) AS BIGINT) AS n
        FROM g)
      SELECT stage, n,
             CAST(MAX(CASE WHEN rn = (50 * (n - 1)) // 100 + 1 THEN gap_s END) AS BIGINT) AS p50_s,
             CAST(MAX(CASE WHEN rn = (75 * (n - 1)) // 100 + 1 THEN gap_s END) AS BIGINT) AS p75_s,
             CAST(MAX(CASE WHEN rn = (90 * (n - 1)) // 100 + 1 THEN gap_s END) AS BIGINT) AS p90_s
      FROM r GROUP BY 1, 2
      ORDER BY stage""",

    // q150's twin: identical basket self-join, exact counts, one
    // double division per ratio.
    "q150_assoc_rules" -> """
      WITH i AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      s AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS supp FROM i GROUP BY 1),
      n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM i),
      p AS (SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS supp_ab
            FROM i a JOIN i b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      j AS (SELECT pa, pb, supp_ab, sa.supp AS supp_a, sb.supp AS supp_b, n_orders
            FROM p JOIN s sa ON p.pa = sa.pk JOIN s sb ON p.pb = sb.pk CROSS JOIN n)
      SELECT pa, pb, supp_ab, supp_a, supp_b,
             ROUND(CAST(supp_ab AS DOUBLE) / supp_a, 6) AS conf_ab,
             ROUND(CAST(supp_ab AS DOUBLE) / supp_b, 6) AS conf_ba,
             ROUND(CAST(supp_ab AS DOUBLE) * n_orders / (supp_a * supp_b), 6) AS lift
      FROM j
      ORDER BY supp_ab DESC, pa, pb LIMIT 20""",

    // q156's twin: identical user aggregate, ntile(5) with user_id
    // tie-breaks (recency via date(t_last) DESC), cents-exact monetary.
    "q156_user_rfm" -> """
      WITH u AS (
        SELECT user_id, MAX(ts) AS t_last, CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS mon_c
        FROM events GROUP BY 1),
      q AS (
        SELECT user_id, freq, mon_c,
               NTILE(5) OVER (ORDER BY CAST(t_last AS DATE) DESC, user_id) AS r_q,
               NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_q,
               NTILE(5) OVER (ORDER BY mon_c DESC, user_id) AS m_q
        FROM u)
      SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
             CAST(m_q AS INTEGER) AS m_q, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(freq) AS BIGINT) AS n_events,
             ROUND(SUM(mon_c) / 100.0, 2) AS monetary
      FROM q GROUP BY 1, 2, 3
      ORDER BY r_q, f_q, m_q""",

    // q161's twin: identical integer epoch-week indices, distinct
    // (user, week) activity, per-user first week, cohort-keyed sizes.
    "q161_retention_cohorts" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      f AS (
        SELECT user_id, CAST(MIN(wk) AS BIGINT) AS w0 FROM e GROUP BY 1),
      a AS (
        SELECT DISTINCT e.user_id, f.w0 AS cohort_wk, e.wk - f.w0 AS offset_wk
        FROM (SELECT DISTINCT user_id, wk FROM e) e JOIN f ON e.user_id = f.user_id),
      sz AS (
        SELECT w0, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM f GROUP BY 1)
      SELECT cohort_wk, CAST(offset_wk AS BIGINT) AS offset_wk,
             CAST(COUNT(*) AS BIGINT) AS n_active, n_cohort,
             ROUND(CAST(COUNT(*) AS DOUBLE) / n_cohort, 6) AS retention
      FROM a JOIN sz ON a.cohort_wk = sz.w0
      GROUP BY 1, 2, n_cohort
      ORDER BY cohort_wk, offset_wk""",

    // q165's twin: same cents aggregate, same single ascending rank
    // window, same exact top-decile arithmetic and Gini moment.
    "q165_revenue_pareto" -> """
      WITH u AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, user_id) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM u),
      g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(cents) AS BIGINT) AS total_c,
               SUM(CAST(i AS HUGEINT) * cents) AS swx,
               CAST(SUM(CASE WHEN i > cnt - (cnt + 9) // 10 THEN cents ELSE 0 END) AS BIGINT) AS top_c
        FROM r GROUP BY 1)
      SELECT event_type, n_users,
             ROUND(total_c / 100.0, 2) AS revenue,
             CASE WHEN total_c > 0 THEN ROUND(CAST(top_c AS DOUBLE) / total_c, 6) END AS top_decile_share,
             CASE WHEN n_users > 1 AND total_c > 0 THEN ROUND(
               2.0 * CAST(swx AS DOUBLE)
               / (CAST(n_users AS DOUBLE) * CAST(total_c AS DOUBLE))
               - (CAST(n_users AS DOUBLE) + 1) / n_users, 6) END AS gini
      FROM g ORDER BY event_type""",

    // q168's twin: same distinct relation, same user-keyed pair join.
    "q168_audience_overlap" -> """
      WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
      sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1),
      p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
             ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6) AS jaccard
      FROM p
      JOIN sz sa ON p.type_a = sa.event_type
      JOIN sz sb ON p.type_b = sb.event_type
      ORDER BY type_a, type_b""",

    // q169's twin: identical integer dow/hr keys, the same closed-form
    // empty-cell fold and ×1e6 per-cell fixed-pointing.
    "q169_seasonality_chi2" -> """
      WITH e AS (
        SELECT event_type,
               (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
               (epoch_us(ts) // 3600000000) % 24 AS hr
        FROM events),
      cells AS (
        SELECT event_type, dow, hr, CAST(COUNT(*) AS BIGINT) AS o
        FROM e GROUP BY 1, 2, 3),
      rm AS (SELECT event_type, dow, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1, 2),
      cm AS (SELECT event_type, hr, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1, 2),
      nt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS nn FROM cells GROUP BY 1),
      dof AS (
        SELECT r.event_type, CAST(COUNT(DISTINCT r.dow) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT c.hr) AS BIGINT) AS nc
        FROM rm r JOIN cm c ON r.event_type = c.event_type
        GROUP BY 1),
      t AS (
        SELECT cells.event_type, nt.nn,
               CAST(ROUND((POWER(o - CAST(r AS DOUBLE) * c / nn, 2)
                 / (CAST(r AS DOUBLE) * c / nn)
                 - CAST(r AS DOUBLE) * c / nn) * 1e6) AS BIGINT) AS term_fp
        FROM cells
        JOIN rm ON cells.event_type = rm.event_type AND cells.dow = rm.dow
        JOIN cm ON cells.event_type = cm.event_type AND cells.hr = cm.hr
        JOIN nt ON cells.event_type = nt.event_type)
      SELECT t.event_type, t.nn AS n_events,
             CAST((dof.nr - 1) * (dof.nc - 1) AS BIGINT) AS dof,
             ROUND(CAST(SUM(term_fp) AS DOUBLE) / 1e6 + t.nn, 6) AS chi2
      FROM t JOIN dof ON t.event_type = dof.event_type
      GROUP BY 1, 2, 3
      ORDER BY t.event_type""",

    // q176's twin: identical fixed-point money trees (q02's idiom) for
    // every sum and mean.
    "q176_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))/100.0 AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT))/1000000.0 AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / COUNT(l_quantity) / 100.0 AS DOUBLE) AS avg_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / COUNT(l_extendedprice) / 100.0 AS DOUBLE) AS avg_price,
             CAST(SUM(CAST(ROUND(l_discount*10000) AS BIGINT)) / COUNT(l_discount) / 10000.0 AS DOUBLE) AS avg_disc,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY 1, 2
      ORDER BY l_returnflag, l_linestatus""",

    // q177's twin: same snowflake join, same intra-row nation equality.
    "q177_regional_revenue" -> """
      SELECT n_name,
             CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
      ORDER BY revenue DESC, n_name""",

    // q178's twin: exact ×1e4 integer revenue ranking, 1-row total.
    "q178_top_suppliers" -> """
      WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS rev_fp,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1),
      tot AS (SELECT CAST(SUM(rev_fp) AS BIGINT) AS tot_fp FROM rev),
      rk AS (
        SELECT l_suppkey, rev_fp, n_items,
               CAST(ROW_NUMBER() OVER (ORDER BY rev_fp DESC, l_suppkey) AS INTEGER) AS rank
        FROM rev)
      SELECT rank, s_name, n_items,
             CAST(rev_fp / 10000.0 AS DOUBLE) AS revenue,
             ROUND(CAST(rev_fp AS DOUBLE) / tot_fp, 6) AS share
      FROM rk
      JOIN supplier ON l_suppkey = s_suppkey
      CROSS JOIN tot
      WHERE rank <= 5
      ORDER BY rank""",

    // q179's twin: EXISTS with the same exact µs lateness residual.
    "q179_order_priority" -> """
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) > 2592000000000)
      GROUP BY 1
      ORDER BY o_orderpriority""",

    // q180's twin: same one-pass conditional sums over the snowflake.
    "q180_market_share" -> """
      WITH eur AS (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      j AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT) AS rev_fp,
               sn.n_name AS supp_nation
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE c_nationkey IN (SELECT n_nationkey FROM eur)),
      g AS (
        SELECT CAST(o_year AS INTEGER) AS o_year,
               CAST(SUM(rev_fp) AS BIGINT) AS tot_fp,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_fp ELSE 0 END) AS BIGINT) AS nat_fp
        FROM j GROUP BY 1)
      SELECT o_year,
             CAST(tot_fp / 10000.0 AS DOUBLE) AS total_revenue,
             CAST(nat_fp / 10000.0 AS DOUBLE) AS nation_revenue,
             CASE WHEN tot_fp > 0 THEN ROUND(CAST(nat_fp AS DOUBLE) / tot_fp, 6) END AS mkt_share
      FROM g ORDER BY o_year""",

    // q184's twin: same two keyed joins, same fixed-point money.
    "q184_brand_trend" -> """
      SELECT p_brand, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS DOUBLE) AS revenue,
             CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT))/100.0 AS DOUBLE) AS qty,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
      ORDER BY p_brand, o_year""",

    // q185's twin: same part aggregate, same exact integer class edges.
    "q185_abc_classification" -> """
      WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS rev_fp
        FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(SUM(rev_fp) AS BIGINT) AS tot_fp FROM rev),
      c AS (
        SELECT rev_fp,
               CAST(SUM(rev_fp) OVER (ORDER BY rev_fp DESC, l_partkey
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_fp
        FROM rev),
      k AS (
        SELECT rev_fp,
               CASE WHEN 5 * CAST(cum_fp AS HUGEINT) <= 4 * CAST(tot_fp AS HUGEINT) THEN 'A'
                    WHEN 20 * CAST(cum_fp AS HUGEINT) <= 19 * CAST(tot_fp AS HUGEINT) THEN 'B'
                    ELSE 'C' END AS cls
        FROM c CROSS JOIN tot)
      SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(rev_fp) / 10000.0 AS DOUBLE) AS revenue,
             ROUND(CAST(SUM(rev_fp) AS DOUBLE) / MAX(tot2.tot_fp), 6) AS share
      FROM k CROSS JOIN tot tot2
      GROUP BY 1
      ORDER BY cls""",

    // q201's twin: latest change per key via arg_max over the SAME unique
    // (ts, event_id) order, packed losslessly into one HUGEINT scalar
    // (epoch_us·10^7 + event_id — ids are well under 10^7 at every tier,
    // the q56 as-of encoding); tombstoned keys are dropped, untouched
    // customers keep null payloads.
    "q201_cdc_apply" -> """
      WITH latest AS (
        SELECT user_id,
               arg_max(event_type,
                 CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id) AS last_event_type,
               arg_max(value,
                 CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id) AS last_value
        FROM events GROUP BY user_id)
      SELECT c.c_custkey, c.c_name, c.c_mktsegment,
             l.last_event_type, l.last_value
      FROM customer c
      LEFT JOIN latest l ON l.user_id = c.c_custkey
      WHERE l.user_id IS NULL OR l.last_event_type <> 'error'
      ORDER BY c.c_custkey"""
  )
}
