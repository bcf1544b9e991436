package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Num._

/** The reference's aggregate/filter kit re-expressed relationally
  * (SURVEY.md §2.5-2.6). Each query is the distributed generalization of a
  * whole-file scalar reduction in /root/reference/src/etl.js: what the
  * reference computes once per CSV, these compute per group over the corpus,
  * with the same null/guard semantics.
  *
  * Scale notes: every query is a single shuffle agg (partial aggregation
  * map-side) or a TakeOrderedAndProject — no windows over low-cardinality
  * partitions, no driver-side loops, no forced broadcasts of SF-scaled
  * inputs.
  */
object AuditKitQueries extends QueryPack {

  /** Sparse derived fields shared by the presence/placeholder probes
    * (q28-q30): deterministic functions of doc_id so both engines derive
    * identical sparsity without extra fixture tables. */
  private def status(c: Column): Column =
    when(c % 2 === 0, lit("ok")).otherwise(lit(null).cast("string"))
  private def message(c: Column): Column =
    when(c % 3 === 0, lit("login required")).otherwise(lit(null).cast("string"))
  private def link(c: Column): Column =
    when(c % 11 === 0, lit("http://example.com")).otherwise(lit(null).cast("string"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A6 max-with-null (/root/reference/src/etl.js:88-91 maxNum): max over
    // a filtered subset; groups with no qualifying row surface NULL, never
    // a sentinel.
    "q21_max_null" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(round(max(when(col("l_quantity") >= 45, col("l_extendedprice"))), 2)
               .as("max_hi_price"),
             count(lit(1)).as("n"))
        .orderBy(col("l_partkey"))
    }),

    // A8 ratio / pass-rate with zero-denominator guard
    // (/root/reference/src/etl.js:296-303: CWV pass rate, `total ? pass/total
    // : missing`): NULL when the denominator is empty.
    "q22_pass_rate" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(
          sum(when(col("l_quantity") >= 40, 1).otherwise(0)).as("den"),
          sum(when(col("l_quantity") >= 40 &&
                   col("l_discount") <= 0.05 &&
                   col("l_tax") <= 0.05, 1).otherwise(0)).as("num"))
        .withColumn("pass_rate",
          when(col("den") > 0, col("num").cast("double") / col("den")))
        .orderBy(col("l_partkey"))
    }),

    // A12 order-pinned collect_list (/root/reference/src/etl.js:407-409:
    // secondary_categories in pinned order): collected as a sorted distinct
    // list, serialized to one string so the gate compares a scalar.
    "q23_collect_list" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey").cast("int").as("nationkey"))
        .agg(concat_ws("|", array_sort(collect_set(col("c_mktsegment"))))
               .as("segments"),
             count(lit(1)).as("n"))
        .orderBy(col("nationkey"))
    }),

    // A11 first-of-filtered (/root/reference/src/etl.js:404-406: first
    // primary category in pinned order): per group, the first qualifying
    // row by a deterministic key, via min_by — one shuffle agg, no window.
    "q24_first_filtered" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderkey")).as("first_okey"),
             min_by(round(col("o_totalprice"), 2), col("o_orderkey"))
               .as("first_price"))
        .orderBy(col("o_custkey"))
    }),

    // A10 column-level coalesce in resolver order
    // (/root/reference/src/etl.js:124-126: preferred column else fallback
    // else default), plus usage accounting of which source resolved.
    "q25_col_coalesce" -> ((s, d) => {
      val a = when(col("c_custkey") % 3 === 0, lit(null).cast("double"))
                .otherwise(col("c_acctbal"))
      val b = when(col("c_custkey") % 4 === 0, lit(null).cast("double"))
                .otherwise(col("c_acctbal") * 2)
      Tables.customer(s, d)
        .withColumn("resolved", coalesce(a, b, lit(0.0)))
        .withColumn("src",
          when(a.isNotNull, "primary").when(b.isNotNull, "fallback").otherwise("default"))
        .groupBy(col("c_mktsegment"))
        .agg(fixedSum(col("resolved"), 2).as("sum_resolved"),
             sum(when(col("src") === "primary", 1).otherwise(0)).as("n_primary"),
             sum(when(col("src") === "fallback", 1).otherwise(0)).as("n_fallback"),
             sum(when(col("src") === "default", 1).otherwise(0)).as("n_default"))
        .orderBy(col("c_mktsegment"))
    }),

    // F5 substring predicates: contains / startsWith / endsWith, pushed
    // into conditional counts (one scan, one shuffle agg).
    "q26_contains" -> ((s, d) => {
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(
          sum(when(col("p_name").contains("ring"), 1).otherwise(0)).as("n_ring"),
          sum(when(col("p_name").contains("blue"), 1).otherwise(0)).as("n_blue"),
          sum(when(col("p_name").startsWith("small"), 1).otherwise(0)).as("n_small"),
          sum(when(col("p_name").endsWith("bolt"), 1).otherwise(0)).as("n_bolt"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // F7 first-match lookup: the single first row satisfying a predicate
    // under a pinned order — plans as TakeOrderedAndProject (per-partition
    // heaps, no full sort).
    "q27_first_match" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000)
        .orderBy(col("o_orderkey"))
        .limit(1)
        .select(col("o_orderkey"), col("o_custkey"),
                round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // F8 truthiness filter (JS `if (s || gs || link)`,
    // /root/reference/src/etl.js:344-358): empty string and NULL are both
    // falsy; anything else counts.
    "q28_truthiness" -> ((s, d) => {
      val sCol = when(col("doc_id") % 7 === 0, lit(""))
                   .when(col("doc_id") % 5 === 0, lit(null).cast("string"))
                   .otherwise(col("source"))
      Tables.documents(s, d)
        .withColumn("s", sCol)
        .groupBy(col("lang"))
        .agg(sum(when(col("s").isNotNull && col("s") =!= "", 1).otherwise(0))
               .as("n_truthy"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("lang"))
    }),

    // F9 placeholder-row predicate (/root/reference/src/etl.js:372:
    // `rows[0].status && rows[0].message` marks a login-wall placeholder):
    // per source, fetch the FIRST row by key (min + join-back — no window)
    // and flag when both fields are present.
    "q29_placeholder" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("status", status(col("doc_id")))
        .withColumn("message", message(col("doc_id")))
      val firsts = docs.groupBy(col("source").as("src"))
        .agg(min(col("doc_id")).as("first_id"))
      docs.join(firsts, col("source") === col("src") && col("doc_id") === col("first_id"))
        .select(col("source"), col("first_id"),
                (col("status").isNotNull && col("message").isNotNull).as("is_placeholder"))
        .orderBy(col("source"))
    }),

    // SC3-SC7 scoring kit as one per-group relational query (the last
    // spec-only operator family gets a gate row). Each nation plays the
    // role of one audited "site"; the component formulas are the
    // reference's scorecard verbatim (/root/reference/src/scoring.js):
    //   SC3 ratio-with-cap        kw_top10 = min(top10/max(top100,1), 1)   (:17-21)
    //   SC4 errors-per-page       health = clamp01(1 - (err/pages)/0.5)    (:26-33)
    //   SC5 rescale+clamp + the `avgPos || 20` falsy-ZERO trap             (:60-61,65-67)
    //   SC6 passthrough defaults  pct_top3 || 0, availability-gated inputs (:23,62-64)
    //   SC7 coverage-weighted mean, JS half-up rounding to 1dp/2dp         (:38-48)
    // Availability masks are deterministic functions of the group key so
    // both engines derive identical coverage without fixture tables.
    "q45_scoring" -> ((s, d) => {
      def clamp01(x: Column): Column = greatest(lit(0.0), least(lit(1.0), x))
      def jsRound(x: Column): Column = floor(x + 0.5) // JS Math.round: half-up
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("int").as("nationkey"))
        .agg(
          sum(when(col("o_totalprice") > 250000, 1).otherwise(0)).as("top10"),
          sum(when(col("o_totalprice") > 50000, 1).otherwise(0)).as("top100"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("err"),
          countDistinct(col("o_custkey")).as("pages"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
          sum(when(col("o_totalprice") > 400000, 1).otherwise(0)).as("n_top3"),
          sum(col("o_orderkey") % 20 + 1).as("pos_sum"),
          sum(when(col("o_orderpriority").startsWith("1"), 1).otherwise(0)).as("n_urgent"),
          count(lit(1)).as("n"))
      val kwTop10 = least(col("top10").cast("double") /
        greatest(col("top100"), lit(1L)).cast("double"), lit(1.0))
      val pagesEff = when(col("pages") === 0, lit(100L)).otherwise(col("pages"))
      val health = clamp01(lit(1.0) -
        (col("err").cast("double") / pagesEff.cast("double")) / lit(0.5))
      val cwvAvail = col("nationkey") % 3 =!= 0
      val cwvRaw = col("n_open").cast("double") / col("n").cast("double")
      val ossAcc = lit(20.0) * kwTop10 + lit(20.0) * health +
        when(cwvAvail, lit(15.0) * cwvRaw).otherwise(lit(0.0))
      val ossUsed = lit(40.0) + when(cwvAvail, lit(15.0)).otherwise(lit(0.0))
      // SC5: jsRound(avg*10)/10 like the reference's avg_pos (etl.js:320),
      // zeroed for some groups to spring the `|| 20` falsy trap.
      val avgPos0 = jsRound(col("pos_sum").cast("double") / col("n").cast("double") * 10) / 10.0
      val avgPos = when(col("nationkey") % 7 === 0, lit(0.0)).otherwise(avgPos0)
      val avgPosEff = when(avgPos === 0.0, lit(20.0)).otherwise(avgPos)
      val avgLocalRank = clamp01(lit(1.0) - (avgPosEff - lit(1.0)) / lit(19.0))
      val pctTop3 = col("n_top3").cast("double") / col("n").cast("double")
      val citAvail = col("nationkey") % 5 =!= 0
      val citRaw = col("n_urgent").cast("double") / col("n").cast("double")
      val rating = lit(3.0) + (col("nationkey") % 3).cast("double")
      val reviews = clamp01((rating - lit(3.5)) / lit(1.5))
      val lssAcc = lit(40.0) * avgLocalRank + lit(25.0) * pctTop3 +
        when(citAvail, lit(15.0) * citRaw).otherwise(lit(0.0)) + lit(10.0) * reviews
      val lssUsed = lit(75.0) + when(citAvail, lit(15.0)).otherwise(lit(0.0))
      base.select(
        col("nationkey"),
        (jsRound(ossAcc / ossUsed * 1000) / 10.0).as("oss"),
        (jsRound(ossUsed / 100.0 * 100) / 100.0).as("oss_coverage"),
        ossUsed.as("oss_weight_used"),
        (jsRound(lssAcc / lssUsed * 1000) / 10.0).as("lss"),
        (jsRound(lssUsed / 100.0 * 100) / 100.0).as("lss_coverage"),
        lssUsed.as("lss_weight_used"),
        kwTop10.as("kw_top10"),
        health.as("site_health"),
        avgLocalRank.as("avg_local_rank"),
        reviews.as("reviews"))
        .orderBy(col("nationkey"))
    }),

    // F10 any-field-present predicate (/root/reference/src/etl.js:354:
    // count a row when ANY of several probe fields is present).
    "q30_any_present" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("status", status(col("doc_id")))
        .withColumn("message", message(col("doc_id")))
        .withColumn("link", link(col("doc_id")))
        .groupBy(col("source"))
        .agg(sum(when(col("status").isNotNull || col("message").isNotNull ||
                      col("link").isNotNull, 1).otherwise(0)).as("n_any"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("source"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q21_max_null" -> """
      SELECT l_partkey,
             ROUND(MAX(CASE WHEN l_quantity >= 45 THEN l_extendedprice END), 2) AS max_hi_price,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY l_partkey
      ORDER BY l_partkey""",

    "q22_pass_rate" -> """
      SELECT l_partkey, den, num,
             CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / den END AS pass_rate
      FROM (
        SELECT l_partkey,
               CAST(SUM(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) AS BIGINT) AS den,
               CAST(SUM(CASE WHEN l_quantity >= 40 AND l_discount <= 0.05 AND l_tax <= 0.05
                        THEN 1 ELSE 0 END) AS BIGINT) AS num
        FROM lineitem
        GROUP BY l_partkey)
      ORDER BY l_partkey""",

    "q23_collect_list" -> """
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
             STRING_AGG(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
             COUNT(*) AS n
      FROM customer
      GROUP BY 1
      ORDER BY nationkey""",

    "q24_first_filtered" -> """
      SELECT o_custkey,
             MIN(o_orderkey) AS first_okey,
             ARG_MIN(ROUND(o_totalprice, 2), o_orderkey) AS first_price
      FROM orders
      WHERE o_orderstatus = 'F'
      GROUP BY o_custkey
      ORDER BY o_custkey""",

    "q25_col_coalesce" -> """
      WITH t AS (
        SELECT c_mktsegment,
               CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS a,
               CASE WHEN c_custkey % 4 = 0 THEN NULL ELSE c_acctbal * 2 END AS b
        FROM customer)
      SELECT c_mktsegment,
             CAST(SUM(CAST(ROUND(COALESCE(a, b, 0.0) * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_resolved,
             CAST(SUM(CASE WHEN a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_primary,
             CAST(SUM(CASE WHEN a IS NULL AND b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_fallback,
             CAST(SUM(CASE WHEN a IS NULL AND b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_default
      FROM t
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q26_contains" -> """
      SELECT p_brand,
             CAST(SUM(CASE WHEN p_name LIKE '%ring%' THEN 1 ELSE 0 END) AS BIGINT) AS n_ring,
             CAST(SUM(CASE WHEN p_name LIKE '%blue%' THEN 1 ELSE 0 END) AS BIGINT) AS n_blue,
             CAST(SUM(CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
             CAST(SUM(CASE WHEN p_name LIKE '%bolt' THEN 1 ELSE 0 END) AS BIGINT) AS n_bolt,
             COUNT(*) AS n
      FROM part
      GROUP BY p_brand
      ORDER BY p_brand""",

    "q27_first_match" -> """
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_totalprice > 300000
      ORDER BY o_orderkey
      LIMIT 1""",

    "q28_truthiness" -> """
      SELECT lang,
             CAST(SUM(CASE WHEN s IS NOT NULL AND s <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_truthy,
             COUNT(*) AS n_rows
      FROM (
        SELECT lang,
               CASE WHEN doc_id % 7 = 0 THEN ''
                    WHEN doc_id % 5 = 0 THEN NULL
                    ELSE source END AS s
        FROM documents)
      GROUP BY lang
      ORDER BY lang""",

    "q29_placeholder" -> """
      WITH docs AS (
        SELECT source, doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'ok' END AS status,
               CASE WHEN doc_id % 3 = 0 THEN 'login required' END AS message
        FROM documents),
      firsts AS (SELECT source AS src, MIN(doc_id) AS first_id FROM docs GROUP BY source)
      SELECT d.source, f.first_id,
             (d.status IS NOT NULL AND d.message IS NOT NULL) AS is_placeholder
      FROM docs d JOIN firsts f ON d.source = f.src AND d.doc_id = f.first_id
      ORDER BY d.source""",

    "q45_scoring" -> """
      WITH base AS (
        SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
               CAST(SUM(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END) AS BIGINT) AS top10,
               CAST(SUM(CASE WHEN o_totalprice > 50000 THEN 1 ELSE 0 END) AS BIGINT) AS top100,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS err,
               COUNT(DISTINCT o_custkey) AS pages,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT) AS n_top3,
               CAST(SUM(o_orderkey % 20 + 1) AS BIGINT) AS pos_sum,
               CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
               COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1),
      comp AS (
        SELECT nationkey,
               LEAST(CAST(top10 AS DOUBLE) / CAST(GREATEST(top100, 1) AS DOUBLE), 1.0) AS kw_top10,
               GREATEST(0.0, LEAST(1.0,
                 1.0 - (CAST(err AS DOUBLE) /
                        CAST(CASE WHEN pages = 0 THEN 100 ELSE pages END AS DOUBLE)) / 0.5)) AS site_health,
               nationkey % 3 <> 0 AS cwv_avail,
               CAST(n_open AS DOUBLE) / CAST(n AS DOUBLE) AS cwv_raw,
               CASE WHEN nationkey % 7 = 0 THEN 0.0
                    ELSE FLOOR(CAST(pos_sum AS DOUBLE) / CAST(n AS DOUBLE) * 10 + 0.5) / 10.0
               END AS avg_pos,
               CAST(n_top3 AS DOUBLE) / CAST(n AS DOUBLE) AS pct_top3,
               nationkey % 5 <> 0 AS cit_avail,
               CAST(n_urgent AS DOUBLE) / CAST(n AS DOUBLE) AS cit_raw,
               GREATEST(0.0, LEAST(1.0, ((3.0 + nationkey % 3) - 3.5) / 1.5)) AS reviews
        FROM base),
      ranked AS (
        SELECT *,
               GREATEST(0.0, LEAST(1.0,
                 1.0 - ((CASE WHEN avg_pos = 0.0 THEN 20.0 ELSE avg_pos END) - 1.0) / 19.0)) AS avg_local_rank
        FROM comp),
      agg AS (
        -- Addition order mirrors the Spark expression tree left-to-right
        -- (floating-point + is not associative; the gate hashes raw doubles).
        SELECT nationkey, kw_top10, site_health, reviews, avg_local_rank,
               20.0 * kw_top10 + 20.0 * site_health +
                 (CASE WHEN cwv_avail THEN 15.0 * cwv_raw ELSE 0.0 END) AS oss_acc,
               40.0 + (CASE WHEN cwv_avail THEN 15.0 ELSE 0.0 END) AS oss_used,
               40.0 * avg_local_rank + 25.0 * pct_top3 +
                 (CASE WHEN cit_avail THEN 15.0 * cit_raw ELSE 0.0 END) +
                 10.0 * reviews AS lss_acc,
               75.0 + (CASE WHEN cit_avail THEN 15.0 ELSE 0.0 END) AS lss_used
        FROM ranked)
      SELECT nationkey,
             FLOOR(oss_acc / oss_used * 1000 + 0.5) / 10.0 AS oss,
             FLOOR(oss_used / 100.0 * 100 + 0.5) / 100.0 AS oss_coverage,
             CAST(oss_used AS DOUBLE) AS oss_weight_used,
             FLOOR(lss_acc / lss_used * 1000 + 0.5) / 10.0 AS lss,
             FLOOR(lss_used / 100.0 * 100 + 0.5) / 100.0 AS lss_coverage,
             CAST(lss_used AS DOUBLE) AS lss_weight_used,
             kw_top10, site_health, avg_local_rank, reviews
      FROM agg
      ORDER BY nationkey""",

    "q30_any_present" -> """
      SELECT source,
             CAST(SUM(CASE WHEN status IS NOT NULL OR message IS NOT NULL OR link IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
             COUNT(*) AS n_rows
      FROM (
        SELECT source,
               CASE WHEN doc_id % 2 = 0 THEN 'ok' END AS status,
               CASE WHEN doc_id % 3 = 0 THEN 'login required' END AS message,
               CASE WHEN doc_id % 11 = 0 THEN 'http://example.com' END AS link
        FROM documents)
      GROUP BY source
      ORDER BY source"""
  )
}
