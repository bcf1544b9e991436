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
