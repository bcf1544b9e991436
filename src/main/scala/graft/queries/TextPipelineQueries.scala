package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Training-data text operators over `documents` (the builder-prompt LLM
  * pipeline family): text stats + quality, language ID, exact dedup,
  * MinHash+LSH near-dup dedup, SimHash fingerprints, and blocked n-gram
  * Jaccard similarity.
  *
  * Everything is HOF/built-in only (no UDFs): the whole pipeline stays
  * inside Catalyst and every step is expressible as DuckDB SQL for the
  * oracle, using cross-engine-stable md5 as the hash family (see
  * graft.functions.TextFns).
  *
  * Scale design: near-dup candidate generation joins on LSH band keys —
  * never all-pairs. The band self-join shuffles on the band key; bucket
  * skew (a hot band) is AQE-splittable. Blocked Jaccard (q37) compares only
  * within (lang, source) blocks. At 100 TB the same plans hold: per-doc maps
  * are embarrassingly parallel, and the only shuffles are keyed joins/aggs.
  */
object TextPipelineQueries extends QueryPack {

  private val NumHashes = 8
  private val Bands = 4
  private val RowsPerBand = 2
  private val JaccThreshold = 0.5

  /** doc_id + the distinct word-3-gram shingle set hashed to 32-bit ints
    * (ONE md5 per shingle; everything downstream — MinHash permutations,
    * band keys, Jaccard confirm — is integer work over this array, and
    * the persisted relation carries no strings). Public: the signature
    * projection for any (doc_id, text) relation, feeding
    * pairsFromShingles / dedupAgainstDropped. */
  def shingleSignatures(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      TextFns.shingleHash32(TextFns.tokens(col("text")), 3).as("hs"))

  private def shingled(s: SparkSession, d: String): DataFrame =
    shingleSignatures(Tables.documents(s, d))

  /** Exploded (doc_id, band index, band key) — the LSH bucketing. The
    * signature is the affine permutation family over the pre-hashed
    * shingles (integer arithmetic only; graft_minhash is the fused
    * from-strings alternative, spec-verified bit-identical). */
  private def bands(sh: DataFrame): DataFrame = {
    val sig = sh.select(col("doc_id"),
      TextFns.minhashSignature(col("hs"), NumHashes).as("mh"))
    sig.select(col("doc_id"),
      posexplode(array((0 until Bands).map(b =>
        TextFns.lshBand(col("mh"), b, RowsPerBand)): _*)).as(Seq("b", "key")))
  }

  /** Materialize-once (graft.operators.MaterializeOnce): the cluster-scale
    * move ("write signatures to a table before pairing") done locally —
    * nothing pinned in executor memory (the r2 persist() leak), every
    * consumer (both sides of a self-join, q34 AND q35) reads the same
    * on-disk relation, and the md5 shingle pipeline runs exactly once per
    * (scale factor, source fingerprint). */
  private def materialize(key: String, s: SparkSession)(df: => DataFrame): DataFrame =
    graft.operators.MaterializeOnce(key, s)(df)

  private def fingerprint(d: String, table: String): String =
    graft.operators.MaterializeOnce.fingerprint(d, table)

  /** The materialized (doc_id, hs) shingle-signature relation for a corpus
    * — the thing a production deployment would keep as a living table and
    * dedup new batches against (see dedupAgainstDropped). Shared with
    * StreamingQueries' q54, which bootstraps the streaming kernel's DocSig
    * projection from the same standing table. */
  private[queries] def materializedShingles(s: SparkSession, d: String): DataFrame =
    materialize(s"shingles|$d|${fingerprint(d, "documents.parquet")}", s)(shingled(s, d))

  /** Confirmed near-dup pairs WITHIN one shingle relation: candidates from
    * shared LSH buckets (keyed on (band, key) — no all-pairs), confirmed
    * by exact Jaccard >= threshold on the shingle sets. Public: pair with
    * shingleSignatures to dedup arbitrary document relations. `hs` must be
    * duplicate-free (shingleSignatures' array_distinct establishes it):
    * the sorted-merge Jaccard counts positions, not distinct values. */
  def pairsFromShingles(sh: DataFrame): DataFrame = {
    val bd = bands(sh)
    val cand = bd.as("x").join(bd.as("y"),
        col("x.key") === col("y.key") && col("x.b") === col("y.b") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // hs sorted once per DOC before the pair join, so each pair's Jaccard
    // is a zero-allocation sorted merge (graft_sorted_icount) with
    // |A ∪ B| = |A| + |B| − |A ∩ B| (hs is distinct by construction) —
    // not a hash-set build plus TWO materialized set arrays per pair.
    val shS = sh.select(col("doc_id"), array_sort(col("hs")).as("hs"))
    cand
      .join(shS.select(col("doc_id").as("ida"), col("hs").as("ha")), col("doc_a") === col("ida"))
      .join(shS.select(col("doc_id").as("idb"), col("hs").as("hb")), col("doc_b") === col("idb"))
      .withColumn("isz", expr("graft_sorted_icount(ha, hb)"))
      .select(col("doc_a"), col("doc_b"),
        (col("isz").cast("double") /
         (size(col("ha")) + size(col("hb")) - col("isz"))).as("jacc"))
      .filter(col("jacc") >= JaccThreshold)
  }

  /** Candidate pairs from shared LSH buckets, confirmed by exact Jaccard on
    * the shingle sets. The shingle relation (~1% the width of the corpus)
    * is materialized to a table; the band relation is re-derived per
    * consumer from that table (pure integer arithmetic — cheaper than
    * pinning it in memory). */
  private def confirmedPairs(s: SparkSession, d: String): DataFrame =
    pairsFromShingles(materializedShingles(s, d))

  /** INCREMENTAL near-dup dedup — the dominant production mode at 100 TB:
    * never re-pair the whole corpus, dedup each arriving batch against the
    * standing signature table. Returns the distinct batch doc_ids to DROP:
    * a batch doc is dropped when it is a confirmed near-dup (shares an LSH
    * band bucket AND shingle Jaccard >= threshold) of ANY corpus doc, or
    * of a LOWER-ID doc within its own batch (the same keep-lowest-id rule
    * as q35). When every corpus id precedes every batch id, the result is
    * IDENTICAL to running the full-corpus dedup over corpus ∪ batch —
    * pinned by the q51 gate, whose oracle is literally q35's SQL.
    *
    * Scale shape: the batch→corpus candidate join is a plain (band, key)
    * equi-join — batch-sized on one side, AQE-splittable on hot buckets —
    * and the within-batch pairs reuse the salted self-join. Nothing
    * touches corpus×corpus. */
  def dedupAgainstDropped(corpusSh: DataFrame, batchSh: DataFrame): DataFrame = {
    val cb = bands(corpusSh).select(col("b"), col("key"), col("doc_id").as("cid"))
    val nb = bands(batchSh).select(col("b"), col("key"), col("doc_id").as("nid"))
    val cross = nb.join(cb, Seq("b", "key"))
      .select(col("nid"), col("cid")).distinct()
    // Same per-doc-sort + sorted-merge Jaccard as pairsFromShingles.
    val crossDropped = cross
      .join(batchSh.select(col("doc_id").as("na"),
              array_sort(col("hs")).as("nh")),
            col("nid") === col("na"))
      .join(corpusSh.select(col("doc_id").as("ca"),
              array_sort(col("hs")).as("ch")),
            col("cid") === col("ca"))
      .withColumn("isz", expr("graft_sorted_icount(nh, ch)"))
      .filter((col("isz").cast("double") /
               (size(col("nh")) + size(col("ch")) - col("isz"))) >= JaccThreshold)
      .select(col("nid").as("doc_id"))
    val innerDropped = pairsFromShingles(batchSh)
      .select(col("doc_b").as("doc_id"))
    crossDropped.union(innerDropped).distinct()
  }

  /** Per-doc add-one-smoothed bigram-LM surprisal — the scored relation
    * shared by q81 (keep gate) and q90 (CCNet bucketing), materialized
    * once per corpus like the shingle table: score once, then gate and
    * stratify from the standing (doc_id, lang, n_bigrams, avg_nll)
    * table instead of re-deriving the LM per consumer. Only docs with
    * ≥ 1 bigram appear; callers left-join from the full corpus. avg_nll
    * is 6-dp rounded AT SCORING TIME so every downstream compare (keep
    * threshold, percentile selection, bucket label) runs on identical
    * values on both engines. */
  private def materializedSurprisal(s: SparkSession, d: String): DataFrame =
    materialize(s"surprisal|$d|${fingerprint(d, "documents.parquet")}", s) {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), TextFns.tokens(col("text")).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
      val bi = t.filter(col("n_toks") >= 2)
        .select(col("doc_id"), explode(TextFns.wordShingles(col("toks"), 2)).as("gram"))
        .withColumn("w1", split(col("gram"), " ").getItem(0))
      val c2t = bi.groupBy(col("gram")).agg(count(lit(1)).as("c2"))
        .withColumn("w2", split(col("gram"), " ").getItem(1))
      // |V| as a 1-row scalar aggregate broadcast back onto the bigram
      // relation (the q88 node-count shape) — NEVER a global window over
      // the bigram-TYPE relation, which would materialize the full
      // vocabulary set in ONE task: that relation is |bigram types|-
      // bounded, i.e. billions of rows for a real web corpus, and this
      // is the warm path for both q81 and q90.
      val vv = c2t.agg(countDistinct(col("w2")).as("v"))
      val c2 = c2t.drop("w2").join(broadcast(vv), expr("true"))
      // c1 from the bigram-TYPE relation (Σ c2 per first word ≡ the bigram
      // occurrence count of that first word) — not a third tokenize pass
      // over the corpus; the q132/q124 derivation discipline.
      val c1 = c2t
        .withColumn("w1b", split(col("gram"), " ").getItem(0))
        .groupBy(col("w1b").as("w1")).agg(sum(col("c2")).as("c1"))
      bi.join(c2, Seq("gram")).join(c1, Seq("w1"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log((col("c2") + lit(1)).cast("double")
            / (col("c1") + col("v")))), 6).as("avg_nll"))
        .join(t.select(col("doc_id"), col("lang")), Seq("doc_id"))
    }

  /** The materialized packed-trigram relation — (doc_id, lang, source,
    * lb, gr, ng) with gr the sorted distinct codepoint-packed char-3-gram
    * set (injective for ASCII, so Jaccard over the packed ints IS trigram
    * Jaccard; graft_trigram_pack is the fused native extraction — the HOF
    * chain built each 3-gram through an interpreted substr/ascii tree,
    * see TrigramPackExpr for the parity contract). Shared by q37 (blocked
    * Jaccard) and q142 (sorted-neighborhood pass): one build per corpus. */
  private def trigramDocs(s: SparkSession, d: String): DataFrame =
    materialize(s"trigrams|$d|${fingerprint(d, "documents.parquet")}", s) {
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"), col("source"),
        floor(col("n_chars") / 100).as("lb"),
        call_function("graft_trigram_pack", col("text")).as("gr"))
        .withColumn("ng", size(col("gr")))
    }

  /** Query terms for the IR family (q93 BM25, q127 query-likelihood,
    * q128 nDCG) — one definition so the three views rank the same ad-hoc
    * query. */
  private val IrTerms = Seq("spark", "join", "stream")

  /** q93's fixed-point BM25-scored relation — (doc_id, dl, n_hit, sfp)
    * over docs matching ≥ 1 query term, sfp the ×1e9 int64 score sum —
    * shared by q93 (presentation top-10) and q128 (nDCG ranking audit).
    * Shape: one (doc, term) keyed agg over the exploded-and-filtered
    * token stream (3·matches rows, never corpus-wide), term df and the
    * 1-row corpus stats broadcast. */
  private def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val g = t.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = t.select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(IrTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("tok")).join(broadcast(g), expr("true"))
      .withColumn("contrib_fp", expr(
        "cast(round(ln((n - df + 0.5) / (df + 0.5) + 1.0)" +
        " * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e9) as bigint)"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_hit"), sum(col("tf")).as("tf_total"),
        sum(col("contrib_fp")).as("sfp"))
  }

  /** 8-hex-char md5 prefix → 32-bit int via strpos arithmetic (mirrors
    * TextFns.hash32 exactly). Shared with StreamingQueries' q53 oracle so
    * the fingerprint SQL has exactly one definition. */
  private[queries] val hex32: String = (1 to 8).map { p =>
    s"(strpos('0123456789abcdef', substr(md5(x), $p, 1)) - 1) * ${1L << (4 * (8 - p))}"
  }.mkString(" + ")

  /** Oracle CTE prefix shared by the MinHash queries (q34/q35): tokens →
    * distinct 3-gram shingles → one md5-derived 32-bit hash per shingle →
    * 8 affine-permutation min-hashes → 4×2 LSH bands → bucket-joined
    * candidates → Jaccard-confirmed pairs. */
  private val pairsCtes: String = s"""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
        FROM documents),
      s AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(1, greatest(len(toks) - 2, 1)),
                 i -> array_to_string(toks[i:i+2], ' '))) AS sh
        FROM t),
      hashed AS (
        SELECT doc_id,
               list_transform(sh, x -> CAST($hex32 AS BIGINT)) AS hs
        FROM s),
      sig AS (
        SELECT doc_id, hs,
               [list_min(list_transform(hs, h -> (h * (2*j + 1) + j*j + 7) % 2147483647))
                for j in generate_series(0, ${NumHashes - 1})] AS mh
        FROM hashed),
      bands AS (
        SELECT doc_id, b, md5(mh[2*b+1] || '|' || mh[2*b+2]) AS key
        FROM sig, generate_series(0, ${Bands - 1}) g(b)),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
        FROM bands a JOIN bands bb
          ON a.key = bb.key AND a.b = bb.b AND a.doc_id < bb.doc_id),
      pairs AS (
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.hs, sb.hs))) AS jacc
        FROM cand c
        JOIN hashed sa ON c.doc_a = sa.doc_id
        JOIN hashed sb ON c.doc_b = sb.doc_id)"""

  /** Oracle CTE chain for the 48-bit SimHash candidate pairs (q102's
    * fingerprint→band→bucket-join), names sx_-prefixed so it composes
    * with pairsCtes in one WITH clause (q111). No leading WITH. */
  private val simhashCtes: String = {
    val hex48 = (1 to 12).map { p =>
      s"(strpos('0123456789abcdef', substr(md5(t), $p, 1)) - 1) * ${1L << (4 * (12 - p))}"
    }.mkString(" + ")
    val sums = (0 until 48).map { i =>
      s"list_sum(list_transform(hs, h -> CASE WHEN (h // ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END)) AS s_$i"
    }.mkString(",\n                 ")
    val assemble = (0 until 48).map { i =>
      s"CASE WHEN s_$i > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"""sxt AS (
          SELECT doc_id,
                 list_transform(
                   list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                   t -> CAST($hex48 AS BIGINT)) AS hs
          FROM documents),
        sxb AS (
          SELECT doc_id,
                 $sums
          FROM sxt),
        sxsh AS (
          SELECT doc_id, CAST($assemble AS BIGINT) AS sh FROM sxb),
        sxbands AS (
          SELECT doc_id, sh, band,
                 (sh // (CASE band WHEN 0 THEN 1 WHEN 1 THEN 4096
                         WHEN 2 THEN 16777216 ELSE 68719476736 END)) % 4096 AS key
          FROM sxsh, (SELECT unnest([0, 1, 2, 3]) AS band)),
        sxcand AS (
          SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b,
                 a.sh AS sim_a, bb.sh AS sim_b
          FROM sxbands a JOIN sxbands bb
            ON a.band = bb.band AND a.key = bb.key AND a.doc_id < bb.doc_id)"""
  }

  /** Shared by q105/q106: per-doc linear quality-model score in 1e-9
    * fixed-point (each weighted feature contribution rounded to an int64
    * BEFORE the sum, so the score is bit-identical on both engines and
    * under any partitioning — the q93 idiom applied to model inference).
    * Features: log doc length vs the 50-token sweet spot, type-token
    * ratio vs 0.5, mean token length vs 4.5, and an English prior —
    * stand-ins for a trained filter's coefficients; the POINT is the
    * shape: applying a linear model at corpus scale is one per-row map,
    * no shuffle. */
  private def qualityScores(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"),
        expr("cast(aggregate(toks, 0L, (a, x) -> a + length(x)) as bigint)")
          .as("sum_len"))
      .filter(col("n_toks") > 0)
      .withColumn("sfp", expr(
        "cast(round(1.2 * ln(cast(n_toks as double) / 50) * 1000000000) as bigint)" +
        " + cast(round(2.0 * (cast(n_types as double) / n_toks - 0.5) * 1000000000) as bigint)" +
        " + cast(round(0.8 * (cast(sum_len as double) / n_toks - 4.5) * 1000000000) as bigint)" +
        " + CASE WHEN lang = 'en' THEN cast(500000000 as bigint) ELSE cast(0 as bigint) END"))

  /** q102's confirmed near-dup pair relation (48-bit SimHash, 4×12-bit
    * pigeonhole bands, hamming ≤ 3) — shared with the dedup-method
    * agreement audit (q111). */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"),
        TextFns.simhash48(TextFns.hash48Array(TextFns.tokens(col("text"))))
          .as("sh"))
    val bands = sh.select(col("doc_id"), col("sh"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("key",
        expr("(sh div cast(power(4096, band) as bigint)) % 4096"))
    bands.select(col("band"), col("key"),
        col("doc_id").as("doc_a"), col("sh").as("sim_a"))
      .join(bands.select(col("band"), col("key"),
          col("doc_id").as("doc_b"), col("sh").as("sim_b")),
        Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(sim_a ^ sim_b) as int)"))
      .filter(col("hamming") <= 3)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Text stats + quality scoring: token count, BPE-ish subword count,
    // distinct-token count, mean token length, stopword ratio — the
    // per-document map stage of a corpus-quality pipeline.
    "q31_text_stats" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .withColumn("toks", TextFns.tokens(col("text")))
      base.select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        TextFns.subwordCount(col("text")).as("n_subwords"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
         size(col("toks"))).as("avg_token_len"),
        (TextFns.stopwordHits(col("toks"), TextFns.stopwords("en")).cast("double") /
         size(col("toks"))).as("stop_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Stopword-inventory language ID: per-language hit counts, argmax with
    // a fixed priority-order tiebreak (en > es > de > fr > zh).
    "q32_lang_id" -> ((s, d) => {
      val langs = Seq("en", "es", "de", "fr", "zh")
      val base = Tables.documents(s, d)
        .withColumn("toks", TextFns.tokens(col("text")))
      val withHits = langs.foldLeft(base) { (df, l) =>
        df.withColumn(s"h_$l", TextFns.stopwordHits(col("toks"), TextFns.stopwords(l)))
      }
      val mx = greatest(langs.map(l => col(s"h_$l")): _*)
      val predicted = langs.reverse.foldLeft(lit("und"): Column) { (acc, l) =>
        when(col(s"h_$l") === mx, lit(l)).otherwise(acc)
      }
      withHits.select(
          (Seq(col("doc_id"), col("lang"), predicted.as("pred_lang")) ++
           langs.map(l => col(s"h_$l"))): _*)
        .orderBy(col("doc_id"))
    }),

    // Exact deduplication: hash-groupBy on a content key (here the leading
    // 2-token prefix), canonical representative = min doc_id. One shuffle
    // agg — the standard exact-dedup shape at any scale.
    "q33_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("key",
          concat_ws(" ", slice(TextFns.tokens(col("text")), 1, 2)))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("kept"))
        .filter(col("n_docs") > 1)
        .orderBy(col("key"))
    }),

    // MinHash+LSH near-dup pairs: bucket-join candidates (no all-pairs),
    // confirmed by exact Jaccard >= 0.5 on the shingle sets.
    "q34_minhash_pairs" -> ((s, d) => {
      confirmedPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
    }),

    // Dedup resolution: greedy keep-lowest-id — drop every doc that appears
    // as the larger id of a confirmed pair; report per-language counts.
    "q35_minhash_keep" -> ((s, d) => {
      val dropped = confirmedPairs(s, d).select(col("doc_b")).distinct()
      Tables.documents(s, d)
        .join(dropped, col("doc_id") === col("doc_b"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))
    }),

    // INCREMENTAL dedup gate: split the corpus at the 80% point of the id
    // space (standing corpus = ids below, arriving batch = ids at/above),
    // dedup the corpus within itself and the batch via dedupAgainstDropped
    // — and require the combined kept set to EQUAL the full-corpus dedup:
    // the oracle for this query is q35's SQL, verbatim. The id-ordered
    // split is what makes the keep-lowest-id rule decompose exactly
    // (every corpus id < every batch id).
    "q51_dedup_incremental" -> ((s, d) => {
      val sh = materializedShingles(s, d)
      val docs = Tables.documents(s, d)
      val t = (graft.operators.CorpusStats.maxId(s, d, "documents", "doc_id") + 1L) * 4L / 5L
      val corpusSh = sh.filter(col("doc_id") < t)
      val batchSh = sh.filter(col("doc_id") >= t)
      val droppedOld = pairsFromShingles(corpusSh).select(col("doc_b").as("doc_id"))
      val dropped = droppedOld
        .union(dedupAgainstDropped(corpusSh, batchSh)).distinct()
      docs.join(dropped, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))
    }),

    // Duplicate-CLUSTER resolution: near-dup pairs are not deletion
    // decisions until transitive groups are resolved (A~B, B~C must put
    // A,B,C in one cluster even when A~C was never emitted as a pair).
    // Distributed connected components (min-label + pointer jumping,
    // graft.operators.ConnectedComponents) over the q34 edge set; report
    // each cluster's canonical keeper (= component min id) and size.
    "q59_dedup_components" -> ((s, d) => {
      val pairs = confirmedPairs(s, d).select(col("doc_a"), col("doc_b"))
      graft.operators.ConnectedComponents(pairs, "doc_a", "doc_b")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("component"))
    }),

    // TF-IDF top-k terms per document — the keyword-extraction stage of a
    // corpus pipeline. TF = one (doc_id, term) shuffle agg; DF = a second
    // agg over the already-distinct TF pairs (never re-touches raw
    // tokens); corpus size N is the memoized CorpusStats scalar (no
    // per-query count job). Scores are rounded to 6 dp on BOTH engines
    // before ranking: ln() may differ across libm implementations in the
    // last ulp, and an unrounded ORDER BY score would make tie-breaks
    // engine-dependent. Top-k per doc is the salted two-level TopK — no
    // single-task whole-doc-group sort at any corpus size.
    "q62_tfidf_topk" -> ((s, d) => {
      val k = 3
      val n = graft.operators.CorpusStats.count(s, d, "documents", "doc_id")
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, Seq("term"))
        .withColumn("score",
          round(col("cnt") * log(lit(n.toDouble) / col("df")), 6))
      graft.operators.TopK.perKey(scored, Seq("doc_id"),
          Seq(col("score").desc, col("term").asc), k,
          saltExpr = hash(col("term")))
        .select(col("doc_id"), col("rank"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // 16-bit SimHash document fingerprint from per-token md5 hashes:
    // bit i of the fingerprint is the sign of Σ_tokens (±1 by token-hash
    // bit i). Pure HOF fold — one pass over each doc's token array.
    "q36_simhash" -> ((s, d) => {
      // Native one-pass kernels (graft_hash16_arr + graft_simhash16): the
      // HOF formulation ran an interpreted md5 tree per token PLUS sixteen
      // interpreted aggregate folds over the hash array per row. Identical
      // integer arithmetic (SimHashParitySpec pins the HOF equivalence).
      Tables.documents(s, d)
        .select(col("doc_id"),
          call_function("graft_simhash16",
            TextFns.hash16Array(TextFns.tokens(col("text")))).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // SQL-PARSER SURFACE gate (q36's spark.sql twin): every other gate
    // builds through the DataFrame API, so the GraftExtensions function
    // registry — parser resolution of `graft_hash16_arr`/`graft_simhash16`
    // through FunctionIdentifier, argument binding, the ExpressionInfo
    // wiring — had zero per-round coverage: a registration regression
    // would pass the whole gate while breaking every plain-SQL user. This
    // query is the identical kernel chain expressed as a SQL string over a
    // temp view; the oracle is q36's VERBATIM, so the two front doors can
    // never drift.
    "q206_sql_simhash" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("graft_sql_documents")
      s.sql("""
        SELECT doc_id,
               graft_simhash16(graft_hash16_arr(
                 filter(split(trim(text), '\\s+'), t -> t != ''))) AS simhash
        FROM graft_sql_documents
        ORDER BY doc_id""")
    }),

    // COMPOSED CURATION PIPELINE (the five-stage path a real training-data
    // run chains, gated as ONE query so stage-interface drift — a schema
    // change, a keep-flag inversion, a survivor-set recount — fails the
    // hash even when every stage passes its own gate): exact dedup (q33's
    // keep-lowest-id kernel) → quality keep-gate (q131's three
    // language-agnostic rules; the stopword rule would empty every
    // non-en language here — the corpus embeds stopwords only for en —
    // and a single-language survivor set would make the mixture stage
    // vacuous; p_stop stays covered by q131's own gate) → decontamination
    // (q79's 8-gram bench overlap, bench set
    // drawn from the FULL corpus — the eval suite is external and fixed,
    // not subject to upstream curation) → mixture balancing (q80's
    // integer-exact hash gate, quotas recomputed over the SURVIVORS — the
    // stage-coupling the single-operator gates can't see) → sequence
    // packing (q68's per-lang cumsum). Scale shape per stage is each
    // operator's own: keyed aggs, a broadcast bench semi-join, a 5-row
    // quota broadcast, one per-lang window — nothing new materializes.
    "q209_pipeline_curation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), TextFns.tokens(col("text")).as("toks"))
      // S1 — exact dedup: survivors = min doc_id per 2-token prefix key.
      val keep1 = docs
        .select(col("doc_id"),
          concat_ws(" ", slice(col("toks"), 1, 2)).as("key"))
        .groupBy(col("key")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val s1 = docs.join(keep1, Seq("doc_id"), "left_semi")
      // S2 — quality cascade (q131's language-agnostic predicates as a
      // keep-filter).
      val s2 = s1.filter(size(col("toks")) > 0)
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("sum_len",
          expr("cast(aggregate(toks, 0L, (a, x) -> a + length(x)) as bigint)"))
        .withColumn("max_rep", expr(
          "cast(array_max(transform(array_distinct(toks)," +
          " x -> size(filter(toks, y -> y = x)))) as bigint)"))
        .filter(col("n") >= 5 && col("n") <= 1000 &&
          lit(2) * col("n") <= col("sum_len") &&
          col("sum_len") <= lit(12) * col("n") &&
          lit(5) * col("max_rep") <= col("n"))
        .select(col("doc_id"), col("lang"), col("toks"), col("n"))
      // S3 — decontaminate: bench grams from the FULL corpus (docs ≡ 0
      // mod 10), tiny by construction → broadcast semi-join.
      val N = 8
      val bench = docs
        .filter(col("doc_id") % 10 === 0 && size(col("toks")) >= N)
        .select(explode(TextFns.wordShingles(col("toks"), N)).as("gram"))
        .distinct()
      val contaminated = s2.filter(size(col("toks")) >= N)
        .select(col("doc_id"), explode(TextFns.wordShingles(col("toks"), N)).as("gram"))
        .join(broadcast(bench), Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct()
      val s3 = s2.filter(col("doc_id") % 10 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
      // The survivor relation feeds BOTH the quota census and the main
      // S4/S5 chain, and the r20 executed-plan audit showed the whole
      // dedup→quality→decontaminate subtree re-planned per consumer (15
      // corpus scans for one query, 3 reused exchanges). Stages S4/S5 only
      // need (doc_id, lang, n) — project the toks payload away FIRST, then
      // one eager localCheckpoint pins the narrow survivors (per-invocation
      // RDD; the q189 barrier discipline — materializing survivors between
      // stages is also exactly what a production curation pipeline does).
      val s3n = s3.select(col("doc_id"), col("lang"), col("n"))
        .localCheckpoint(true)
      // S4 — mixture balance over the survivors: quotas from the s3
      // census (5-row agg + window + broadcast back, q80's shape).
      val perLang = s3n.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val quotas = perLang
        .withColumn("n_total", sum(col("n_docs")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .withColumn("quota", expr("(n_total * 3) div 20"))
        .select(col("lang"), col("n_docs"), col("quota"))
      val s4 = s3n.join(broadcast(quotas), Seq("lang"))
        .filter(graft.functions.KeepGate.ltScaled(
          graft.functions.KeepGate.draw("mix", col("doc_id")),
          col("n_docs"), col("quota")))
      // S5 — sequence packing (q68's per-lang cumsum, cap 512).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      s4.select(col("doc_id"), col("lang"), col("n"))
        .withColumn("cum_prev", coalesce(sum(col("n")).over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("n"),
          expr("cum_prev DIV 512").as("first_seq"),
          expr("(cum_prev + n - 1) DIV 512").as("last_seq"),
          expr("cum_prev % 512").as("seq_offset"))
        .orderBy(col("doc_id"))
    }),

    // Blocked n-gram Jaccard: char-3-gram similarity for all pairs within a
    // (lang, source, length-bucket) block — the classic blocking pattern
    // that turns an O(n²) comparison into per-block joins keyed on the
    // block id. The length bucket (n_chars div 100) is part of the blocking
    // scheme: near-identical docs have near-identical lengths, and it cuts
    // the candidate pair count ~5× here (quadratically in general). A
    // size-ratio prefilter (Jaccard >= t implies set sizes within 1/t of
    // each other) prunes the remaining non-starters before the expensive
    // set intersection.
    "q37_trigram_jaccard" -> ((s, d) => {
      blockedJaccardPairs(trigramDocs(s, d), MaxBlock)
        .filter(col("jacc") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Deterministic stratified sampling: per-language keep rates applied
    // via a content-independent hash gate (md5 of the doc id mod 100 <
    // rate) — the reproducible downsampling a training-data pipeline
    // needs for over-represented languages, with NO RNG (every engine,
    // every run, every partitioning draws the same sample; Spark's
    // sampleBy cannot be mirrored cross-engine). Pure map + one agg.
    "q49_stratified_sample" -> ((s, d) => {
      val rates: Column = map(
        lit("en"), lit(30), lit("es"), lit(60), lit("de"), lit(60),
        lit("fr"), lit(80), lit("zh"), lit(100))
      Tables.documents(s, d)
        .withColumn("keep", graft.functions.KeepGate.pct(
          graft.functions.KeepGate.draw("samp", col("doc_id")),
          coalesce(rates(col("lang")), lit(100))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy(col("lang"))
    }),

    // Approximate distinct with a hard accuracy gate: at 100 TB the
    // cardinality question ("how many distinct documents per language?")
    // is answered by a mergeable HLL++ sketch (map-side partials, tiny
    // merge — no shuffle of the distinct VALUES themselves, which is what
    // an exact countDistinct costs). The gate computes BOTH in one query
    // and asserts the sketch lands within 3·rsd of the exact count — the
    // oracle pins the exact counts and the bound as a literal TRUE, so a
    // Spark-side sketch regression (or an rsd misconfiguration) fails the
    // hash compare. rsd = 0.05, bound = 0.15.
    "q58_approx_distinct_bound" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count_distinct(col("text")).as("exact_distinct"),
             approx_count_distinct(col("text"), 0.05).as("approx"))
        .select(col("lang"), col("exact_distinct"),
          (abs(col("approx") - col("exact_distinct")).cast("double") /
            col("exact_distinct") <= 0.15).as("within_bound"))
        .orderBy(col("lang"))
    }),

    // Rolling-hash document fingerprint (Rabin-Karp style): fold
    // h = (h*31 + tokenHash) mod 1e9+7 over the token sequence — ORDER
    // SENSITIVE, unlike SimHash (q36), so reordered-token documents get
    // different fingerprints. Pure HOF fold, one pass per doc; exact
    // grouped dup-counts on the fingerprint demonstrate the dedup use.
    "q48_rolling_fp" -> ((s, d) => {
      val M = 1000000007L
      val base = Tables.documents(s, d)
        .withColumn("hs", TextFns.hash32Array(TextFns.tokens(col("text"))))
        .withColumn("fp", aggregate(col("hs"), lit(0L),
          (acc, h) => (acc * 31 + h) % M))
      base.select(col("doc_id"), col("fp"),
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("fp"))).as("n_same_fp"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition filter (Rae et al. 2021 §A1.1 semantics,
    // re-expressed): per-document bigram repetition — the fraction of all
    // bigram occurrences taken by the single most frequent bigram
    // (top_gram_frac) and the fraction belonging to any repeated bigram
    // (dup_gram_frac) — plus the keep verdict at thresholds that actually
    // discriminate on this corpus (top <= 0.10 drops ~3%, dup <= 0.15
    // drops ~7%). The stats are PER-ROW facts, so the kernel is the native
    // one-pass graft_bigram_stats expression: grams never leave the row
    // and the query is a map-only scan plus the presentation sort — the
    // explode → (doc, gram) agg → per-doc agg formulation (retained below
    // as repetitionStatsGrouped, parity-pinned by BigramStatsParitySpec)
    // paid two whole-corpus shuffles for the same answer.
    "q63_repetition_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          call_function("graft_bigram_stats",
            TextFns.tokens(col("text"))).as("st"))
        .select(col("doc_id"),
          col("st.n_grams").as("n_grams"),
          col("st.max_gram_n").as("max_gram_n"),
          (col("st.max_gram_n").cast("double") / col("st.n_grams"))
            .as("top_gram_frac"),
          (col("st.dup_gram_n").cast("double") / col("st.n_grams"))
            .as("dup_gram_frac"))
        .withColumn("keep",
          col("top_gram_frac") <= 0.10 && col("dup_gram_frac") <= 0.15)
        .orderBy(col("doc_id"))
    }),

    // Governed heavy-hitters sketch (the q58/q61 pattern for frequent
    // items): a Misra-Gries summary (graft.functions.MisraGries, k = 20)
    // over the corpus CHARACTER stream — the one naturally skewed stream
    // in this synthetic corpus (letter frequencies; 7 of the top 10 clear
    // the n/(k+1) guarantee threshold at sf0.01). The gate joins the
    // sketch against exact counts for the exact top 10 and asserts the
    // two MG theorems: every guaranteed-frequency char is present, and no
    // estimate overcounts or undercounts by more than n/(k+1). Sketch
    // CONTENT is merge-order dependent, so only the guarantees are
    // emitted — raw counters would be flaky by construction. The global
    // window below runs over the 60-ish aggregated (char, count) rows,
    // not the stream.
    "q66_heavy_hitters_bound" -> ((s, d) => {
      val K = 20
      val mg = udaf(graft.functions.MisraGries(K),
        org.apache.spark.sql.Encoders.STRING)
      val chars = Tables.documents(s, d)
        .select(explode(split(regexp_replace(col("text"), "\\s+", ""), "")).as("c"))
        .filter(col("c") =!= "")
      val sketch = chars.agg(mg(col("c")).as("sk"))
        .select(explode(col("sk")).as(Seq("c", "est")))
      val counts = chars.groupBy(col("c")).agg(count(lit(1)).as("exact_n"))
        .withColumn("n", sum(col("exact_n"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      val top = counts
        .withColumn("guaranteed", col("exact_n") > col("n") / (K + 1.0))
        .orderBy(col("exact_n").desc, col("c")).limit(10)
      top.join(sketch, Seq("c"), "left")
        .select(col("c"), col("exact_n"), col("guaranteed"),
          (!col("guaranteed") || col("est").isNotNull).as("present_ok"),
          (coalesce(col("est"), lit(0L)) <= col("exact_n") &&
           col("exact_n") - coalesce(col("est"), lit(0L)) <=
             col("n") / (K + 1.0)).as("bound_ok"))
        .orderBy(col("exact_n").desc, col("c"))
    }),

    // Fixed-size token chunking with overlap (context-window prep): every
    // document becomes ceil-ish many 64-token windows at stride 48 (16
    // tokens of overlap), the standard RAG/pretraining chunker. Pure
    // per-row explode — embarrassingly parallel, no shuffle but the final
    // presentation sort; chunk starts are generated per row (sequence with
    // step), never via a driver-side loop. greatest(.,1) keeps the op
    // total on empty docs (one empty chunk, same as the oracle).
    "q67_doc_chunks" -> ((s, d) => {
      val ChunkLen = 64
      val Stride = 48
      Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          posexplode(sequence(lit(1), greatest(size(col("toks")), lit(1)),
            lit(Stride))).as(Seq("chunk_id", "start_tok")),
          col("toks"))
        .select(
          col("doc_id"),
          col("chunk_id").cast("long").as("chunk_id"),
          col("start_tok").cast("long").as("start_tok"),
          slice(col("toks"), col("start_tok"), lit(ChunkLen)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"), col("start_tok"),
          size(col("chunk")).as("chunk_len"),
          concat_ws(" ", col("chunk")).as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Token-stream sequence packing (pretraining batch prep): concatenate
    // documents in doc_id order WITHIN EACH LANG and cut the stream into
    // 512-token sequences — each doc reports the sequence span it lands
    // in and its offset in the first one. One window cumsum partitioned
    // by lang (keyed shuffle; at 100 TB the partition key is whatever
    // shard the packer owns — the plan shape is unchanged). All integer
    // arithmetic: DIV/'//' floor semantics on both engines, no float
    // division anywhere.
    "q68_seq_packing" -> ((s, d) => {
      val Cap = 512
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(TextFns.tokens(col("text"))).cast("long").as("n"))
        .withColumn("cum_prev", coalesce(sum(col("n")).over(w), lit(0L)))
        .select(col("doc_id"), col("lang"), col("n"),
          expr(s"cum_prev DIV $Cap").as("first_seq"),
          expr(s"(cum_prev + n - 1) DIV $Cap").as("last_seq"),
          expr(s"cum_prev % $Cap").as("seq_offset"))
        .orderBy(col("doc_id"))
    }),

    // PII scrub (the redaction pass every training corpus gets before
    // tokenization): the corpus itself is synthetic word salad, so the
    // PII is INJECTED deterministically from doc_id (an email and a
    // phone per doc), then scrubbed by the same regex family both
    // engines run. Per-row regexp map, no shuffle; the gate pins the
    // match counts, the md5 of the redacted text, and a residue check
    // that re-running the patterns on the redacted text finds nothing.
    "q70_pii_redact" -> ((s, d) => {
      val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val PhoneRe = "\\+1-555-[0-9]{3,4}"
      val withPii = Tables.documents(s, d)
        .withColumn("txt", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" now")))
      withPii
        .withColumn("redacted",
          regexp_replace(regexp_replace(col("txt"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"))
        .select(col("doc_id"),
          regexp_count(col("txt"), lit(EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("txt"), lit(PhoneRe)).cast("long").as("n_phones"),
          md5(col("redacted")).as("redacted_md5"),
          (regexp_count(col("redacted"), lit(EmailRe)) === 0 &&
           regexp_count(col("redacted"), lit(PhoneRe)) === 0).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Cross-document repeated n-gram spans (the exact-substring member of
    // the dedup family; q33 is whole-doc, q34/q37 are set-similarity —
    // this finds VERBATIM shared passages): every 5-token window that
    // appears in more than one document marks its token span, and a doc's
    // rep_frac is the fraction of its tokens covered by the union of those
    // spans. Plan: positional 5-gram explode → ONE (gram) shuffle agg for
    // cross-doc counts → semi-join back → per-doc interval union via a
    // single lead() window (spans sorted by start: covered = min(5,
    // next_start - start), 5 for the last — no interval list ever
    // materializes). Every stage is a keyed shuffle over n_tokens-scale
    // rows; nothing is quadratic in corpus size.
    "q71_repeated_ngrams" -> ((s, d) => {
      val N = 5
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
      // wordShingles pads short docs with one short gram — filtered here so
      // docs under N tokens contribute no positions (matches the oracle's
      // empty generate_series).
      val grams = t
        .select(col("doc_id"), col("n_toks"),
          posexplode(TextFns.wordShingles(col("toks"), N)).as(Seq("p0", "gram")))
        .filter(col("n_toks") >= N)
        .withColumn("pos", (col("p0") + 1).cast("long"))
      val rep = grams.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("gram"))
      val reppos = grams.join(rep, Seq("gram"), "left_semi")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val covered = reppos
        .withColumn("nxt", lead(col("pos"), 1).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_rep_grams"),
          sum(when(col("nxt").isNotNull,
              least(lit(N.toLong), col("nxt") - col("pos")))
            .otherwise(N.toLong)).as("covered_tokens"))
      t.select(col("doc_id"), col("n_toks"))
        .join(covered, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_toks"),
          coalesce(col("n_rep_grams"), lit(0L)).as("n_rep_grams"),
          coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
        .withColumn("rep_frac",
          col("covered_tokens").cast("double") / col("n_toks"))
        .withColumn("keep", col("rep_frac") <= 0.2)
        .orderBy(col("doc_id"))
    }),

    // Canonical-document selection per duplicate cluster: q59 resolves the
    // near-dup pair graph into components; production dedup keeps the BEST
    // member of each cluster, not the lowest id. Keeper = longest document
    // (n_chars), ties to the lowest doc_id — one row_number window over
    // the (members × component) relation, which is corpus-linear. Only
    // multi-member clusters appear (singletons have nothing to resolve).
    "q72_cluster_keeper" -> ((s, d) => {
      val pairs = confirmedPairs(s, d).select(col("doc_a"), col("doc_b"))
      val comp = graft.operators.ConnectedComponents(pairs, "doc_a", "doc_b")
      val m = comp.join(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        col("id") === col("doc_id"))
      val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
      val wr = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      m.withColumn("rn", row_number().over(wr))
        .withColumn("n_members", count(lit(1)).over(wc))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("keeper"),
          col("n_chars").as("keeper_n_chars"), col("n_members"))
        .orderBy(col("component"))
    }),

    // Deterministic WEIGHTED sampling (the mixture-building step of a
    // training-data pipeline: sample ~k docs per language with probability
    // proportional to size): doc kept iff hash32 · Σw < k · w · 2^32,
    // via KeepGate.ltScaledK — exact wide-integer arithmetic (tight
    // decimal operand precisions here,
    // HUGEINT in the oracle — so the gate cannot overflow at ANY corpus
    // scale (an int64 product h·Σw wraps silently in Spark once a
    // language's Σ n_chars reaches 2^31 ≈ 2 GB of text, while DuckDB
    // raises — exactly the scale this pipeline targets). Operand
    // precisions (10,0)·(19,0) → (30,0) and (2,0)·(19,0)·(10,0) →
    // (33,0) stay under 38, so every product is exact. The keep set is
    // bit-reproducible under any partitioning, like q49's unweighted
    // gate. Docs with w ≥ Σw/k are always kept (probability clamps at
    // 1 — the standard expected-size semantics). One tiny per-lang Σw
    // agg broadcast back; no window over the corpus.
    "q75_weighted_sample" -> ((s, d) => {
      val K = 20
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars").as("w"))
      val sums = docs.groupBy(col("lang")).agg(sum(col("w")).as("sum_w"))
      docs.join(broadcast(sums), Seq("lang"))
        .withColumn("h", graft.functions.KeepGate.draw("wsamp", col("doc_id")))
        .select(col("doc_id"), col("lang"), col("w"),
          graft.functions.KeepGate.ltScaledK(
            col("h"), col("sum_w"), K, col("w")).as("kept"))
        .orderBy(col("doc_id"))
    }),

    // One BPE merge round (vocab induction over the corpus): the top-10
    // adjacent CHARACTER pairs weighted by token frequency — the argmax of
    // exactly this table is the pair a byte-pair encoder would merge
    // first. Plan shape is why this scales: the corpus collapses to the
    // DISTINCT-token frequency relation first (one keyed shuffle agg,
    // |vocab| rows — bounded by the language, not the corpus), and the
    // pair explode runs over that tiny relation. All-integer weights; the
    // final window ranks the |alphabet|²-bounded pair table, not data.
    "q76_bpe_merge_step" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      val pairs = tf
        .select(col("f"), explode(TextFns.charShingles(col("tok"), 2)).as("pair"))
        .filter(length(col("pair")) === 2) // drop the 1-char-token degenerate
        .groupBy(col("pair")).agg(sum(col("f")).as("w"))
      pairs
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("w").desc, col("pair"))).cast("int"))
        .filter(col("rank") <= 10)
        .select(col("rank"), col("pair"), col("w"))
        .orderBy(col("rank"))
    }),

    // Per-group z-score normalization (feature scaling for mixture
    // balancing): population mean/std of doc length per language from
    // INTEGER sums (count, Σx, Σx² as longs — the shuffle agg carries no
    // floats, so the derived doubles are bit-identical on both engines),
    // broadcast back, z rounded to 6 dp before the outlier verdict so a
    // last-ulp sqrt difference can never flip the gate. A degenerate
    // group (sd = 0: every doc one length) yields NULL z / NULL verdict
    // on both engines — q82's MAD = 0 convention — instead of NaN/±Inf,
    // whose compare/serialization semantics the engines need not share.
    // One agg + one broadcast join at any corpus size.
    "q77_zscore" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val stats = docs.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("s2"))
      docs.join(broadcast(stats), Seq("lang"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("sd", sqrt(col("s2").cast("double") / col("n")
          - col("mean") * col("mean")))
        .withColumn("z", when(col("sd") > 0.0,
          round((col("n_chars") - col("mean")) / col("sd"), 6)))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("mean"), 6).as("mean_len"), round(col("sd"), 6).as("sd_len"),
          col("z"), when(col("z").isNotNull, abs(col("z")) > 2.0).as("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // Winsorization at the exact per-group [p5, p95] nearest-rank
    // percentiles — clamping composed from the SAME scale-safe histogram
    // percentile operator as q13 (functions/Percentiles: no per-group
    // whole-sort task at any size), demonstrating operator reuse: BOTH
    // quantiles come from ONE nearestRanksByGroup histogram pass (one
    // corpus scan, one histogram shuffle — not two independent percentile
    // jobs), broadcast back onto the corpus for the per-row clamp.
    "q78_winsorize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val lens = docs.withColumn("len", col("n_chars").cast("double"))
      val pcts = graft.functions.Percentiles
        .nearestRanksByGroup(lens, Seq("lang"), "len", Seq(0.05, 0.95))
      docs.join(broadcast(pcts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("p5").cast("long").as("p05_len"),
          col("p95").cast("long").as("p95_len"),
          least(greatest(col("n_chars"), col("p5").cast("long")),
            col("p95").cast("long")).as("clamped"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination (the GPT-3-style 8-gram overlap check):
    // docs whose id is ≡ 0 (mod 10) stand in for the eval/benchmark set
    // (large enough that the corpus's planted duplicate structure crosses
    // the train/eval split — mod 97 caught zero dup partners); every
    // training doc sharing ANY 8-token window with it is flagged.
    // Scale shape: the benchmark gram set is tiny by construction (an
    // eval suite, not a corpus) → distinct + broadcast left-semi join;
    // the training side streams through map-side. Nothing all-pairs, no
    // shuffle of the corpus beyond the per-doc hit count agg.
    "q79_decontaminate" -> ((s, d) => {
      val N = 8
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
      // wordShingles pads <N-token docs with one short gram — filter so
      // they contribute no windows (oracle's generate_series is empty).
      val grams = t.filter(col("n_toks") >= N)
        .select(col("doc_id"), explode(TextFns.wordShingles(col("toks"), N)).as("gram"))
      val bench = grams.filter(col("doc_id") % 10 === 0)
        .select(col("gram")).distinct()
      val hits = grams.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(bench), Seq("gram"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("gram")).as("n_hit"))
      t.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("n_toks"))
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_toks"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)) > 0L).as("contaminated"))
        .orderBy(col("doc_id"))
    }),

    // Mixture/domain balancing: hit a target language mixture (a uniform
    // per-language quota of 3% of corpus size each — sized so the
    // corpus's skewed languages split both ways: minority languages run
    // under quota (uncapped), the majority one is downsampled) by
    // per-language deterministic sampling. quota = (N·3) div 20 in pure
    // integer arithmetic;
    // keep iff hash32('mix|'||id)·n_l < quota_l·2^32 — the same
    // integer-exact, partitioning-independent gate family as q49/q75,
    // evaluated like q75 in exact wide-integer arithmetic
    // (decimal(38,0) / oracle HUGEINT: quota·2^32 would wrap int64 at
    // ~2^31 corpus docs — a few-TB corpus) (expected kept = quota,
    // capped at n_l when the language is under quota — the inequality
    // handles the clamp for free since hash32 < 2^32). The corpus
    // total rides a window over the 5-row per-language aggregate,
    // never a scalar collect.
    "q80_mixture_balance" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val quotas = perLang
        .withColumn("n_total", sum(col("n_docs")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .withColumn("quota", expr("(n_total * 3) div 20"))
      docs.join(broadcast(quotas), Seq("lang"))
        .withColumn("h", graft.functions.KeepGate.draw("mix", col("doc_id")))
        .withColumn("kept", graft.functions.KeepGate.ltScaled(
          col("h"), col("n_docs"), col("quota")))
        .groupBy(col("lang"))
        .agg(max(col("n_docs")).as("n_docs"), max(col("quota")).as("quota"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          (max(col("quota")) >= max(col("n_docs"))).as("uncapped"))
        .orderBy(col("lang"))
    }),

    // Per-doc bigram-LM surprisal (KenLM-style quality scoring): add-one
    // smoothed corpus bigram model P(w2|w1) = (c2+1)/(c1+V), per-doc
    // score = avg −ln P over its bigram positions, rounded to 6 dp on
    // both engines BEFORE the keep verdict (summation-order ulps can
    // never flip the gate). V = distinct predicted-word types, computed
    // as a 1-row scalar aggregate and broadcast back (the q88 node-count
    // shape — no task ever holds the vocabulary set). The count
    // relations join back keyed on gram/w1 — plain equi-joins, AQE free
    // to broadcast.
    "q81_bigram_surprisal" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"))
        .join(materializedSurprisal(s, d)
          .select(col("doc_id"), col("n_bigrams"), col("avg_nll")),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          col("avg_nll"),
          when(col("n_bigrams").isNull, lit(true))
            .otherwise(col("avg_nll") <= 3.43).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Robust per-group scaling (median/MAD — the outlier-resistant
    // alternative to q77's z-score): per-language exact nearest-rank
    // median of doc length, MAD = exact nearest-rank median of absolute
    // deviations, robust score r = (x − med)/(1.4826·MAD) rounded to
    // 6 dp, |r| > 1.35 flags the tail (cutoff where THIS corpus
    // discriminates: uniform-ish lengths top out near |r| ≈ 1.8, so the
    // textbook 3.0 would be vacuously false at every tier — same
    // corpus-calibrated-threshold policy as q63). BOTH medians ride the SAME
    // scale-safe histogram percentile operator as q13/q78 (one row per
    // group out, broadcast back — no per-group whole-sort at any corpus
    // size); a zero MAD (degenerate constant group) yields NULL scores,
    // never a division blow-up.
    "q82_robust_scale" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val lens = docs.withColumn("len", col("n_chars").cast("double"))
      val med = graft.functions.Percentiles
        .nearestRankByGroup(lens, Seq("lang"), "len", 0.50)
        .withColumnRenamed("p50", "med")
      val dev = docs.join(broadcast(med), Seq("lang"))
        .withColumn("adev", abs(col("n_chars").cast("double") - col("med")))
      val mad = graft.functions.Percentiles
        .nearestRankByGroup(dev, Seq("lang"), "adev", 0.50)
        .withColumnRenamed("p50", "mad")
      docs.join(broadcast(med), Seq("lang")).join(broadcast(mad), Seq("lang"))
        .withColumn("r", when(col("mad") > 0.0,
          round((col("n_chars").cast("double") - col("med"))
            / (lit(1.4826) * col("mad")), 6)))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("med"), col("mad"), col("r"),
          when(col("r").isNotNull, abs(col("r")) > 1.35).as("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // EXACT set-containment join via prefix filtering (the PPJoin-family
    // idea): detects sub-document duplication — a short doc swallowed by
    // a long one scores high containment while its Jaccard stays low, so
    // the q34 MinHash bands (tuned to Jaccard) systematically miss it.
    // Guarantee: if C(A,B) = |A∩B|/|A| ≥ t, then A's |A|−⌈t·|A|⌉+1
    // smallest shingle hashes cannot ALL miss B (else |A∩B| ≤ ⌈t·|A|⌉−1
    // < t·|A|), so joining every doc's hash-sorted prefix against the
    // full posting index finds every qualifying pair — no recall loss,
    // unlike LSH. The prefix length is computed in pure INTEGER
    // arithmetic (⌈9n/10⌉ = (9n+9) div 10) on BOTH engines: a float
    // 1−t literal (0.0999…98) shortens the prefix by one whenever |A|
    // is a multiple of 10, silently breaking the lemma.
    // Scale shape: prefix explode is ~(1−t) of the shingle volume; the
    // posting join is a plain hash equi-join with data-bounded bucket
    // sizes; exact confirm reuses the zero-allocation sorted-merge
    // intersection kernel. Both sides read the standing materialized
    // shingle table.
    "q83_containment_pairs" -> ((s, d) => {
      val t = 0.9
      val shS = materializedShingles(s, d)
        .select(col("doc_id"), array_sort(col("hs")).as("hs"))
      val pref = shS.select(col("doc_id"),
        explode(expr("slice(hs, 1, cast(size(hs) - ((9 * size(hs) + 9) div 10) + 1 as int))")).as("h"))
      val post = shS.select(col("doc_id").as("pid"), explode(col("hs")).as("h"))
      val cand = pref.join(post, Seq("h"))
        .filter(col("doc_id") =!= col("pid"))
        .select(least(col("doc_id"), col("pid")).as("doc_a"),
                greatest(col("doc_id"), col("pid")).as("doc_b"))
        .distinct()
      cand
        .join(shS.select(col("doc_id").as("ida"), col("hs").as("ha")),
          col("doc_a") === col("ida"))
        .join(shS.select(col("doc_id").as("idb"), col("hs").as("hb")),
          col("doc_b") === col("idb"))
        .withColumn("isz", expr("graft_sorted_icount(ha, hb)"))
        .withColumn("c_small",
          col("isz").cast("double") / least(size(col("ha")), size(col("hb"))))
        .filter(col("c_small") >= t)
        .select(col("doc_a"), col("doc_b"),
          col("isz").cast("long").as("n_common"),
          round(col("c_small"), 6).as("containment"),
          round(col("isz").cast("double")
            / (size(col("ha")) + size(col("hb")) - col("isz")), 6).as("jacc"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Per-doc n-gram novelty (dataset-curation ordering stat): fraction
    // of a doc's distinct shingle types it is the FIRST owner of, in
    // doc_id (arrival) order — exact copies score 0, boilerplate-heavy
    // docs score low, fresh content scores high. Two keyed shuffle aggs
    // over the standing shingle table (gram → min owner, then per-doc
    // counts); the first-owner rule is the same keep-lowest-id convention
    // as q35/q51.
    "q84_ngram_novelty" -> ((s, d) => {
      val e = materializedShingles(s, d)
        .select(col("doc_id"), explode(col("hs")).as("h"))
      val first = e.groupBy(col("h")).agg(min(col("doc_id")).as("first_owner"))
      e.join(first, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_types"),
          sum(when(col("first_owner") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel").cast("double") / col("n_types"), 6))
        .withColumn("keep", col("novelty") >= 0.5)
        .orderBy(col("doc_id"))
    }),

    // PMI phrase detection (collocation mining): top-20 word bigrams by
    // pointwise mutual information ln(P(w1w2)/(P(w1)P(w2))) with a
    // min-count floor of 5; PMI rounded to 6 dp BEFORE ranking (libm ulps
    // never flip a tie), ties broken by gram. The corpus collapses to the
    // unigram and bigram TYPE relations first (two keyed shuffle aggs,
    // |vocab|- and |vocab|²-bounded); the N1/N2 totals are 1-row scalar
    // aggregates broadcast back (the q88 node-count shape — no global
    // window funnels a |vocab|²-bounded relation through one task), and
    // the global rank sorts a re-aggregated compact relation.
    "q85_pmi_phrases" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      val uc = t.select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("u"))
      val uni = uc.join(broadcast(uc.agg(sum(col("u")).as("n1"))), expr("true"))
      val bc = t.filter(size(col("toks")) >= 2)
        .select(explode(TextFns.wordShingles(col("toks"), 2)).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("c2"))
      val bi = bc.join(broadcast(bc.agg(sum(col("c2")).as("n2"))), expr("true"))
        .withColumn("w1", split(col("gram"), " ").getItem(0))
        .withColumn("w2", split(col("gram"), " ").getItem(1))
      val scored = bi.filter(col("c2") >= 5)
        .join(uni.select(col("tok").as("w1"), col("u").as("u1"), col("n1")),
          Seq("w1"))
        .join(uni.select(col("tok").as("w2"), col("u").as("u2")), Seq("w2"))
        .withColumn("pmi", round(log(
          (col("c2").cast("double") / col("n2")) /
          ((col("u1").cast("double") / col("n1"))
            * (col("u2").cast("double") / col("n1")))), 6))
      scored.groupBy(col("gram"))
        .agg(max(col("c2")).as("c2"), max(col("pmi")).as("pmi"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("pmi").desc, col("gram"))).cast("int"))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("gram"), col("c2"), col("pmi"))
        .orderBy(col("rank"))
    }),

    // Content-defined chunking + chunk-level dedup (the storage-style
    // member of the dedup family): a chunk boundary falls AFTER any token
    // whose salted hash ≡ 0 (mod 8), so boundaries follow content — an
    // insertion perturbs only its own chunk and the stream re-synchronizes,
    // unlike q67's fixed stride where one leading edit re-keys every
    // downstream chunk. Chunk ids are a per-doc prefix-sum window over the
    // boundary flags; chunk texts assemble with an order-pinned collect;
    // ONE keyed shuffle agg on the chunk fingerprint finds cross-doc
    // shared chunks and joins back per doc. Linear in token volume —
    // no pairwise comparison at any stage.
    "q86_cdc_chunks" -> ((s, d) => {
      val D = 8
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFns.tokens(col("text"))).as(Seq("p0", "tok")))
        .withColumn("pos", (col("p0") + 1).cast("long"))
        .withColumn("brk",
          (TextFns.hash32(concat(lit("cdc|"), col("tok"))) % D === 0)
            .cast("long"))
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val chunks = toks
        .withColumn("chunk", coalesce(sum(col("brk")).over(wPrev), lit(0L)))
        .groupBy(col("doc_id"), col("chunk"))
        .agg(
          md5(concat_ws(" ",
            transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
              e => e.getField("tok")))).as("ck"),
          count(lit(1)).cast("long").as("clen"))
      // r19 A/B note: materializing `chunks` once (eager localCheckpoint)
      // to kill the double-planned tokenize → break-window → collect_list
      // subtree measured WORSE isolated (1.30 → 1.55 s, jobs 10 → 12) —
      // the collect_list-struct rows are expensive to store, and the
      // branches' scans pipeline better than a materialize-then-read
      // barrier. Kept recompute; a ck-partitioned window variant was
      // rejected outright (boilerplate chunks are corpus-bounded hot keys
      // and only a JOIN is AQE-skew-splittable, guide §2.5).
      val shared = chunks.groupBy(col("ck"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("ck"), lit(1L).as("dup"))
      val agg = chunks.join(shared, Seq("ck"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(coalesce(col("dup"), lit(0L))).as("n_dup_chunks"),
          sum(col("clen")).as("n_toks"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
          coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
          coalesce(col("n_toks"), lit(0L)).as("n_toks"),
          when(coalesce(col("n_chunks"), lit(0L)) > 0,
            round(coalesce(col("n_dup_chunks"), lit(0L)).cast("double")
              / col("n_chunks"), 6)).as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    // Positional inverted index (the search-engine build primitive): the
    // top-20 terms by document frequency with their posting lists —
    // per-posting "doc:first_pos:tf" entries pinned in doc_id order. The
    // corpus collapses to the (term, doc) relation first (one keyed
    // shuffle agg), term stats re-aggregate THAT (|vocab| rows), and the
    // global rank window sorts aggregate output — the sanctioned shape.
    // Posting assembly joins the broadcast top-20 back against the
    // (term, doc) relation: per-term work is df-bounded, never corpus².
    "q87_postings" -> ((s, d) => {
      val K = 20
      val pe = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFns.tokens(col("text"))).as(Seq("p0", "term")))
        .withColumn("pos", (col("p0") + 1).cast("long"))
      val perDoc = pe.groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"), min(col("pos")).as("first_pos"))
      val top = perDoc.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("df").desc, col("cf").desc, col("term"))).cast("int"))
        .filter(col("rank") <= K)
      perDoc.join(broadcast(top), Seq("term"))
        .groupBy(col("rank"), col("term"), col("df"), col("cf"))
        .agg(concat_ws("|", transform(
            array_sort(collect_list(struct(col("doc_id"), col("first_pos"), col("tf")))),
            e => concat_ws(":", e.getField("doc_id").cast("string"),
              e.getField("first_pos").cast("string"),
              e.getField("tf").cast("string"))))
          .as("postings"))
        .orderBy(col("rank"))
    }),

    // TextRank keyword extraction (iterative graph centrality — PageRank
    // over the word co-occurrence graph, the corpus-level cousin of q59's
    // connected components): undirected edges between ADJACENT tokens with
    // count ≥ 2, three damped power-iteration steps, top-20 words by rank.
    // All rank arithmetic is FIXED-POINT integer (scale 10^12, explicit
    // integer division at every step), so the scores are bit-identical
    // across engines and partitionings — no float summation order in any
    // verdict. Scale shape: the graph relations are |vocab|- and
    // |vocab|²-bounded aggregates of the corpus, each iteration is one
    // keyed equi-join + one keyed shuffle agg over the edge relation, and
    // the final rank window sorts a re-aggregated compact relation.
    "q88_textrank" -> ((s, d) => {
      val K = 20
      // The graph is an aggregate of the corpus; the power iteration below
      // references it once per step, so it lands in the materialize-once
      // store — each iteration scans the compact standing edge table, not
      // the raw corpus (the same CREATE-TABLE-then-iterate shape a
      // warehouse deployment would use).
      val e = materialize(
          s"textrank_edges|$d|${fingerprint(d, "documents.parquet")}", s) {
        val t = Tables.documents(s, d)
          .select(TextFns.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 2)
        t.select(explode(expr(
            "transform(sequence(1, size(toks) - 1)," +
            " i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))"))
            .as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("u"),
                  greatest(col("a"), col("b")).as("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
      }
      val dir = e.select(col("u").as("src"), col("v").as("dst"), col("w"))
        .union(e.select(col("v").as("src"), col("u").as("dst"), col("w")))
      val wsum = dir.groupBy(col("src")).agg(sum(col("w")).as("wu"))
      val nn = wsum.agg(count(lit(1)).as("n"))
      // (node, r, n): r0 = SCALE div N, carried with the 1-row broadcast N.
      val nodes = wsum.select(col("src").as("node"))
        .join(broadcast(nn), expr("true"))
      val dirW = dir.join(wsum, Seq("src"))
      var r = nodes.select(col("node"), col("n"),
        expr("cast(1000000000000 as bigint) div n").as("r"))
      for (_ <- 1 to 3) {
        val contrib = dirW
          .join(r.select(col("node").as("src"), col("r")), Seq("src"))
          .groupBy(col("dst"))
          .agg(sum(expr("(r * w) div wu")).as("s"))
        r = nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left_outer")
          .select(col("node"), col("n"),
            expr("((cast(1000000000000 as bigint) * 15) div 100) div n" +
              " + (85 * coalesce(s, cast(0 as bigint))) div 100").as("r"))
      }
      r.groupBy(col("node")).agg(max(col("r")).as("score_fp"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score_fp").desc, col("node"))).cast("int"))
        .filter(col("rank") <= K)
        .select(col("rank"), col("node").as("word"), col("score_fp"))
        .orderBy(col("rank"))
    }),

    // Cross-source n-gram overlap matrix (corpus provenance audit: which
    // ingestion sources carry the same content): distinct shingle-hash
    // sets per SOURCE off the standing shingle table, gram-keyed
    // self-join for shared counts, overlap coefficient |A∩B|/min. Output
    // is sources²-bounded; per-gram join work is (sources carrying the
    // gram)² ≤ sources² — a hot boilerplate gram cannot blow up a
    // bucket, unlike a doc-keyed join.
    "q89_source_overlap" -> ((s, d) => {
      val sg = materializedShingles(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .select(col("source"), explode(col("hs")).as("h"))
        .distinct()
      val sz = sg.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val ov = sg.as("a").join(sg.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_common"))
      ov.join(broadcast(sz.select(col("source").as("source_a"), col("n").as("n_a"))),
          Seq("source_a"))
        .join(broadcast(sz.select(col("source").as("source_b"), col("n").as("n_b"))),
          Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("n_common"),
          col("n_a"), col("n_b"),
          round(col("n_common").cast("double")
            / least(col("n_a"), col("n_b")), 6).as("overlap"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // CCNet-style perplexity bucketing (head/middle/tail thirds per
    // language by LM surprisal — the canonical quality-stratification
    // step before mixture sampling): q81's add-one-smoothed bigram-LM
    // avg −ln P per doc (6-dp rounded BEFORE any compare), then exact
    // per-language nearest-rank p33/p67 from ONE shared histogram pass
    // (Percentiles.nearestRanksByGroup, same scale-safe operator as
    // q13/q78/q82), broadcast back for the bucket label. Docs too short to score (no bigrams) keep a
    // NULL bucket rather than polluting a tier.
    "q90_surprisal_buckets" -> ((s, d) => {
      val sc = materializedSurprisal(s, d)
      val base = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(sc.select(col("doc_id"), col("avg_nll")), Seq("doc_id"), "left_outer")
      val withVal = sc.select(col("lang"), col("avg_nll"))
      val pcts = graft.functions.Percentiles
        .nearestRanksByGroup(withVal, Seq("lang"), "avg_nll", Seq(0.33, 0.67))
      base.join(broadcast(pcts), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("avg_nll"),
          col("p33"), col("p67"),
          when(col("avg_nll").isNull, lit(null).cast("string"))
            .when(col("avg_nll") <= col("p33"), lit("head"))
            .when(col("avg_nll") <= col("p67"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .orderBy(col("doc_id"))
    }),

    // BM25 ranked retrieval (the IR scoring the q87 inverted index
    // exists to serve): top-10 docs for a fixed 3-term disjunctive
    // query, k1 = 1.2, b = 0.75, idf = ln((N−df+0.5)/(df+0.5)+1) (the
    // always-positive Lucene form). Per-term contributions are
    // FIXED-POINT (×1e9, rounded to int64) before the per-doc sum, so
    // the score is independent of float summation order on both
    // engines; 6-dp rounded before ranking. Scale shape: the term
    // filter is a 3-literal isin pushed to the scan; tf is one keyed
    // shuffle agg over matching positions only; df (3 rows) and the
    // corpus N/avgdl (1 row) broadcast back; top-10 via orderBy+limit
    // = per-partition top-k + driver merge (TakeOrderedAndProject),
    // never a global sort of the scored relation.
    "q93_bm25" -> ((s, d) => {
      bm25Scored(s, d)
        .select(col("doc_id"), col("dl"), col("n_hit"),
          round(col("sfp") / 1e9, 6).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    }),

    // Per-source unigram KL divergence vs the corpus distribution (the
    // domain-shift / provenance-drift audit a mixture pipeline runs
    // before reweighting): KL(P_src ‖ P_corpus) = Σ_w p·ln(p/q) over
    // the source's token types. Per-type contributions are fixed-point
    // (×1e12 int64) before the per-source sum — order-independent like
    // q88/q93. Scale shape: the corpus collapses to the (source, tok)
    // count relation (one keyed shuffle agg, |sources|·|vocab|-bounded);
    // per-source totals broadcast; the corpus-wide token counts join
    // back KEYED ON TOK (never a global window); the 1-row corpus total
    // broadcasts (q88 shape).
    "q94_source_kl" -> ((s, d) => {
      val u = Tables.documents(s, d)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
      val cs = u.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      val ns = cs.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
      val cw = cs.groupBy(col("tok")).agg(sum(col("c")).as("c_w"))
      val nn = cw.agg(sum(col("c_w")).as("n"))
      cs.join(broadcast(ns), Seq("source"))
        .join(cw, Seq("tok"))
        .join(broadcast(nn), expr("true"))
        .withColumn("kfp", expr(
          "cast(round((cast(c as double) / n_s)" +
          " * ln((cast(c as double) / n_s) / (cast(c_w as double) / n)) * 1e12) as bigint)"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_toks"), count(lit(1)).as("vocab"),
          round(sum(col("kfp")) / 1e12, 6).as("kl"))
        .orderBy(col("source"))
    }),

    // Per-doc token entropy + type-token ratio (the lexical-diversity
    // quality signals CCNet-style filters threshold on): H = −Σ p·ln p
    // over the doc's token types, fixed-point (×1e12) per-type
    // contributions so the per-doc sum is order-independent; entropy
    // 6-dp rounded BEFORE the keep verdict. Everything is doc-keyed:
    // one (doc, tok) shuffle agg, one doc agg, one keyed join back —
    // linear in token volume, no cross-doc stage at all.
    "q95_doc_entropy" -> ((s, d) => {
      val u = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      val c = u.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      val n = c.groupBy(col("doc_id")).agg(sum(col("c")).as("n"), count(lit(1)).as("types"))
      c.join(n, Seq("doc_id"))
        .withColumn("hfp", expr(
          "cast(round(-(cast(c as double) / n) * ln(cast(c as double) / n) * 1e12) as bigint)"))
        .groupBy(col("doc_id"), col("n"), col("types"))
        .agg(round(sum(col("hfp")) / 1e12, 6).as("entropy"))
        .select(col("doc_id"), col("n").as("n_toks"), col("types").as("n_types"),
          round(col("types").cast("double") / col("n"), 6).as("ttr"),
          col("entropy"), (col("entropy") >= 2.5).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Sketch-vs-exact audit for the MinHash estimator (the q58/q61/q66
    // governed-sketch discipline applied to the dedup family's own
    // sketch): for every confirmed q34 pair, the 8-component signature
    // agreement fraction IS the Jaccard estimate — reported next to the
    // exact sorted-merge Jaccard with its absolute error, so a
    // signature regression (permutation family, band wiring) shows up
    // as a value diff, not just recall drift. Rides the standing
    // shingle table; the signature join is doc-keyed; pair volume is
    // q34's (LSH-bounded, never all-pairs).
    "q96_minhash_estimate" -> ((s, d) => {
      val sig = materializedShingles(s, d)
        .select(col("doc_id"), TextFns.minhashSignature(col("hs"), NumHashes).as("mh"))
      confirmedPairs(s, d)
        .join(sig.select(col("doc_id").as("ida"), col("mh").as("ma")),
          col("doc_a") === col("ida"))
        .join(sig.select(col("doc_id").as("idb"), col("mh").as("mb")),
          col("doc_b") === col("idb"))
        .withColumn("n_match", expr(
          "aggregate(zip_with(ma, mb, (x, y) -> if(x = y, 1, 0)), 0, (a, e) -> a + e)")
          .cast("long"))
        .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"),
          col("n_match"),
          round(col("n_match") / lit(NumHashes.toDouble), 6).as("est_jacc"),
          round(abs(col("n_match") / lit(NumHashes.toDouble) - col("jacc")), 6)
            .as("abs_err"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Power-of-2 document-length histogram per language (the corpus
    // shape profile batch sizing and packing policies read): bucket =
    // ⌊log2(n_chars)⌋ computed as INTEGER bit-length − 1 on both
    // engines (never float log2, whose behavior at exact powers of two
    // is library-dependent). One keyed shuffle agg over (lang, bucket)
    // — |langs|·64-bounded output, linear scan, nothing else.
    "q97_length_buckets" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("bucket", (length(expr("bin(n_chars)")) - 1).cast("int"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // Zipf head coverage per language: the fraction of token volume the
    // top-10 tokens carry — the boilerplate/formulaic-content signal
    // (natural corpora sit near Zipf; template farms spike the head).
    // The corpus collapses to the (lang, tok) count relation first; the
    // rank window partitions BY LANG over that |vocab|-bounded
    // aggregate (the q62 shape — no global window, no corpus-sized
    // sort); per-lang totals broadcast back.
    "q98_head_coverage" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      val r = c.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("c").desc, col("tok"))))
      val n = c.groupBy(col("lang")).agg(sum(col("c")).as("n"))
      r.groupBy(col("lang"))
        .agg(sum(when(col("rn") <= 10, col("c")).otherwise(0L)).as("head_count"))
        .join(broadcast(n), Seq("lang"))
        .select(col("lang"), col("n").as("n_toks"), col("head_count"),
          round(col("head_count").cast("double") / col("n"), 6).as("head_cov"))
        .orderBy(col("lang"))
    }),

    // Temperature-scaled mixture resampling (the multilingual-balance
    // move: keep probability ∝ n_l^α with α = 0.5, so head languages are
    // suppressed toward the tail — the standard temperature-sampling
    // recipe): per-language weight w = √n_l is fix-pointed to 1e-6 BEFORE
    // the total (Σ of 6-dp-rounded doubles is summation-order-dependent;
    // Σ of their int64 images is exact), the keep threshold is derived
    // from exact integers through one identical double expression tree on
    // both engines, rounded once to an int32 gate, and each doc's verdict
    // is the hash32 gate family (q49/q75/q80) — deterministic under any
    // partitioning. Target volume = 30% of the corpus. Two tiny aggs
    // broadcast back; one linear pass; output is |langs| rows.
    "q101_temperature_resample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val pl = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
        .withColumn("w_fp",
          expr("cast(round(sqrt(cast(n_l as double)) * 1000000) as bigint)"))
      val tot = pl.agg(sum(col("w_fp")).as("sw_fp"), sum(col("n_l")).as("n"))
      val thr = pl.join(broadcast(tot), expr("true"))
        .withColumn("t_l", expr(
          "least(cast(4294967296 as bigint), cast(round(" +
          "cast((n * 3) div 10 as double) * w_fp / sw_fp * 4294967296 / n_l" +
          ") as bigint))"))
      docs.join(broadcast(thr), Seq("lang"))
        .withColumn("h", graft.functions.KeepGate.draw("temp", col("doc_id")))
        .groupBy(col("lang"))
        .agg(max(col("n_l")).as("n_docs"),
          round(max(col("w_fp")) / 1e6, 6).as("w_l"),
          max(col("t_l")).as("t_l"),
          sum(when(graft.functions.KeepGate.belowThreshold(
            col("h"), col("t_l")), 1L).otherwise(0L)).as("n_kept"))
        .select(col("lang"), col("n_docs"), col("w_l"), col("t_l"),
          col("n_kept"),
          round(col("n_kept").cast("double") / col("n_docs"), 6).as("keep_rate"))
        .orderBy(col("lang"))
    }),

    // SimHash near-dup JOIN (Manku et al., WWW'07 — the fingerprint-side
    // complement of q34's MinHash-LSH: one 48-bit int per doc instead of
    // an 8-long signature, hamming distance instead of band agreement):
    // pairs within hamming ≤ 3 must agree exactly on ≥ 1 of 4 disjoint
    // 12-bit bands (pigeonhole), so candidates come from a keyed
    // (band, key) equi-join — never all-pairs — and the exact popcount
    // confirm is one xor+bit_count per candidate. At 48 bits a random
    // pair passes hamming ≤ 3 with P ≈ 1.8e4/2^48, so survivors are
    // shared content, not hash noise (16-bit simhash, q36, is an audit
    // fingerprint — its collision rate makes it unusable as a JOIN key).
    // The fingerprint itself is the native one-pass graft_simhash48
    // kernel over vectorized md5-prefix token hashes. Band width widens
    // with corpus size in deployment (wider keys keep buckets data-
    // bounded, the q39 derived-geometry discipline); 12 bits is corpus-
    // calibrated here.
    "q102_simhash_neardup" -> ((s, d) =>
      simhashPairs(s, d).orderBy(col("doc_a"), col("doc_b"))),

    // Train/val/test split with LEAKAGE audit (the eval-integrity check a
    // training pipeline runs before shipping a split): docs are assigned
    // 90/5/5 by the deterministic hash32 gate, then every q34-confirmed
    // near-dup pair is scored for whether it CROSSES the train/eval
    // boundary — a val or test doc with a training-set near-duplicate
    // invalidates the eval. Output is every confirmed pair with both
    // split labels and the leak verdict. Scale shape: the split table is
    // a per-row map; the pair relation is q34's (LSH-bounded); two keyed
    // equi-joins attach splits.
    "q103_split_leakage" -> ((s, d) => {
      val sp = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("gate",
          TextFns.hash32(concat(lit("split|"), col("doc_id").cast("string")))
            % 100)
        .withColumn("split",
          when(col("gate") < 90, "train").when(col("gate") < 95, "val")
            .otherwise("test"))
        .select(col("doc_id"), col("split"))
      confirmedPairs(s, d)
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")),
          Seq("doc_a"))
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"),
          col("split_a"), col("split_b"),
          ((col("split_a") === "train") =!= (col("split_b") === "train"))
            .as("leak"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Duplication-graph degree profile (the hotspot view of the q34 pair
    // relation: template/boilerplate docs show up as high-degree nodes
    // long before q59's full component resolution): per-doc near-dup
    // degree, Jaccard-weighted degree, and strongest edge. The weighted
    // degree sums 1e-6 fix-pointed Jaccards (exact int64, summation-
    // order-free) and rounds once at the end. One union + one keyed agg
    // over the (LSH-bounded) pair relation.
    "q104_dup_degree" -> ((s, d) => {
      val p = confirmedPairs(s, d)
        .withColumn("jfp", expr("cast(round(jacc * 1000000) as bigint)"))
      p.select(col("doc_a").as("doc_id"), col("jfp"))
        .union(p.select(col("doc_b").as("doc_id"), col("jfp")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("degree"), sum(col("jfp")).as("wfp"),
          max(col("jfp")).as("mfp"))
        .select(col("doc_id"), col("degree"),
          round(col("wfp") / 1e6, 6).as("wdegree"),
          round(col("mfp") / 1e6, 6).as("max_jacc"))
        .orderBy(col("doc_id"))
    }),

    // Model-based quality filtering (the "apply the trained classifier"
    // stage of a corpus pipeline — FastText/logistic quality filters at
    // web scale are exactly this shape): a linear model over per-doc
    // features, evaluated in 1e-9 fixed-point per-contribution so the
    // score — and the keep verdict — is bit-exact on both engines (see
    // qualityScores). Pure per-row map + presentation sort; nothing
    // shuffles at any corpus size.
    "q105_quality_score" -> ((s, d) => {
      // 6-dp score via exact integer rounding of the fixed-point value:
      // sfp/1000.0 has fractional part k/1000 — representable exactly at
      // the only hazardous point (.5 is dyadic) and 1e-3 from the
      // boundary everywhere else — where round(sfp/1e9, 6) lands ON a
      // decimal half for ~1/1000 of rows and the engines' HALF_UP vs
      // binary-value rounding disagree (bit at the XL tier).
      qualityScores(s, d)
        .select(col("doc_id"), col("lang"), col("n_toks"),
          (expr("cast(round(sfp / 1000.0) as bigint)") / 1e6).as("score"),
          (col("sfp") > 0).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Threshold sweep / ROC audit of the q105 model against a weak label
    // (lang = en — the label the en-prior feature makes informative):
    // the SCALE-SAFE sweep shape is histogram-then-cumulate — scores
    // bucket at 0.2 width by integer-exact floor, ONE keyed agg collapses
    // the corpus to ~15 bucket rows, and the TPR/FPR curve is a
    // cumulative window DOWN the score axis over that aggregate (the
    // sanctioned aggregate-compacted global window), never a per-
    // threshold corpus rescan and never a corpus-wide sort.
    "q106_score_roc" -> ((s, d) => {
      val bk = qualityScores(s, d)
        .select((col("lang") === "en").as("pos"),
          expr("cast(floor(sfp / 2e8) as int)").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(when(col("pos"), 1L).otherwise(0L)).as("pos"))
      val tot = bk.agg(sum(col("n")).as("nt"), sum(col("pos")).as("pt"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket").desc)
      bk.withColumn("tp", sum(col("pos")).over(w))
        .withColumn("pp", sum(col("n")).over(w))
        .join(broadcast(tot), expr("true"))
        .select(col("bucket"), round(col("bucket") * 0.2, 1).as("thr"),
          col("n"), col("pos"), col("tp"), (col("pp") - col("tp")).as("fp"),
          round(col("tp").cast("double") / col("pt"), 6).as("tpr"),
          round((col("pp") - col("tp")).cast("double") / (col("nt") - col("pt")), 6)
            .as("fpr"))
        .orderBy(col("bucket").desc)
    }),

    // GOVERNED Bloom-filter membership audit (the q58/q61/q66 error-
    // contract discipline applied to the set-membership sketch a pipeline
    // uses for "seen this doc before?" at ingest): the filter over the
    // reference half of the corpus (even doc_ids) is a DISTRIBUTED
    // bit-position relation (≤ m rows) — never a driver-side bitset —
    // built with k=5 md5-derived hashes into m = 2^ceil(log2(8·n_ref))
    // bits (≈8 bits/key, derived from corpus size like q39's geometry).
    // Membership-testing the whole corpus is one keyed equi-join of the
    // k·n probe relation against the bit relation. The CONTRACT is the
    // gate: zero false negatives (a Bloom filter's hard guarantee — any
    // FN is an implementation bug) and observed FPR within 3× of the
    // (1-e^(-kn/m))^k theoretical rate, both as verdict columns an exact
    // DuckDB twin recomputes.
    "q109_bloom_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .withColumn("is_ref", col("doc_id") % 2 === 0)
      val p = docs.filter(col("is_ref")).agg(count(lit(1)).as("n_ref"))
        .withColumn("m", expr(
          "shiftleft(cast(1 as bigint), length(bin(8 * n_ref - 1)))"))
      val probes = docs.join(broadcast(p), expr("true"))
        .select(col("doc_id"), col("lang"), col("is_ref"), col("m"),
          explode(expr("sequence(0, 4)")).as("i"))
        .withColumn("pos",
          TextFns.hash32(concat(lit("bloom"), col("i").cast("string"),
            lit("|"), col("doc_id").cast("string"))) % col("m"))
      val bits = probes.filter(col("is_ref")).select(col("pos")).distinct()
        .withColumn("hit", lit(1))
      val mem = probes.join(bits, Seq("pos"), "left")
        .groupBy(col("doc_id"), col("lang"), col("is_ref"))
        .agg((min(coalesce(col("hit"), lit(0))) === 1).as("member"))
      mem.groupBy(col("lang"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref_l"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_test"),
          sum(when(col("is_ref") && !col("member"), 1L).otherwise(0L)).as("n_fn"),
          sum(when(!col("is_ref") && col("member"), 1L).otherwise(0L)).as("n_fp"))
        .join(broadcast(p), expr("true"))
        .withColumn("fpr_obs", round(col("n_fp").cast("double") / col("n_test"), 6))
        .withColumn("fpr_exp", round(
          pow(lit(1.0) - exp(lit(-5.0) * col("n_ref") / col("m")), 5), 6))
        .select(col("lang"), col("n_ref_l"), col("n_test"), col("n_fn"),
          col("n_fp"), col("m"), col("fpr_obs"), col("fpr_exp"),
          (col("n_fn") === 0 && col("fpr_obs") <= lit(3.0) * col("fpr_exp"))
            .as("within_bound"))
        .orderBy(col("lang"))
    }),

    // Dedup-method AGREEMENT audit: the q34 MinHash-Jaccard pair relation
    // and the q102 SimHash-hamming pair relation, full-outer-joined on
    // the pair key — the method-comparison view a pipeline owner reads
    // before trusting either dedup pass (token-set similarity and
    // bit-fingerprint similarity catch overlapping but not identical pair
    // sets). One keyed full-outer join of two already-bounded relations;
    // jacc is NULL on simhash-only pairs and hamming NULL on
    // minhash-only pairs, by construction.
    "q111_dedup_agreement" -> ((s, d) => {
      val mh = confirmedPairs(s, d)
        .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"),
          lit(true).as("in_minhash"))
      val sh = simhashPairs(s, d)
        .select(col("doc_a"), col("doc_b"), col("hamming"),
          lit(true).as("in_simhash"))
      mh.join(sh, Seq("doc_a", "doc_b"), "full_outer")
        .select(col("doc_a"), col("doc_b"),
          coalesce(col("in_minhash"), lit(false)).as("in_minhash"),
          coalesce(col("in_simhash"), lit(false)).as("in_simhash"),
          col("jacc"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // CORPUS-INDUCED stopword list + per-doc density (q31 scores against
    // a FIXED per-language list; real pipelines induce theirs from
    // document frequency). The corpus collapses to the |vocab|-bounded
    // token→df relation (distinct (doc, tok) then one keyed agg); the
    // induced list is a deterministic top-5 by (df DESC, tok ASC) — a
    // TakeOrdered over the compact vocab relation, never a corpus sort —
    // broadcast back against the exploded token relation (keyed join).
    // All-integer until the final density ratio.
    "q114_stopword_induction" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      val dfRel = tok.distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val top = dfRel.orderBy(col("df").desc, col("tok")).limit(5)
        .select(col("tok"), lit(1L).as("is_stop"))
      tok.join(broadcast(top), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          sum(coalesce(col("is_stop"), lit(0L))).as("n_stop"))
        .select(col("doc_id"), col("n_toks"), col("n_stop"),
          round(col("n_stop").cast("double") / col("n_toks"), 6)
            .as("stop_density"))
        .orderBy(col("doc_id"))
    }),

    // Population-stability (PSI) drift audit of the q105 quality score
    // between the even and odd doc_id halves — the "did my scoring model
    // drift between corpus snapshots?" check, run here on a split with a
    // known no-drift expectation. Reuses q106's integer-exact 0.2-wide
    // buckets: the corpus collapses to ~15 bucket rows in ONE keyed agg,
    // the halves' totals are a 1-row scalar aggregate broadcast back
    // (whitelisted NLJ, the q88 shape), and each bucket's PSI term
    // (p−q)·ln(p/q) is NULL-guarded when either half is empty — the
    // degenerate-bucket rule q82 established for MAD = 0.
    "q117_score_psi" -> ((s, d) => {
      val sc = qualityScores(s, d)
        .select(expr("cast(floor(sfp / 2e8) as int)").as("bucket"),
          (col("doc_id") % 2 === 0).as("even"))
      val bk = sc.groupBy(col("bucket"))
        .agg(sum(when(col("even"), 1L).otherwise(0L)).as("n_even"),
          sum(when(!col("even"), 1L).otherwise(0L)).as("n_odd"))
      val tot = bk.agg(sum(col("n_even")).as("t_even"),
        sum(col("n_odd")).as("t_odd"))
      bk.join(broadcast(tot), expr("true"))
        .withColumn("p", col("n_even").cast("double") / col("t_even"))
        .withColumn("q", col("n_odd").cast("double") / col("t_odd"))
        .select(col("bucket"), col("n_even"), col("n_odd"),
          round(col("p"), 6).as("p_even"), round(col("q"), 6).as("p_odd"),
          when(col("n_even") > 0 && col("n_odd") > 0,
            round((col("p") - col("q")) * log(col("p") / col("q")), 6))
            .as("psi_term"))
        .orderBy(col("bucket"))
    }),

    // Document split-continuity detection (truncation/continuation audit:
    // a scrape that cut one page into two docs leaves doc A's tail
    // equal to doc B's head). Each doc contributes ONE 3-token suffix key
    // and ONE 3-token prefix key; continuations are the suffix→prefix
    // keyed equi-join — two rows per doc in, candidate pairs out, never
    // all-pairs. Real-corpus boundary grams are ZIPFIAN (generic phrase
    // endings shared by thousands of docs would make one key's pair
    // output quadratic), so keys hotter than MaxBoundaryFanout on EITHER
    // side are excluded by two vocab-bounded key-count aggs — those keys
    // are boilerplate boundaries, not continuations; the same hot-block
    // principle as q37's MaxBlock. Nothing trips the cap in this corpus
    // (max key fan-out ≪ 1000 at every tier), so the guard is pure
    // plan-shape insurance here.
    "q119_split_continuity" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 6)
      val suf = t.select(col("doc_id").as("doc_a"),
        concat_ws(" ", slice(col("toks"), -3, 3)).as("key"))
      val pre = t.select(col("doc_id").as("doc_b"),
        concat_ws(" ", slice(col("toks"), 1, 3)).as("key"))
      val admitted = suf.groupBy(col("key")).agg(count(lit(1)).as("ns"))
        .join(pre.groupBy(col("key")).agg(count(lit(1)).as("np")), Seq("key"))
        .filter(col("ns") <= MaxBoundaryFanout && col("np") <= MaxBoundaryFanout)
        .select(col("key"))
      suf.join(admitted, Seq("key")).join(pre, Seq("key"))
        .filter(col("doc_a") =!= col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("key").as("boundary_gram"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Per-language QUANTILE normalization of document length (the 4th
    // member of the q77/q78/q82 normalization family — rank-based, so
    // immune to the heavy tails that skew z-scores): deterministic rank
    // by (n_chars, doc_id) inside each language partition, normalized to
    // [0,1] and bucketed to deciles. One lang-partitioned window over
    // the slim (doc_id, lang, n_chars) projection — q68's skew caveat
    // applies; the shard key composes with lang at real-corpus scale.
    // NULL quantile for single-doc languages (the q82 degenerate rule).
    "q120_quantile_normalize" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      val nW = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(nW))
        .withColumn("q", when(col("n_lang") > 1,
          round((col("rn") - 1).cast("double") / (col("n_lang") - 1), 6)))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("rn"),
          col("n_lang"), col("q"),
          when(col("q").isNotNull,
            least(lit(9), floor(col("q") * 10)).cast("int")).as("decile"))
        .orderBy(col("doc_id"))
    }),

    // Token-budget data selection (training-set curation under a token
    // budget): per language, keep the highest-q105-quality docs until
    // 30% of that language's token volume is spent. Exact integer
    // budget (3·Σtoks DIV 10), cumulative token spend via ONE
    // lang-partitioned window ordered by the already-exact (sfp DESC,
    // doc_id) key over the per-doc aggregate — unique ordering, so the
    // default RANGE frame degenerates to ROWS on both engines. Keep
    // verdict all-integer; the only doubles are presentation ratios.
    "q121_token_budget" -> ((s, d) => {
      val sc = qualityScores(s, d)
      val tot = sc.groupBy(col("lang"))
        .agg(sum(col("n_toks")).as("lang_toks"))
        .withColumn("budget", expr("3 * lang_toks DIV 10"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("sfp").desc, col("doc_id"))
      sc.join(tot, Seq("lang"))
        .withColumn("cum_toks", sum(col("n_toks")).over(w))
        .select(col("doc_id"), col("lang"), col("n_toks"), col("cum_toks"),
          col("budget"), (col("cum_toks") <= col("budget")).as("kept"))
        .orderBy(col("doc_id"))
    }),

    // EMPIRICAL LSH S-curve audit (the q58/q61/q66 governed-sketch
    // discipline applied to q34's banding parameters): over a
    // DETERMINISTIC linear pair sample (each doc against its next 10
    // ids — 10n pairs, never all-pairs), measure per-Jaccard-bucket
    // detection rate of the 4×2 banding and report it against the
    // theoretical S-curve 1−(1−s^r)^b. Exact Jaccard rides the sorted
    // shingle tables and the native sorted-merge kernel; detection is a
    // (band, key)-keyed equi-join of the sample against the band
    // relation. The tuning view a pipeline owner reads before trusting
    // the q34/q35 dedup pass at a new similarity threshold.
    "q122_minhash_scurve" -> ((s, d) => {
      val sh = materializedShingles(s, d)
      val shS = sh.select(col("doc_id"), array_sort(col("hs")).as("hs"))
      val pr = sh.select(col("doc_id").as("doc_a"),
          explode(expr("sequence(1, 10)")).as("k"))
        .withColumn("doc_b", col("doc_a") + col("k"))
        .select(col("doc_a"), col("doc_b"))
      val jx = pr
        .join(shS.select(col("doc_id").as("doc_a"), col("hs").as("ha")), Seq("doc_a"))
        .join(shS.select(col("doc_id").as("doc_b"), col("hs").as("hb")), Seq("doc_b"))
        .withColumn("isz", expr("graft_sorted_icount(ha, hb)"))
        .select(col("doc_a"), col("doc_b"),
          (col("isz").cast("double")
            / (size(col("ha")) + size(col("hb")) - col("isz"))).as("jacc"))
      val bd = bands(sh)
      val det = pr
        .join(bd.select(col("doc_id").as("doc_a"), col("b"), col("key")), Seq("doc_a"))
        .join(bd.select(col("doc_id").as("doc_b"), col("b"), col("key")),
          Seq("doc_b", "b", "key"))
        .select(col("doc_a"), col("doc_b")).distinct()
        .withColumn("det", lit(1L))
      jx.join(det, Seq("doc_a", "doc_b"), "left")
        .withColumn("bucket", least(lit(9L), floor(col("jacc") * 10)).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(coalesce(col("det"), lit(0L))).as("n_detected"))
        .withColumn("s_mid", (col("bucket") + lit(0.5)) / 10.0)
        .select(col("bucket"), col("n_pairs"), col("n_detected"),
          round(col("n_detected").cast("double") / col("n_pairs"), 6)
            .as("det_rate"),
          round(col("s_mid"), 2).as("s_mid"),
          round(lit(1.0) - pow(lit(1.0) - pow(col("s_mid"), 2.0), 4.0), 6)
            .as("p_theory"))
        .orderBy(col("bucket"))
    }),

    // Language-ID confusion matrix (the audit view over q32's per-doc
    // heuristic: where does the n-gram classifier disagree with the
    // labeled language, and how often?). The corpus collapses to
    // ≤ |langs|·(|langs|+1) cells in ONE keyed agg; per-label totals
    // ride a window over that bounded aggregate (the sanctioned shape).
    "q123_lang_confusion" -> ((s, d) => {
      val langs = Seq("en", "es", "de", "fr", "zh")
      val base = Tables.documents(s, d)
        .withColumn("toks", TextFns.tokens(col("text")))
      val withHits = langs.foldLeft(base) { (df, l) =>
        df.withColumn(s"h_$l",
          TextFns.stopwordHits(col("toks"), TextFns.stopwords(l)))
      }
      val mx = greatest(langs.map(l => col(s"h_$l")): _*)
      val predicted = langs.reverse.foldLeft(lit("und"): Column) { (acc, l) =>
        when(col(s"h_$l") === mx, lit(l)).otherwise(acc)
      }
      val cells = withHits.select(col("lang"), predicted.as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      cells.withColumn("n_lang", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .select(col("lang"), col("pred_lang"), col("n"), col("n_lang"),
          round(col("n").cast("double") / col("n_lang"), 6).as("frac"),
          (col("lang") === col("pred_lang")).as("agree"))
        .orderBy(col("lang"), col("pred_lang"))
    }),

    // Interpolated Kneser-Ney bigram smoothing (the production LM
    // estimator next to q81's add-one baseline — the standard choice for
    // n-gram data-quality scoring): P_KN(w2|w1) = max(c12−D,0)/c1 +
    // D·N1+(w1,·)/c1 · N1+(·,w2)/|bigram types|, D = 0.75. The corpus
    // collapses to the bigram-TYPE relation in one keyed agg; fan-out
    // (distinct successors) and continuation (distinct predecessors)
    // counts are keyed aggs OVER that bounded relation; the 1-row type
    // total broadcasts (the q88 shape — never a global window). Per-row
    // probability is fixed-pointed (×1e9 int64) so the top-20 selection
    // key is exact on both engines.
    "q124_kneser_ney" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      val bi = t.select(explode(TextFns.wordShingles(col("toks"), 2)).as("gram"))
        .withColumn("w1", split(col("gram"), " ").getItem(0))
        .withColumn("w2", split(col("gram"), " ").getItem(1))
      val c12 = bi.groupBy(col("gram"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      // Continuation/history statistics as w1-/w2-partitioned windows over
      // the bigram-TYPE relation instead of three grouped aggregates
      // joined back: the join shape planned the scan → bigram-explode →
      // c12-aggregate subtree FOUR times (zero runtime exchange reuse, r19
      // plan audit — 8 corpus scans for one query). The windows reuse one
      // c12 build and two exchanges of the |bigram types|-bounded relation;
      // only the 1-row type-count total keeps its own (second) c12 branch,
      // because a global window over the type relation is the exact shape
      // the PlanGuard lint forbids. Corpus scans: 4 → 2.
      // Skew bound (why these windows are exempt from the q137 objection
      // to windows over corpus-hot keys): a w1/w2 partition holds one row
      // per DISTINCT successor/predecessor TYPE, never per occurrence —
      // the worst case is max fan-out of a stopword token, bounded by
      // vocabulary size V, not corpus size; under Zipf the hot partition
      // is O(V·p) for head-word share p, orders below the occurrence
      // counts AQE skew-splitting exists for (and windows can't split).
      val wW1 = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
      val wW2 = org.apache.spark.sql.expressions.Window.partitionBy(col("w2"))
      val tt = c12.agg(count(lit(1)).as("nt"))
      c12
        .withColumn("c1", sum(col("c12")).over(wW1))
        .withColumn("fanout", count(lit(1)).over(wW1))
        .withColumn("cont", count(lit(1)).over(wW2))
        .join(broadcast(tt), expr("true"))
        .withColumn("p_fp", expr(
          "cast(round((greatest(cast(c12 as double) - 0.75, cast(0 as double)) / c1" +
          " + 0.75 * (cast(fanout as double) / c1) * (cast(cont as double) / nt))" +
          " * 1e9) as bigint)"))
        .select(col("gram"), col("c12"), col("c1"), col("fanout"), col("cont"),
          col("p_fp"), round(col("p_fp") / 1e9, 6).as("p_kn"))
        .orderBy(col("p_fp").desc, col("gram")).limit(20)
        .drop("p_fp")
    }),

    // Heaps'-law vocabulary-growth fit per source (the corpus-audit view
    // that says whether a source's vocabulary scales like natural text,
    // V ≈ K·nᵝ): OLS of ln(n_types) on ln(n_toks) over the source's
    // per-doc points. Per-doc logs are fixed-pointed (×1e9 int64) and the
    // OLS moment sums run in EXACT decimal(38,0) integer arithmetic
    // (HUGEINT in the oracle) — order-independent under any partitioning;
    // only the final β/ln K/r² division happens in doubles, over exact
    // inputs. One keyed agg per source, nothing corpus-wide.
    "q125_heaps_fit" -> ((s, d) => {
      val p = Tables.documents(s, d)
        .select(col("source"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("source"),
          size(col("toks")).cast("long").as("n_toks"),
          size(array_distinct(col("toks"))).cast("long").as("n_types"))
        .select(col("source"),
          expr("cast(round(ln(cast(n_toks as double)) * 1e9) as bigint)").as("x"),
          expr("cast(round(ln(cast(n_types as double)) * 1e9) as bigint)").as("y"))
      p.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("cast(x as decimal(18,0)) * cast(y as decimal(18,0))")).as("sxy"),
          sum(expr("cast(x as decimal(18,0)) * cast(x as decimal(18,0))")).as("sxx"),
          sum(expr("cast(y as decimal(18,0)) * cast(y as decimal(18,0))")).as("syy"))
        .withColumn("num", expr(
          "cast(n_docs as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double)"))
        .withColumn("den", expr(
          "cast(n_docs as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double)"))
        .withColumn("deny", expr(
          "cast(n_docs as double) * cast(syy as double) - cast(sy as double) * cast(sy as double)"))
        .select(col("source"), col("n_docs"),
          expr("case when den > 0 then round(num / den, 6) end").as("beta"),
          expr("case when den > 0 then round((cast(sy as double) - num / den" +
            " * cast(sx as double)) / n_docs / 1e9, 6) end").as("ln_k"),
          expr("case when den > 0 and deny > 0" +
            " then round(num * num / (den * deny), 6) end").as("r2"))
        .orderBy(col("source"))
    }),

    // 95% token-coverage vocabulary cutoff per language (the tokenizer-
    // sizing audit: how many frequency-ranked types cover 95% of token
    // volume?). The corpus collapses to the (lang, tok) count relation in
    // one keyed agg; the rank/cumsum window partitions BY LANG over that
    // vocab-bounded aggregate with a unique (c desc, tok) ordering (the
    // q121 exact-frame convention), and the threshold test is exact
    // integer arithmetic (20·cum ≥ 19·total). At real-corpus scale a
    // single language's vocabulary is window-task-sized (~100M types,
    // not corpus-sized); the two-level path (prefix sums over (lang,
    // count-bucket) partials) is the documented next tier, same answer.
    "q126_vocab_coverage" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("c").desc, col("tok"))
      val tot = c.groupBy(col("lang"))
        .agg(sum(col("c")).as("t"), count(lit(1)).as("vocab"))
      c.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("c")).over(w))
        .join(tot, Seq("lang"))
        .filter(col("cum") * 20 >= col("t") * 19)
        .groupBy(col("lang"), col("t"), col("vocab"))
        .agg(min(col("rk")).as("k95"), min_by(col("cum"), col("rk")).as("cum95"))
        .select(col("lang"), col("vocab"), col("t").as("total_toks"), col("k95"),
          round(col("cum95").cast("double") / col("t"), 6).as("cov95"))
        .orderBy(col("lang"))
    }),

    // Dirichlet-smoothed query-likelihood retrieval (the LM-based
    // ranking next to q93's BM25 — the other classic IR scorer):
    // score(d) = Σ_t ln((tf + μ·cf_t/|C|) / (dl + μ)), μ = 100, over the
    // SAME query terms as q93. Every doc is scored (tf = 0 contributes
    // the background probability), so the scored stream is 3·n rows —
    // linear, keyed on doc. Term corpus-frequencies and the 1-row corpus
    // total broadcast. Per-term contributions fixed-pointed (×1e9 int64)
    // before the per-doc sum; the top-10 selection key is the exact
    // integer sum.
    "q127_query_likelihood" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .withColumn("dl", size(col("toks")).cast("long"))
      val u = t.select(col("doc_id"), explode(col("toks")).as("tok"))
        .filter(col("tok").isin(IrTerms: _*))
      val tf = u.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val cf = u.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
      val cTot = t.agg(sum(col("dl")).as("c"))
      t.select(col("doc_id"), col("dl"),
          explode(array(IrTerms.map(lit): _*)).as("tok"))
        .join(broadcast(cf), Seq("tok"))
        .join(tf, Seq("doc_id", "tok"), "left_outer")
        .join(broadcast(cTot), expr("true"))
        .withColumn("contrib_fp", expr(
          "cast(round(ln((coalesce(tf, cast(0 as bigint)) + 100.0 * (cast(cf as double) / c))" +
          " / (cast(dl as double) + 100.0)) * 1e9) as bigint)"))
        .groupBy(col("doc_id"), col("dl"))
        .agg(sum(col("contrib_fp")).as("sfp"))
        .select(col("doc_id"), col("dl"), col("sfp"),
          round(col("sfp") / 1e9, 6).as("score"))
        .orderBy(col("sfp").desc, col("doc_id")).limit(10)
        .drop("sfp")
    }),

    // nDCG@10 of the BM25 ranking (the IR-evaluation audit over q93's
    // scorer): graded relevance = the doc's TOTAL query-term frequency
    // (tf-weighted — distinct-term grades saturate on this corpus and
    // would make every ndcg vacuously 1.0), linear gains, log2
    // discounts. Ranks come from a pair-count against the BROADCAST
    // top-10 itself (both sides ≤ K rows by construction — the
    // sanctioned constant-bounded NLJ), never a global row_number
    // window; cumulative DCG@k is an explode-to-k equi-shuffle over
    // ≤ K·K rows. Per-position gains fixed-pointed (×1e9 int64) so
    // every cumulative sum and the final nDCG ratio are
    // exact-integer-derived on both engines.
    "q128_ndcg" -> ((s, d) => {
      val sc0 = bm25Scored(s, d)
        .select(col("doc_id"), col("tf_total").as("rel"), col("sfp"))
      val gainExpr = "cast(round(cast(rel as double)" +
        " / (ln(cast(rk as double) + 1.0) / ln(2.0)) * 1e9) as bigint)"
      def cumGains(top: DataFrame, better: Column, outCol: String): DataFrame =
        top.join(broadcast(top.select(col("doc_id").as("bid"),
            col("rel").as("bh"), col("sfp").as("bs"))), better)
          .groupBy(col("doc_id"), col("rel")).agg(count(lit(1)).as("rk"))
          .withColumn("gfp", expr(gainExpr))
          .select(explode(expr("sequence(rk, 10)")).as("k"), col("gfp"))
          .groupBy(col("k")).agg(sum(col("gfp")).as(outCol))
      val bm10 = sc0.orderBy(col("sfp").desc, col("doc_id")).limit(10)
      val id10 = sc0.orderBy(col("rel").desc, col("doc_id")).limit(10)
      val dcg = cumGains(bm10,
        col("bs") > col("sfp") ||
          (col("bs") === col("sfp") && col("bid") <= col("doc_id")), "dfp")
      val icg = cumGains(id10,
        col("bh") > col("rel") ||
          (col("bh") === col("rel") && col("bid") <= col("doc_id")), "ifp")
      dcg.join(icg, Seq("k"))
        .select(col("k"), round(col("dfp") / 1e9, 6).as("dcg"),
          round(col("ifp") / 1e9, 6).as("idcg"),
          round(col("dfp").cast("double") / col("ifp"), 6).as("ndcg"))
        .orderBy(col("k"))
    }),

    // Gopher/C4-style quality-rule cascade (the multi-rule boolean filter
    // audit every production corpus ships with): four per-doc rules —
    // word count in [5, 1000], mean word length in [2, 12], >= 1
    // own-language stopword, most-common-token share <= 20% — evaluated
    // in EXACT integer arithmetic (2n <= sum_len, 5·max_rep <= n: no
    // fp ratio ever compared), then ONE keyed agg per language counting
    // per-rule failures and survivors. Per-doc work is a bounded HOF map
    // (doc length <= corpus max); nothing corpus-wide — embarrassingly
    // parallel at any scale.
    "q131_rule_cascade" -> ((s, d) => {
      val langs = Seq("en", "es", "de", "fr", "zh")
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("sum_len",
          expr("cast(aggregate(toks, 0L, (a, x) -> a + length(x)) as bigint)"))
        .withColumn("max_rep", expr(
          "cast(array_max(transform(array_distinct(toks)," +
          " x -> size(filter(toks, y -> y = x)))) as bigint)"))
        .withColumn("stop_hits", coalesce(
          langs.map(l => when(col("lang") === l,
            TextFns.stopwordHits(col("toks"), TextFns.stopwords(l)))): _*))
      val r = t.select(col("lang"),
        (col("n") >= 5 && col("n") <= 1000).as("p_words"),
        (lit(2) * col("n") <= col("sum_len") &&
          col("sum_len") <= lit(12) * col("n")).as("p_avglen"),
        (col("stop_hits") >= 1).as("p_stop"),
        (lit(5) * col("max_rep") <= col("n")).as("p_rep"))
      r.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(!col("p_words"), 1L).otherwise(0L)).as("fail_words"),
          sum(when(!col("p_avglen"), 1L).otherwise(0L)).as("fail_avglen"),
          sum(when(!col("p_stop"), 1L).otherwise(0L)).as("fail_stop"),
          sum(when(!col("p_rep"), 1L).otherwise(0L)).as("fail_rep"),
          sum(when(col("p_words") && col("p_avglen") && col("p_stop") &&
            col("p_rep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("lang"))
    }),

    // Min-k% surprisal membership audit (the memorization probe: a doc
    // whose LOWEST-surprisal token quintile is still cheap under the
    // corpus LM is likely duplicated/templated content — the batch twin
    // of the min-k%-prob membership-inference test): per-gram add-one
    // bigram surprisal (q81's LM — |V| as a 1-row scalar-agg broadcast,
    // never a global window), fixed-pointed ×1e9 BEFORE selection so the
    // per-doc rank order is exact, then a PER-DOC rank window (doc-
    // bounded tasks) selects the lowest k = max(1, n/5) grams. Both
    // means divide exact int sums, so the 6-dp values are bit-identical
    // cross-engine.
    "q132_mink_surprisal" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      val bi = t.select(col("doc_id"),
          posexplode(TextFns.wordShingles(col("toks"), 2)).as(Seq("i", "gram")))
        .withColumn("w1", split(col("gram"), " ").getItem(0))
      // c2t is |bigram types|-bounded (vocabulary², far under corpus size)
      // and feeds THREE consumers (vv, c2's join side, c1) plus the scored
      // branch's c2 join; the r20 executed-plan audit showed the
      // tokenize→explode→aggregate subtree re-planned per consumer (8
      // corpus scans for one query) whenever broadcast reuse didn't fire.
      // One eager localCheckpoint pins the small relation (per-invocation
      // RDD, nothing survives the run — the q189 barrier discipline; see
      // VectorQueries.semDedupVerdict for the executor-memory/lineage
      // tradeoff note).
      val c2t = bi.groupBy(col("gram")).agg(count(lit(1)).as("c2"))
        .withColumn("w2", split(col("gram"), " ").getItem(1))
        .localCheckpoint(true)
      val vv = c2t.agg(countDistinct(col("w2")).as("v"))
      // c1 (first-word occurrence count) as a w1-partitioned WINDOW over
      // the checkpointed type relation instead of a separate grouped
      // aggregate joined back (q124's continuation-count shape — the same
      // Σ c2 per w1 ≡ first-word occurrence identity, same
      // distinct-successor skew bound): the former c1 join added a second
      // gram-side relation and its own broadcast; this rides one pass over
      // c2t and leaves scored with a SINGLE gram join carrying c2, c1 and
      // the broadcast 1-row v together.
      val wW1 = org.apache.spark.sql.expressions.Window
        .partitionBy(split(col("gram"), " ").getItem(0))
      val c2 = c2t.drop("w2")
        .withColumn("c1", sum(col("c2")).over(wW1))
        .join(broadcast(vv), expr("true"))
      val scored = bi.join(c2, Seq("gram"))
        .select(col("doc_id"), col("i"), expr(
          "cast(round(-ln((c2 + 1.0) / (c1 + v)) * 1e9) as bigint)").as("nll_fp"))
      // Rank and per-doc totals from ONE pass over the scored relation:
      // the former `ranked JOIN tot` shape planned the whole scan → bigram
      // → c1/c2-join subtree TWICE (once under the row_number window, once
      // under the per-doc aggregate — zero runtime exchange reuse, r19
      // plan audit), i.e. two full corpus tokenizations feeding a
      // SortMergeJoin. count/sum as unordered window aggregates over the
      // SAME doc_id partitioning ride the row_number window's single
      // exchange; both windows are doc_id-partitioned (never global), so
      // the shape stays 100×-safe.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("nll_fp"), col("i"))
      val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      scored.withColumn("rn", row_number().over(w))
        .withColumn("n_bigrams", count(lit(1)).over(wDoc))
        .withColumn("sum_fp", sum(col("nll_fp")).over(wDoc))
        .withColumn("k", greatest(lit(1L), expr("n_bigrams div 5")))
        .filter(col("rn") <= col("k"))
        .groupBy(col("doc_id"), col("n_bigrams"), col("k"), col("sum_fp"))
        .agg(sum(col("nll_fp")).as("mink_fp"))
        .withColumn("mink_nll", round(col("mink_fp") / col("k") / 1e9, 6))
        .select(col("doc_id"), col("n_bigrams"), col("k"), col("mink_nll"),
          round(col("sum_fp") / col("n_bigrams") / 1e9, 6).as("avg_nll"),
          (col("mink_nll") <= 3.0).as("suspect"))
        .orderBy(col("doc_id"))
    }),

    // Governed count-min sketch (completes the sketch family next to
    // HLL/GK/MG/Bloom): depth 4 × width 1024, row hashes from salted
    // md5 prefixes (the cross-engine hash family). The sketch is built
    // from the EXACT token-count relation by weighted insert — identical
    // to streaming every token, but the build is vocab-bounded, not
    // corpus-bounded. Audit: for the top-50 tokens, est = min over rows
    // of the bucket cell; the gate reports the one-sided error and the
    // ε=2/width Markov bound as exact integers (err·512 <= N).
    "q133_cms_audit" -> ((s, d) => {
      val exact = Tables.documents(s, d)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      val nTot = exact.agg(sum(col("exact")).as("n_total"))
      val tb = exact.select(col("tok"), col("exact"),
        posexplode(array((0 until 4).map(r =>
          TextFns.hash32(concat(lit(s"cms$r|"), col("tok"))) % 1024L): _*))
          .as(Seq("r", "bucket")))
      val sketch = tb.groupBy(col("r"), col("bucket"))
        .agg(sum(col("exact")).as("cell"))
      val est = tb.join(sketch, Seq("r", "bucket"))
        .groupBy(col("tok"), col("exact")).agg(min(col("cell")).as("est"))
      est.orderBy(col("exact").desc, col("tok")).limit(50)
        .join(broadcast(nTot), expr("true"))
        .select(col("tok"), col("exact"), col("est"),
          (col("est") - col("exact")).as("err"),
          ((col("est") - col("exact")) * 512 <= col("n_total")).as("within_bound"),
          col("n_total"))
        .orderBy(col("exact").desc, col("tok"))
    }),

    // Edit-distance similarity join (the fuzzy-join metric the trigram/
    // MinHash family cannot express — true character-level edits):
    // candidates from (lang, source, ⌊len/100⌋) equi-join blocks with the
    // |la−lb| <= 20 length prefilter (led >= |la−lb|, so no candidate is
    // lost WITHIN a block; cross-block misses are the documented blocking
    // recall tradeoff, as q37). The distance itself is Spark's BANDED
    // levenshtein(a, b, 20) — O(len·20) per pair, returns −1 over the
    // cap, so the expensive exact DP never runs on far pairs. At 100 TB
    // the block join is a plain keyed equi-join; oversized blocks are the
    // q37 salting case.
    "q134_editdist_join" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          length(col("text")).cast("long").as("len"))
        .withColumn("blk", expr("len div 100"))
      val a = t.select(col("lang"), col("source"), col("blk"),
        col("doc_id").as("doc_a"), col("text").as("ta"), col("len").as("la"))
      val b = t.select(col("lang"), col("source"), col("blk"),
        col("doc_id").as("doc_b"), col("text").as("tb"), col("len").as("lb"))
      a.join(b, Seq("lang", "source", "blk"))
        .filter(col("doc_a") < col("doc_b") &&
          abs(col("la") - col("lb")) <= 20)
        .withColumn("led", expr("levenshtein(ta, tb, 20)"))
        .filter(col("led") >= 0)
        .select(col("doc_a"), col("doc_b"), col("lang"),
          col("la"), col("lb"), col("led"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Tokenizer fertility audit (the compression-rate view that sizes a
    // tokenizer per language/source: characters per token, subwords per
    // token, tokens per doc): per-doc exact integer counts, ONE keyed
    // agg per (lang, source), ratios divided once from exact sums.
    // Pure map + one shuffle — the cheapest possible corpus statistic.
    "q135_tokenizer_fertility" -> ((s, d) => {
      val f = Tables.documents(s, d)
        .select(col("lang"), col("source"), col("text"),
          TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("lang"), col("source"),
          size(col("toks")).cast("long").as("n_toks"),
          TextFns.subwordCount(col("text")).cast("long").as("n_sub"),
          expr("cast(length(regexp_replace(text, '\\\\s', '')) as bigint)")
            .as("n_chars_ns"))
      f.groupBy(col("lang"), col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("tot_toks"),
          sum(col("n_sub")).as("tot_sub"),
          sum(col("n_chars_ns")).as("tot_chars"))
        .select(col("lang"), col("source"), col("n_docs"), col("tot_toks"),
          round(col("tot_chars") / col("tot_toks"), 6).as("chars_per_tok"),
          round(col("tot_sub") / col("tot_toks"), 6).as("subs_per_tok"),
          round(col("tot_toks") / col("n_docs"), 6).as("toks_per_doc"))
        .orderBy(col("lang"), col("source"))
    }),

    // Dup-graph triangle census + global clustering coefficient (the
    // structural audit over q34's near-dup graph: triangles mean dup
    // CLUSTERS, wedges-without-triangles mean chains — i.e. threshold
    // borderline cases): edges are the confirmed LSH pairs (a < b);
    // triangles by the two-step edge self-join e(a,b)⋈e(b,c)⋈e(a,c) —
    // id-ordered orientation so each triangle counts once (production
    // note: degree-ordered orientation bounds the fan-out on skewed
    // graphs; id order suffices while max degree is dup-cluster-sized).
    // Wedge count Σ deg·(deg−1)/2 in exact ints; all three totals are
    // 1-row scalar aggregates broadcast together.
    "q136_dup_triangles" -> ((s, d) => {
      val e = confirmedPairs(s, d).select(col("doc_a"), col("doc_b"))
      val deg = e.select(col("doc_a").as("v"))
        .union(e.select(col("doc_b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val degAgg = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      val eAgg = e.agg(count(lit(1)).as("n_edges"))
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
        .join(e.as("e3"), col("e1.doc_a") === col("e3.doc_a") &&
          col("e2.doc_b") === col("e3.doc_b"))
        .agg(count(lit(1)).as("n_triangles"))
      degAgg.join(broadcast(eAgg), expr("true"))
        .join(broadcast(tri), expr("true"))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          expr("case when n_wedges > 0" +
            " then round(cast(3 * n_triangles as double) / n_wedges, 6) end")
            .as("global_cc"))
    }),

    // Per-source n-gram diversity (the generation-diversity audit: is a
    // source self-repetitive?): word-3-gram Simpson repeat index
    // Σc(c−1)/(N(N−1)), top-gram share, and type-token ratio. The corpus
    // collapses to the (source, gram) count relation in one keyed agg;
    // everything after runs on that vocab-bounded aggregate. Counts and
    // Σc(c−1) are exact int64 (decimal at the trillion-gram tier — each
    // per-source relation is gram-type-bounded); the three ratios divide
    // the exact sums once in identical double trees.
    "q137_ngram_diversity" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .select(col("source"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("source"), explode(TextFns.wordShingles(col("toks"), 3)).as("gram"))
      val c = g.groupBy(col("source"), col("gram")).agg(count(lit(1)).as("c"))
      c.groupBy(col("source")).agg(
          sum(col("c")).as("n_grams"),
          count(lit(1)).as("n_types"),
          sum(expr("c * (c - 1)")).as("rep_pairs"),
          max(col("c")).as("max_c"))
        .select(col("source"), col("n_grams"), col("n_types"),
          expr("case when n_grams > 1 then round(cast(rep_pairs as double)" +
            " / (cast(n_grams as double) * (cast(n_grams as double) - 1)), 6) end")
            .as("simpson"),
          round(col("max_c").cast("double") / col("n_grams"), 6).as("top_share"),
          round(col("n_types").cast("double") / col("n_grams"), 6).as("ttr"))
        .orderBy(col("source"))
    }),

    // Hill tail-index of the per-source document-length distribution (the
    // heavy-tail audit: α ≈ 1-2 means a Pareto-ish tail whose giant docs
    // dominate token volume — a shard-sizing risk): α = k / Σᵢ₌₁..k
    // ln(xᵢ/x_k) over the k = min(50, n/10) largest lengths. The rank
    // window is source-partitioned (source-bounded tasks) and only the
    // top-k rows survive to the agg; per-row ln is ×1e9 fixed-pointed so
    // the Σ − k·ln(x_k) subtraction is exact integer math, divided once.
    "q138_hill_tail" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("long").as("x"), col("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("x").desc, col("doc_id"))
      val r = t.withColumn("rn", row_number().over(w))
        .withColumn("lfp", expr("cast(round(ln(cast(x as double)) * 1e9) as bigint)"))
      val tot = r.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("k", least(lit(50L), expr("n div 10")))
      val rt = r.join(tot, Seq("source"))
      val xk = rt.filter(col("rn") === col("k"))
        .select(col("source"), col("lfp").as("lk"))
      rt.filter(col("rn") <= col("k"))
        .groupBy(col("source"), col("n"), col("k"))
        .agg(sum(col("lfp")).as("sl"))
        .join(xk, Seq("source"))
        .select(col("source"), col("n"), col("k"),
          expr("case when k >= 5 and sl - k * lk > 0" +
            " then round(cast(k as double) * 1e9 / (sl - k * lk), 6) end")
            .as("alpha"))
        .orderBy(col("source"))
    }),

    // Budgeted-vocabulary OOV projection (the tokenizer-generalization
    // audit: build a top-20-per-language vocabulary on the EVEN-id half,
    // measure out-of-vocabulary token mass on the ODD half): train-half
    // counts in one keyed agg, vocab by a lang-partitioned rank window
    // over that vocab-bounded aggregate (q126's exact frame), OOV via a
    // left-anti join of eval-half token types against the vocab — all
    // exact integers until the single final rate division.
    "q139_oov_projection" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
      val trainC = t.filter(col("doc_id") % 2 === 0)
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("c").desc, col("tok"))
      val vocab = trainC.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20).select(col("lang"), col("tok"))
      val evalC = t.filter(col("doc_id") % 2 === 1)
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      val oov = evalC.join(vocab, Seq("lang", "tok"), "left_anti")
        .groupBy(col("lang"))
        .agg(sum(col("c")).as("oov_tokens"), count(lit(1)).as("oov_types"))
      evalC.groupBy(col("lang"))
        .agg(sum(col("c")).as("eval_tokens"), count(lit(1)).as("eval_types"))
        .join(oov, Seq("lang"), "left_outer")
        .select(col("lang"), col("eval_tokens"), col("eval_types"),
          coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
          coalesce(col("oov_types"), lit(0L)).as("oov_types"))
        .withColumn("oov_rate",
          round(col("oov_tokens") / col("eval_tokens"), 6))
        .orderBy(col("lang"))
    }),

    // Sorted-neighborhood near-dup pass (the third classic dedup family
    // next to LSH (q34) and blocked all-pairs (q37) — the cheap first
    // sweep production pipelines run BEFORE banding): within each
    // (lang, ⌊n_chars/100⌋) block, docs are rank-ordered by (n_chars,
    // doc_id) and each doc is compared only with its 3 successors —
    // O(3n) candidate pairs total, confirmed by exact trigram Jaccard
    // from the SAME materialized packed-trigram table as q37 (one build
    // per corpus). The rank window partitions by (lang, block) — block-
    // bounded tasks, never a per-language or global sort; the successor
    // match is a plain (lang, lb, rank) equi-join. Cross-block pairs are
    // the documented recall tradeoff, exactly q37's.
    "q142_sorted_neighborhood" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val t = trigramDocs(s, d).join(base, Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("lb")).orderBy(col("n_chars"), col("doc_id"))
      // gr sorted once per doc BEFORE the successor join (the
      // blockedJaccardPairs convention): graft_sorted_icount is a sorted
      // merge, and the pack expression emits first-occurrence order.
      val r = t.withColumn("rn", row_number().over(w))
        .withColumn("gr", array_sort(col("gr")))
      val a = r.select(col("lang"), col("lb"), col("rn"),
        col("doc_id").as("ida"), col("gr").as("ga"), col("ng").as("na"))
      val b = r.select(col("lang"), col("lb"), col("rn").as("rnb"),
        col("doc_id").as("idb"), col("gr").as("gb"), col("ng").as("nb"))
      a.withColumn("rnb", explode(array(col("rn") + 1, col("rn") + 2, col("rn") + 3)))
        .join(b, Seq("lang", "lb", "rnb"))
        .withColumn("isz", expr("graft_sorted_icount(ga, gb)"))
        .withColumn("jacc",
          col("isz").cast("double") / (col("na") + col("nb") - col("isz")))
        .filter(col("jacc") >= 0.5)
        .select(least(col("ida"), col("idb")).as("doc_a"),
          greatest(col("ida"), col("idb")).as("doc_b"),
          round(col("jacc"), 6).as("jacc"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Per-doc duplicated-8-gram fraction (the document-level substring-
    // dedup diagnostic: what share of a doc's distinct 8-grams occur in
    // ANY other doc? — symmetric, unlike q84's order-dependent novelty,
    // and per-doc, unlike q71's cross-doc span blocks): distinct 8-grams
    // per doc, gram document-frequency by one keyed agg over the gram-
    // type-bounded relation, per-doc share by a second keyed agg. A doc
    // counts as sharing a gram when df >= 2 — its own occurrence plus at
    // least one other doc.
    // The gram relation is HASHED (graft_shingle_hash32: fused window +
    // string dedup + md5-prefix hash, one native pass) so the df shuffle
    // moves 8-byte ints, not ~40-char strings — the q34 width discipline;
    // the oracle applies the identical md5 arithmetic, so any collision
    // is mirrored exactly.
    "q144_gram_dup_fraction" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
      val g = t.select(col("doc_id"),
        explode(TextFns.shingleHash32(col("toks"), 8)).as("gram"))
      val df = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      g.join(df, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_grams"), col("n_dup"),
          round(col("n_dup") / col("n_grams"), 6).as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    // Dup-cluster size distribution (the power-law check on q59's
    // connected components — a heavy-tailed cluster histogram means a
    // template/mirror problem, not scattered dup pairs): component sizes
    // from the SAME pointer-jumping operator as q59, histogrammed by one
    // keyed agg over the |components|-bounded relation.
    "q145_cluster_sizes" -> ((s, d) => {
      val pairs = confirmedPairs(s, d).select(col("doc_a"), col("doc_b"))
      graft.operators.ConnectedComponents(pairs, "doc_a", "doc_b")
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"))
        .groupBy(col("n_members").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .withColumn("docs_covered", col("cluster_size") * col("n_clusters"))
        .orderBy(col("cluster_size"))
    }),

    // Boilerplate origin attribution (q144's companion: WHICH 8-grams
    // are the shared boilerplate, how widespread, and where did each
    // first appear?): top-10 grams by document frequency with the
    // earliest carrier as origin — TakeOrdered over the gram-type-
    // bounded df aggregate (the q114 induced-stopword shape), corpus
    // size as a 1-row broadcast for the share.
    "q146_boilerplate_origin" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
      val g = t.select(col("doc_id"),
        explode(TextFns.shingleHash32(col("toks"), 8)).as("h"))
      val df = g.groupBy(col("h"))
        .agg(count(lit(1)).as("df"), min(col("doc_id")).as("origin_doc"))
      val tot = t.agg(count(lit(1)).as("n_docs"))
      df.filter(col("df") >= 2)
        .orderBy(col("df").desc, col("h")).limit(10)
        .join(broadcast(tot), expr("true"))
        .select(col("h").as("gram_h"), col("df"), col("origin_doc"),
          round(col("df") / col("n_docs"), 6).as("doc_share"), col("n_docs"))
        .orderBy(col("df").desc, col("gram_h"))
    }),

    // Quality-score length-bias audit (the curation-fairness check: does
    // the quality filter systematically prefer long documents?): q105's
    // fixed-point score aggregated by per-lang token-count decile
    // (q120's exact rank-quantile frame). Mean score and keep rate per
    // (lang, decile) from exact integer sums — a biased filter shows a
    // monotone mean-score ramp across deciles.
    "q148_score_length_bias" -> ((s, d) => {
      val sc = qualityScores(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_toks"), col("doc_id"))
      val nl = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      sc.withColumn("rn", row_number().over(w))
        .withColumn("n_lang", count(lit(1)).over(nl))
        .filter(col("n_lang") > 1)
        .withColumn("q", round(expr("cast(rn - 1 as double) / (n_lang - 1)"), 6))
        .withColumn("decile", expr("cast(least(9, floor(q * 10)) as int)"))
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("sfp")).as("ssum"),
          sum(when(col("sfp") > 0, 1L).otherwise(0L)).as("n_keep"))
        .select(col("lang"), col("decile"), col("n_docs"),
          round(expr("cast(ssum as double) / n_docs / 1e9"), 6).as("mean_score"),
          round(col("n_keep") / col("n_docs"), 6).as("keep_rate"))
        .orderBy(col("lang"), col("decile"))
    }),

    // Sparse tf-idf document cosine pairs (the lexical companion to the
    // dense-embedding near-dup family: pairwise doc similarity via a
    // posting-list equi-join on shared terms — never all-pairs). Each doc
    // keeps its top-8 tf-idf terms (exact int64 fixed-point weights, tf
    // saturated at 1000 so wfp² sums stay inside int64); terms with
    // df > 1000 are stopword-pruned BEFORE pairing — the hot-key fanout
    // guard (q119's MaxBoundaryFanout discipline), which is also the
    // right IR semantics (a corpus-wide term carries no signal). The
    // pair relation is bounded by Σ_term df(term)² over the pruned,
    // top-8-sparsified postings — df-capped, so no term key ever goes
    // quadratic in the corpus. Cosine is one double division over exact
    // integer dot/norms, rounded before the threshold compare so the
    // gate can never flip on a last-ulp difference.
    "q149_sparse_cosine" -> ((s, d) => {
      val m = 8; val dfCap = 1000L; val tfCap = 1000L
      val n = graft.operators.CorpusStats.count(s, d, "documents", "doc_id")
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = tf.join(dfreq, Seq("term"))
        .filter(col("df") <= dfCap && col("df") < n)
        .withColumn("wfp", expr(
          s"cast(round(least(cnt, $tfCap) * ln(cast($n as double) / df) * 10000) as bigint)"))
        .filter(col("wfp") > 0)
      val top = graft.operators.TopK.perKey(w, Seq("doc_id"),
          Seq(col("wfp").desc, col("term").asc), m, saltExpr = hash(col("term")))
        .select(col("doc_id"), col("term"), col("wfp"))
      val norms = top.groupBy(col("doc_id")).agg(sum(col("wfp") * col("wfp")).as("nrm"))
      val a = top.select(col("term"), col("doc_id").as("doc_a"), col("wfp").as("wa"))
      val b = top.select(col("term"), col("doc_id").as("doc_b"), col("wfp").as("wb"))
      a.join(b, Seq("term")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared"), sum(col("wa") * col("wb")).as("dot"))
        .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")), Seq("doc_a"))
        .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")), Seq("doc_b"))
        .withColumn("cosine", round(col("dot").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")), 6))
        .filter(col("cosine") >= 0.6)
        .select(col("doc_a"), col("doc_b"), col("n_shared"), col("cosine"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Per-term burstiness (Fano factor of per-doc counts over ALL docs,
    // zeros included — the corpus-linguistics contagion diagnostic:
    // ~1 means Poisson scatter, ≫1 means the term clumps into few docs,
    // the signature of templates and topic spam). The corpus collapses
    // to the (term, doc) count relation in one keyed agg; Fano
    // (N·Σc² − tot²)/(N·tot) is computed in EXACT int64 on the term-
    // bounded aggregate and divided into a double exactly once. Top-20
    // by rounded Fano with the term as tie-break — deterministic on
    // both engines.
    "q151_term_burstiness" -> ((s, d) => {
      val minDf = 20L
      val n = graft.operators.CorpusStats.count(s, d, "documents", "doc_id")
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
      tc.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("c")).as("tot"),
          sum(col("c") * col("c")).as("s2"))
        .filter(col("df") >= minDf)
        .withColumn("fano", round(expr(
          s"cast($n * s2 - tot * tot as double) / (cast($n as bigint) * tot)"), 6))
        .orderBy(col("fano").desc, col("term")).limit(20)
        .select(col("term"), col("df"), col("tot"), col("fano"))
        .orderBy(col("fano").desc, col("term"))
    }),

    // Per-node local clustering coefficient on the confirmed near-dup
    // graph (q136's global census, localized: WHICH docs sit inside
    // densely-wired dup cliques — template hubs — vs. chains of
    // accidental pairs?). Triangles from the same edge-keyed two-hop
    // join as q136, attributed to all three corners by one explode +
    // keyed agg; cc = 2T/(d(d−1)) on the |V|-bounded aggregate. Every
    // join is keyed on doc ids; per-key fanout is degree-bounded.
    "q152_clustering_coeff" -> ((s, d) => {
      val e = confirmedPairs(s, d).select(col("doc_a"), col("doc_b"))
      val deg = e.select(col("doc_a").as("v"))
        .union(e.select(col("doc_b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
        .join(e.as("e3"), col("e1.doc_a") === col("e3.doc_a") &&
          col("e2.doc_b") === col("e3.doc_b"))
        .select(explode(array(col("e1.doc_a"), col("e1.doc_b"), col("e2.doc_b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
      deg.filter(col("deg") >= 2)
        .join(tri, Seq("v"), "left")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .select(col("v").as("doc_id"), col("deg"), col("n_tri"),
          round(expr("cast(2 * n_tri as double) / (deg * (deg - 1))"), 6).as("local_cc"))
        .orderBy(col("doc_id"))
    }),

    // Per-source sentence-level boilerplate share (the C4/CCNet line-
    // dedup diagnostic at sentence granularity — q144's 8-gram fraction
    // catches sub-sentence overlap; THIS catches whole repeated
    // sentences, the unit real boilerplate strippers remove): sentences
    // by [.!?]+ segmentation, ≥ 20 chars after trim, hashed to 32-bit
    // ints (md5-prefix — the q34 width discipline: the df shuffle moves
    // 8-byte ints, not sentence strings; the oracle mirrors the md5
    // arithmetic so any collision is shared). A sentence is boilerplate
    // when it appears in ≥ 2 DISTINCT docs; each source reports the
    // share of its sentence instances that are corpus-wide boilerplate.
    "q153_sentence_dup_share" -> ((s, d) => {
      val sents = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), "[.!?]+")).as("raw"))
        .select(col("doc_id"), col("source"), trim(col("raw")).as("sent"))
        .filter(length(col("sent")) >= 20)
        .select(col("doc_id"), col("source"), TextFns.hash32(col("sent")).as("h"))
      val sdf = sents.select(col("h"), col("doc_id")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("sdf"))
      sents.join(sdf, Seq("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sents"),
          sum(when(col("sdf") >= 2, 1L).otherwise(0L)).as("n_dup"))
        .select(col("source"), col("n_sents"), col("n_dup"),
          round(col("n_dup") / col("n_sents"), 6).as("dup_share"))
        .orderBy(col("source"))
    }),

    // Quality-score calibration audit (q106's ROC tells you the score
    // RANKS the positive class; THIS tells you whether its normalized
    // magnitude can be read as a probability — the check before using
    // the score as a sampling weight): p̂ = min-max-normalized score in
    // 1e-6 fixed-point (min/max are a 1-row aggregate broadcast — exact
    // integer arithmetic, no transcendentals), binned into 10 value
    // deciles; each bin reports mean p̂ (exact int sums), the observed
    // en-rate, and the calibration gap. Per-row map + one keyed agg over
    // ≤ 10 bins — embarrassingly parallel at any corpus size.
    "q154_score_calibration" -> ((s, d) => {
      val sc = qualityScores(s, d)
      val mm = sc.agg(min(col("sfp")).as("lo"), max(col("sfp")).as("hi"))
      sc.join(broadcast(mm), expr("true"))
        .filter(col("hi") > col("lo"))
        .withColumn("p_fp", expr(
          "cast(round(cast(sfp - lo as double) / (hi - lo) * 1000000) as bigint)"))
        .withColumn("bin", expr("cast(least(9, p_fp div 100000) as int)"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_fp")).as("psum"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"))
        .select(col("bin"), col("n"), col("pos"),
          round(expr("cast(psum as double) / n / 1e6"), 6).as("mean_p"),
          round(col("pos").cast("double") / col("n"), 6).as("obs_rate"),
          round(expr("cast(psum as double) / n / 1e6 - cast(pos as double) / n"), 6)
            .as("gap"))
        .orderBy(col("bin"))
    }),

    // Term-level IDF drift between corpus halves (the vocabulary-shift
    // companion to q117's score-level PSI: WHICH terms changed weight
    // between two snapshots — doc_id parity stands in for snapshot A/B):
    // per-half document frequencies from one keyed agg over the distinct
    // (term, doc) presence relation, half sizes as a 1-row aggregate
    // broadcast, drift = idf_A − idf_B = ln(n_A/df_A) − ln(n_B/df_B)
    // rounded before the top-15 |drift| rank. The term relation is
    // vocab-bounded; nothing touches raw docs after the first agg.
    "q155_idf_drift" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .select(col("doc_id"), pmod(col("doc_id"), lit(2)).as("h"),
          explode(array_distinct(TextFns.tokens(col("text")))).as("term"))
      val df = g.groupBy(col("term")).agg(
        sum(when(col("h") === 0, 1L).otherwise(0L)).as("df_a"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("df_b"))
      val nn = Tables.documents(s, d).agg(
        sum(when(pmod(col("doc_id"), lit(2)) === 0, 1L).otherwise(0L)).as("na"),
        sum(when(pmod(col("doc_id"), lit(2)) === 1, 1L).otherwise(0L)).as("nb"))
      df.filter(col("df_a") >= 5 && col("df_b") >= 5)
        .join(broadcast(nn), expr("true"))
        .withColumn("drift", round(
          log(col("na").cast("double") / col("df_a"))
            - log(col("nb").cast("double") / col("df_b")), 6))
        .orderBy(abs(col("drift")).desc, col("term")).limit(15)
        .select(col("term"), col("df_a"), col("df_b"), col("drift"))
        .orderBy(abs(col("drift")).desc, col("term"))
    }),

    // Train/val/test split-leakage CENSUS (q103 emits the pair-level
    // leak evidence an auditor drills into; THIS is the dashboard number
    // — the |splits|²-bounded matrix of near-dup pairs per split-pair
    // cell, under a denser 8/1/1 hash split where leakage is the common
    // case rather than q103's 90/5/5 tail): docs are assigned splits by
    // the content-independent q49 hash gate (md5(doc_id) mod 10 →
    // 8/1/1), each q34-confirmed near-dup pair is labeled with its
    // canonical (lexicographic) split pair, and the census reports pair
    // counts + the share of all near-dup pairs per cell, cross-split
    // cells flagged is_leak. Pairs come from the SAME materialized
    // shingle/LSH path as q34 (bucket equi-join, never all-pairs); the
    // split label join is two keyed equi-joins; the pair total is a
    // 1-row scalar aggregate broadcast (the q88 shape).
    "q157_split_leakage" -> ((s, d) => {
      val sp = Tables.documents(s, d).select(col("doc_id"),
          pmod(TextFns.hash32(concat(lit("split|"),
            col("doc_id").cast("string"))), lit(10)).as("g"))
        .withColumn("split", when(col("g") < 8, lit("train"))
          .when(col("g") === 8, lit("val")).otherwise(lit("test")))
      val lab = confirmedPairs(s, d)
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
        .select(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
      val tot = lab.agg(count(lit(1)).as("n_total"))
      lab.groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .join(broadcast(tot), expr("true"))
        .select(col("split_a"), col("split_b"), col("n_pairs"),
          (col("split_a") =!= col("split_b")).as("is_leak"),
          round(col("n_pairs").cast("double") / col("n_total"), 6).as("share"))
        .orderBy(col("split_a"), col("split_b"))
    }),

    // Zipf rank-frequency fit per language (q125's Heaps fit is vocabulary
    // GROWTH; this is the frequency-DECAY law — slope ≈ −1 for natural
    // text, flatter for templated/synthetic corpora): top-100 terms per
    // lang by the unique (count DESC, term) rank window over the vocab-
    // bounded count aggregate (never a corpus sort), then the q125 OLS of
    // ln(count) on ln(rank) — per-point logs ×1e9 int64, moment sums in
    // exact decimal(18,0)² products, slope/intercept/r² from identical
    // final double trees, degenerate fits NULL-guarded.
    "q158_zipf_slope" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("c").desc, col("tok"))
      val p = c.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 100)
        .select(col("lang"),
          expr("cast(round(ln(cast(rnk as double)) * 1e9) as bigint)").as("x"),
          expr("cast(round(ln(cast(c as double)) * 1e9) as bigint)").as("y"))
      p.groupBy(col("lang")).agg(
          count(lit(1)).as("n_top"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("cast(x as decimal(18,0)) * cast(y as decimal(18,0))")).as("sxy"),
          sum(expr("cast(x as decimal(18,0)) * cast(x as decimal(18,0))")).as("sxx"),
          sum(expr("cast(y as decimal(18,0)) * cast(y as decimal(18,0))")).as("syy"))
        .withColumn("num", expr(
          "cast(n_top as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double)"))
        .withColumn("den", expr(
          "cast(n_top as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double)"))
        .withColumn("deny", expr(
          "cast(n_top as double) * cast(syy as double) - cast(sy as double) * cast(sy as double)"))
        .select(col("lang"), col("n_top"),
          expr("case when den > 0 then round(num / den, 6) end").as("slope"),
          expr("case when den > 0 then round((cast(sy as double) - num / den" +
            " * cast(sx as double)) / n_top / 1e9, 6) end").as("ln_c1"),
          expr("case when den > 0 and deny > 0" +
            " then round(num * num / (den * deny), 6) end").as("r2"))
        .orderBy(col("lang"))
    }),

    // Good-Turing unseen-mass estimate per language (the open-vocabulary
    // audit an LM pipeline runs before trusting per-token metrics: how
    // much probability mass belongs to types never seen in this corpus?):
    // p₀ = N₁/N from the count-of-counts of the vocab-bounded term
    // aggregate, plus the Turing singleton discount r₁* = 2·N₂/N₁.
    // Two keyed aggs, all counts exact int64, divisions happen once.
    "q159_good_turing" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("lang"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      c.groupBy(col("lang")).agg(
          count(lit(1)).as("n_types"),
          sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
        .select(col("lang"), col("n_types"), col("n_tokens"), col("n1"), col("n2"),
          round(col("n1").cast("double") / col("n_tokens"), 6).as("p_unseen"),
          when(col("n1") > 0,
            round(lit(2.0) * col("n2") / col("n1"), 6)).as("r1_star"))
        .orderBy(col("lang"))
    }),

    // Pairwise Jensen-Shannon divergence between source unigram
    // distributions (the mixture-design distance matrix beside q89's
    // overlap counts and q94's asymmetric KL): JSD needs the union of the
    // two vocabularies, but the union decomposes — terms present in only
    // one source contribute exactly ½·p·ln2, so JSD = Σ_shared ½[p·ln(2p/
    // (p+q)) + q·ln(2q/(p+q)) − (p+q)·ln2] + ln2, and ONLY the shared-term
    // relation is ever joined: one term-keyed equi-self-join over the
    // vocab-bounded (source, term, count) aggregate, source totals a
    // |sources|-row broadcast. Per-term contributions are ×1e9 fixed-point
    // int64 (computed from exact integer counts through one identical
    // double tree per engine) so the per-pair sum is order-independent;
    // output is the |sources|²-bounded matrix normalized to [0,1] by ln2.
    "q160_source_jsd" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      val tot = c.groupBy(col("source")).agg(sum(col("c")).as("tot"))
      val p = c.join(broadcast(tot), Seq("source"))
      val shared = p.as("a").join(p.as("b"),
          col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.c").as("ca"), col("a.tot").as("ta"),
          col("b.c").as("cb"), col("b.tot").as("tb"))
        .withColumn("fp", expr(
          "cast(round((cast(ca as double) / ta * ln(2 * (cast(ca as double) / ta)" +
            " / (cast(ca as double) / ta + cast(cb as double) / tb))" +
            " + cast(cb as double) / tb * ln(2 * (cast(cb as double) / tb)" +
            " / (cast(ca as double) / ta + cast(cb as double) / tb))" +
            " - (cast(ca as double) / ta + cast(cb as double) / tb) * ln(2))" +
            " * 0.5 * 1e9) as bigint)"))
      shared.groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"), sum(col("fp")).as("sfp"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          round((col("sfp").cast("double") / 1e9 + log(lit(2.0)))
            / log(lit(2.0)), 6).as("jsd_norm"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Document-length Gini per language (the inequality view beside
    // q138's Hill tail index and q97's bucket histogram: a high Gini
    // says token budget is concentrated in few giant docs — shard
    // packing and per-doc quality weights behave differently than the
    // mean suggests): the rank formulation G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n
    // over the ASCENDING (n_chars, doc_id) rank window per lang — tie
    // order cannot change the sum since tied docs swap equal products.
    // Σi·xᵢ in exact decimal(18,0)² products (HUGEINT twin) so the
    // moment survives any corpus size; one window + one keyed agg.
    "q164_length_gini" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"), col("doc_id"))
        .withColumn("i", row_number().over(w))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"),
          sum(expr("cast(i as decimal(18,0)) * cast(n_chars as decimal(18,0))"))
            .as("swx"))
        .select(col("lang"), col("n_docs"), col("total_chars"),
          expr("case when n_docs > 1 and total_chars > 0 then round(" +
            "2.0 * cast(swx as double)" +
            " / (cast(n_docs as double) * cast(total_chars as double))" +
            " - (cast(n_docs as double) + 1) / n_docs, 6) end").as("gini"))
        .orderBy(col("lang"))
    }),

    // One-way ANOVA of the quality score by source (the variance-
    // decomposition audit beside q148's bias table: how much of score
    // variance does the source column EXPLAIN — η² near 1 means the
    // filter is really a source filter, F says whether that's noise):
    // scores re-fixed-pointed to 1e-6 units, per-source moments (n, Σs,
    // Σs²) in exact int64/decimal sums, the between-group moment
    // Σ_g (Σs)²/n_g integer-rounded PER GROUP so the |sources|-row final
    // sum is order-independent; η² and F divide exact integers once in
    // one identical double tree. Two keyed aggs, nothing corpus-wide
    // but the score scan.
    "q166_score_anova" -> ((s, d) => {
      val sc = qualityScores(s, d).select(col("doc_id"), col("sfp"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .withColumn("s6", expr("cast(round(cast(sfp as double) / 1e3) as bigint)"))
      val g = sc.groupBy(col("source")).agg(
        count(lit(1)).as("n_g"),
        sum(col("s6")).as("sum_g"),
        sum(expr("cast(s6 as decimal(18,0)) * cast(s6 as decimal(18,0))")).as("ss_g"))
      g.agg(
          sum(col("n_g")).as("nn"), count(lit(1)).as("k"),
          sum(col("sum_g")).as("ss"), sum(col("ss_g")).as("qq"),
          sum(expr("cast(round(cast(cast(sum_g as decimal(18,0))" +
            " * cast(sum_g as decimal(18,0)) as double) / n_g) as decimal(38,0))"))
            .as("ssb_raw"))
        .select(col("nn").as("n_docs"), col("k").as("n_groups"),
          expr("case when cast(qq as double)" +
            " - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "   as double) / nn > 0" +
            " then round((cast(ssb_raw as double)" +
            "   - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "     as double) / nn)" +
            " / (cast(qq as double)" +
            "   - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "     as double) / nn), 6) end").as("eta2"),
          expr("case when k > 1 and nn > k and cast(qq as double)" +
            " - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "   as double) / nn" +
            " - (cast(ssb_raw as double)" +
            "   - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "     as double) / nn) > 0" +
            " then round(((cast(ssb_raw as double)" +
            "   - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "     as double) / nn) / (k - 1))" +
            " / ((cast(qq as double)" +
            "   - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "     as double) / nn" +
            "   - (cast(ssb_raw as double)" +
            "     - cast(cast(ss as decimal(18,0)) * cast(ss as decimal(18,0))" +
            "       as double) / nn)) / (nn - k)), 6) end").as("f_stat"))
    }),

    // Mixed-language document detection (the curation gate q32's doc-
    // level ID cannot express: a doc that is half English half German
    // gets ONE q32 label but should be flagged or segment-split before
    // training): sentences via q153's segmentation, each classified by
    // the q32 stopword-hit argmax, per-doc sentence-language entropy
    // H = ln(n) − Σc·ln(c)/n from exact integer counts (the Σc·ln(c)
    // moment is ×1e9 fixed-pointed per (doc, lang) term so every sum
    // is order-independent), rolled up to a per-metadata-lang census
    // of mixed docs. Everything is keyed aggs over per-doc-bounded
    // relations; no windows, no corpus sort.
    "q167_mixed_lang" -> ((s, d) => {
      val langs = Seq("en", "es", "de", "fr", "zh")
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), "[.!?]+")).as("raw"))
        .select(col("doc_id"), col("lang"), trim(col("raw")).as("sent"))
        .filter(length(col("sent")) >= 20)
        .withColumn("toks", TextFns.tokens(col("sent")))
      val withHits = langs.foldLeft(base) { (df, l) =>
        df.withColumn(s"h_$l", TextFns.stopwordHits(col("toks"), TextFns.stopwords(l)))
      }
      val mx = greatest(langs.map(l => col(s"h_$l")): _*)
      val predicted = langs.reverse.foldLeft(lit("und"): Column) { (acc, l) =>
        when(col(s"h_$l") === mx, lit(l)).otherwise(acc)
      }
      val pc = withHits.select(col("doc_id"), col("lang"), predicted.as("pred"))
        .groupBy(col("doc_id"), col("lang"), col("pred"))
        .agg(count(lit(1)).as("c"))
      val pd = pc.groupBy(col("doc_id"), col("lang")).agg(
          sum(col("c")).as("n"), count(lit(1)).as("n_langs"),
          sum(expr("cast(round(c * ln(cast(c as double)) * 1e9) as bigint)"))
            .as("scl"))
        .withColumn("h_fp", expr(
          "cast(round((ln(cast(n as double)) - cast(scl as double) / 1e9 / n) * 1e9) as bigint)"))
      pd.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_langs") >= 2, 1L).otherwise(0L)).as("n_mixed"),
          sum(col("h_fp")).as("sh"))
        .select(col("lang"), col("n_docs"), col("n_mixed"),
          round(col("n_mixed").cast("double") / col("n_docs"), 6).as("mixed_share"),
          round(col("sh").cast("double") / col("n_docs") / 1e9, 6).as("mean_entropy"))
        .orderBy(col("lang"))
    }),

    // Two-sample Kolmogorov-Smirnov drift test on the doc-length
    // distribution between doc_id-parity halves (the NONPARAMETRIC member
    // of the drift family — q117's PSI needs bucket choices, KS does not):
    // the corpus collapses to per-distinct-length counts for each half
    // (one keyed agg over a VALUE-DOMAIN-bounded relation — doc lengths,
    // not docs), the two ECDFs are one cumulative window over that
    // aggregate (the exchange child is the aggregate — the sanctioned
    // global-window shape; the length domain stays bounded at any corpus
    // size), and D maximizes the EXACT INTEGER |cumA·nB − cumB·nA| so no
    // float enters the supremum; the final D and the scaled statistic
    // divide once.
    "q171_ks_drift" -> ((s, d) => {
      val v = Tables.documents(s, d)
        .select(pmod(col("doc_id"), lit(2)).as("h"), col("n_chars").as("x"))
      val c = v.groupBy(col("x")).agg(
        sum(when(col("h") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("cb"))
      val tot = c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("x"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      c.withColumn("cuma", sum(col("ca")).over(w))
        .withColumn("cumb", sum(col("cb")).over(w))
        .join(broadcast(tot), expr("true"))
        .withColumn("dn", abs(expr(
          "cast(cuma as decimal(18,0)) * nb - cast(cumb as decimal(18,0)) * na")))
        .groupBy(col("na"), col("nb"))
        .agg(max(col("dn")).as("d_num"))
        .select(col("na"), col("nb"),
          expr("case when na > 0 and nb > 0 then round(" +
            "cast(d_num as double) / (cast(na as double) * nb), 6) end").as("ks_d"),
          expr("case when na > 0 and nb > 0 then round(" +
            "sqrt(cast(na as double) * nb / (cast(na as double) + nb))" +
            " * (cast(d_num as double) / (cast(na as double) * nb)), 6) end")
            .as("ks_scaled"))
    }),

    // Split-balance audit (q157's companion: leakage asks whether near-
    // dups straddle the split, THIS asks whether each split is
    // REPRESENTATIVE — a test set with a skewed language mix measures
    // the wrong population): the split × lang contingency table with
    // observed/corpus shares and the per-cell χ² contribution ×1e6
    // fixed-pointed (expected = split_total·lang_total/N in one double
    // tree from exact ints). Margins are |splits|- and |langs|-row
    // broadcasts over the 15-cell aggregate; the full χ² is the exact
    // integer sum of the published terms.
    "q172_split_balance" -> ((s, d) => {
      val sp = Tables.documents(s, d).select(col("lang"),
          pmod(TextFns.hash32(concat(lit("split|"),
            col("doc_id").cast("string"))), lit(10)).as("g"))
        .withColumn("split", when(col("g") < 8, lit("train"))
          .when(col("g") === 8, lit("val")).otherwise(lit("test")))
      val cells = sp.groupBy(col("split"), col("lang")).agg(count(lit(1)).as("o"))
      val sm = cells.groupBy(col("split")).agg(sum(col("o")).as("st"))
      val lm = cells.groupBy(col("lang")).agg(sum(col("o")).as("lt"))
      val nt = cells.agg(sum(col("o")).as("nn"))
      cells
        .join(broadcast(sm), Seq("split"))
        .join(broadcast(lm), Seq("lang"))
        .join(broadcast(nt), expr("true"))
        .select(col("split"), col("lang"), col("o").as("n_docs"),
          round(col("o").cast("double") / col("st"), 6).as("obs_share"),
          round(col("lt").cast("double") / col("nn"), 6).as("corpus_share"),
          expr("cast(round(power(o - cast(st as double) * lt / nn, 2)" +
            " / (cast(st as double) * lt / nn) * 1e6) as bigint)").as("chi2_term_fp"))
        .orderBy(col("split"), col("lang"))
    }),

    // Dedup threshold-sensitivity sweep (the tuning curve an operator
    // reads before picking the Jaccard cutoff: pairs and docs dropped at
    // every candidate threshold in one pass): q34's confirmed pairs
    // exploded against the 10 thresholds each pair survives — ≤ 10 rows
    // per pair, one keyed agg per threshold cell; the drop count uses
    // the same keep-lowest-id rule as q35. No re-pairing per threshold.
    "q173_threshold_sweep" -> ((s, d) => {
      confirmedPairs(s, d)
        .select(col("doc_b"), col("jacc"),
          explode(expr("sequence(50, 95, 5)")).as("t"))
        .filter(col("jacc") >= col("t").cast("double") / 100.0)
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("doc_b")).as("n_dropped"))
        .select((col("t").cast("double") / 100.0).as("threshold"),
          col("n_pairs"), col("n_dropped"))
        .orderBy(col("threshold"))
    }),

    // Per-source unigram Shannon entropy (the information-density audit
    // beside q137's 3-gram Simpson diversity: low bits/token means
    // templated or repetitive text regardless of n-gram structure):
    // H = ln N − Σc·ln(c)/N over the vocab-bounded count relation — the
    // q167 entropy identity, so the Σc·ln(c) moment is ×1e9 fixed-
    // pointed per TERM and every sum is order-independent; bits/token
    // divides by ln 2 in the same final tree.
    "q174_unigram_entropy" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      c.groupBy(col("source")).agg(
          count(lit(1)).as("n_types"),
          sum(col("c")).as("n_tokens"),
          sum(expr("cast(round(c * ln(cast(c as double)) * 1e9) as bigint)"))
            .as("scl"))
        .select(col("source"), col("n_types"), col("n_tokens"),
          round(expr("ln(cast(n_tokens as double)) - cast(scl as double) / 1e9 / n_tokens"), 6)
            .as("entropy_nats"),
          round(expr("(ln(cast(n_tokens as double)) - cast(scl as double) / 1e9 / n_tokens) / ln(2)"), 6)
            .as("bits_per_token"))
        .orderBy(col("source"))
    }),

    // Duplicate-quality interaction audit (the curation cross-check:
    // are the docs the dedup pass drops actually WORSE — if dups score
    // HIGHER than survivors the pipeline is deleting its best data):
    // q35's dropped set (from the same materialized shingle path) joined
    // against q105's fixed-point scores, per-lang mean score of dropped
    // vs kept in exact integer sums, bias = mean_drop − mean_keep in
    // one final tree. Two keyed aggs + one keyed join.
    "q175_dup_quality_bias" -> ((s, d) => {
      val dropped = confirmedPairs(s, d).select(col("doc_b").as("doc_id")).distinct()
        .withColumn("is_dup", lit(true))
      qualityScores(s, d).select(col("doc_id"), col("lang"), col("sfp"))
        .join(dropped, Seq("doc_id"), "left_outer")
        .withColumn("dup", coalesce(col("is_dup"), lit(false)))
        .groupBy(col("lang"))
        .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup"),
          sum(when(!col("dup"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("dup"), col("sfp")).otherwise(0L)).as("s_dup"),
          sum(when(!col("dup"), col("sfp")).otherwise(0L)).as("s_kept"))
        .select(col("lang"), col("n_dup"), col("n_kept"),
          expr("case when n_dup > 0 then round(cast(s_dup as double) / n_dup / 1e9, 6) end")
            .as("mean_dup"),
          expr("case when n_kept > 0 then round(cast(s_kept as double) / n_kept / 1e9, 6) end")
            .as("mean_kept"),
          expr("case when n_dup > 0 and n_kept > 0 then round(" +
            "cast(s_dup as double) / n_dup / 1e9" +
            " - cast(s_kept as double) / n_kept / 1e9, 6) end").as("bias"))
        .orderBy(col("lang"))
    }),

    // C4/CCNet-style sentence-dedup CLEANING (q153 measures the
    // boilerplate share; THIS is the transform that removes it — the
    // first mutation operator in the text family, gated byte-exact
    // through the q69 redacted-md5 idiom): sentences in original
    // position order, a ≥ 20-char sentence survives iff it is globally
    // unique OR this doc is its lowest-id owner (the q35 keep rule at
    // sentence granularity; short sentences always survive), and each
    // doc reports its kept/removed census plus the md5 of the kept
    // sequence rejoined in order. One sentence-hash df/min-owner keyed
    // agg + one keyed join back; reassembly is a per-doc sort-free
    // collect_list over the position-ordered window, per-doc-bounded.
    "q181_sentence_clean" -> ((s, d) => {
      val sents = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), "[.!?]+")).as(Seq("pos", "raw")))
        .select(col("doc_id"), col("pos"), trim(col("raw")).as("sent"))
        .filter(length(col("sent")) > 0)
        .withColumn("h", when(length(col("sent")) >= 20,
          TextFns.hash32(col("sent"))))
      val own = sents.filter(col("h").isNotNull)
        .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("sdf"),
          min(col("doc_id")).as("owner"))
      val lab = sents.join(own, Seq("h"), "left_outer")
        .withColumn("keep", col("h").isNull || col("sdf") === 1 ||
          col("owner") === col("doc_id"))
      lab.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sents"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          md5(concat_ws("|",
            sort_array(collect_list(when(col("keep"),
              struct(col("pos"), col("sent"))))).getField("sent")))
            .as("raw_md5"))
        .select(col("doc_id"), col("n_sents"), col("n_kept"),
          when(col("n_kept") > 0, col("raw_md5")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // Flesch-Kincaid-style readability grade (the classic quality
    // feature beside q31's ratio stats — a LENGTH-NORMALIZED difficulty
    // signal quality filters threshold on): syllables approximated as
    // vowel-group counts per LOWERCASED token (identical regex both
    // engines; lower() first so sentence-initial capitals and acronyms
    // don't fall to the floor-of-1),
    // sentences via q153's segmentation, grade = 0.39·W/S + 11.8·Syl/W
    // − 15.59 computed per doc from exact integer counts and ×1e6
    // fixed-pointed BEFORE the per-lang census, so the mean and the
    // share-above-grade-12 are exact-sum-derived.
    "q182_readability" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextFns.tokens(col("text")).as("toks"),
          size(filter(transform(split(col("text"), "[.!?]+"), x => trim(x)),
            x => length(x) > 0)).cast("long").as("n_sents"))
        .filter(size(col("toks")) > 0 && col("n_sents") > 0)
        .select(col("doc_id"), col("lang"), col("n_sents"),
          size(col("toks")).cast("long").as("n_words"),
          expr("cast(aggregate(toks, 0L," +
            " (a, x) -> a + greatest(size(regexp_extract_all(lower(x), '[aeiouy]+', 0)), 1))" +
            " as bigint)").as("n_syll"))
        .withColumn("grade_fp", expr(
          "cast(round((0.39 * cast(n_words as double) / n_sents" +
          " + 11.8 * cast(n_syll as double) / n_words - 15.59) * 1e6) as bigint)"))
      base.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("grade_fp")).as("sg"),
          sum(when(col("grade_fp") > 12000000L, 1L).otherwise(0L)).as("n_hard"))
        .select(col("lang"), col("n_docs"),
          round(col("sg").cast("double") / col("n_docs") / 1e6, 6).as("mean_grade"),
          round(col("n_hard").cast("double") / col("n_docs"), 6).as("hard_share"))
        .orderBy(col("lang"))
    }),

    // Per-doc tf-idf keyword extraction (the document-level summarization
    // primitive beside q114's corpus-level stopword induction and q88's
    // graph keywords: ONE term that best characterizes EACH doc): df from
    // the distinct (term, doc) presence relation, idf ×1e9 fixed-pointed
    // per TERM (1-row corpus count broadcast — the q88 shape), per-doc
    // argmax over tf·idf_fp — an EXACT int64 selection key — via the
    // salted TopK so no task owns a whole doc partition's vocabulary.
    "q183_doc_keywords" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val nn = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      // r19 A/B note: both a term-partitioned window df and an eager
      // localCheckpoint of tf measured at-or-worse isolated (join shape
      // 1.46 s / 13 jobs vs 1.55 s for either variant) — the df branch's
      // re-planned subtree is the CHEAPER distinct-shaped aggregate, and
      // the window variant would additionally turn stopword terms into
      // unsplittable hot window partitions (guide §2.5: only a JOIN is
      // AQE-skew-splittable). Kept the aggregate + term-keyed join.
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val idf = df.join(broadcast(nn), expr("true"))
        .withColumn("idf_fp", expr(
          "cast(round(ln(cast(n_docs as double) / df) * 1e9) as bigint)"))
        .select(col("term"), col("df"), col("idf_fp"))
      val scored = tf.join(idf, Seq("term"))
        .withColumn("score_fp", expr("tf * idf_fp"))
      graft.operators.TopK.perKey(scored, Seq("doc_id"),
          Seq(col("score_fp").desc, col("term")), 1, TextFns.hash32(col("term")))
        .select(col("doc_id"), col("term").as("keyword"), col("tf"), col("df"),
          round(col("score_fp").cast("double") / 1e9, 6).as("tfidf"))
        .orderBy(col("doc_id"))
    })
  )

  /** The explode+two-shuffle formulation graft_bigram_stats replaces —
    * retained as the parity reference for BigramStatsParitySpec. */
  private[graft] def repetitionStatsGrouped(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(TextFns.wordShingles(TextFns.tokens(col("text")), 2)).as("gram"))
    grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_grams"),
        max(col("cnt")).as("max_gram_n"),
        (coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)))
          .as("dup_gram_n"))
  }

  /** Hot-block guard threshold: blocks larger than this are sub-split so no
    * single task owns a whole block's n² comparison. */
  private val MaxBlock = 1000

  /** q119 hot-key guard: boundary grams shared by more docs than this on
    * either side are boilerplate boundaries, excluded from the
    * continuity join so no key's pair output goes quadratic. */
  private val MaxBoundaryFanout = 1000L

  /** All within-block pairs with their trigram Jaccard, with oversized
    * blocks SALTED: a block of size n > maxBlock is split into
    * g = ceil(n/maxBlock) sub-groups (deterministic hash(doc_id) % g; see
    * SaltedSelfPairs for why hashing beats plain modulo) and the
    * self-join runs over the triangle of sub-group pairs, keyed on the
    * PAIR (i, j): the x side explodes each row of sub-group i to every
    * target j ≥ i, the y side explodes each row of sub-group j to every
    * source i ≤ j, and the join matches (x.sub, x.j) = (y.i, y.sub) — so
    * each unordered doc pair is produced exactly once (same-sub pairs by
    * the id order, cross-sub pairs by the (i,j) triangle) and each join
    * bucket holds ONE sub-group pair: ~maxBlock² candidate pairs, not the
    * O(n·maxBlock) a one-sided explode keyed only on j would give the
    * hottest bucket (same shape as graft.operators.SaltedSelfPairs).
    * Result-identical to the unsalted all-pairs join; bounded per-task
    * work under skew (the one plan that could go quadratic at 100×).
    *
    * Expects a docs relation with (doc_id, lang, source, lb, gr, ng). */
  private[queries] def blockedJaccardPairs(docs: DataFrame, maxBlock: Int): DataFrame = {
    val sizes = docs.groupBy(col("lang"), col("source"), col("lb"))
      .agg(count(lit(1)).as("bs"))
    // gr sorted ONCE PER DOC (amortized over every pair the doc joins
    // into) so the per-pair intersection is a zero-allocation sorted merge
    // (graft_sorted_icount) instead of a hash-set build per call — the
    // pair count is quadratic in block size, the doc count is not.
    val dd = docs.join(sizes, Seq("lang", "source", "lb"))
      .withColumn("gr", array_sort(col("gr")))
      .withColumn("g", ceil(col("bs").cast("double") / maxBlock).cast("int"))
      .withColumn("sub", pmod(hash(col("doc_id")), col("g")).cast("int"))
    val x = dd.withColumn("j", explode(sequence(col("sub"), col("g") - 1)))
    val y = dd.withColumn("i", explode(sequence(lit(0), col("sub"))))
    x.as("x").join(y.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
        col("x.lb") === col("y.lb") &&
        col("x.j") === col("y.sub") &&
        col("x.sub") === col("y.i") &&
        (col("x.sub") =!= col("y.sub") || col("x.doc_id") < col("y.doc_id")) &&
        // Size-ratio prefilter: Jaccard >= 0.5 needs |A| and |B| within 2x.
        col("x.ng").cast("double") >= lit(0.5) * col("y.ng") &&
        col("y.ng").cast("double") >= lit(0.5) * col("x.ng"))
      .select(col("x.lang").as("lang"), col("x.source").as("source"),
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
        expr("graft_sorted_icount(x.gr, y.gr)").as("isz"),
        (col("x.ng") + col("y.ng")).as("nsum"))
      // gr holds DISTINCT ints (injective trigram packing), so
      // |A ∪ B| = |A| + |B| - |A ∩ B| — one set operation per pair
      // instead of two (array_union was ~half the join's work).
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        (col("isz").cast("double") / (col("nsum") - col("isz"))).as("jacc"))
  }

  /** q35's oracle — also q51's: the incremental dedup's defining property
    * is equality with the full-corpus result. */
  private val minhashKeepSql: String = s"""
        $pairsCtes,
        dropped AS (SELECT DISTINCT doc_b FROM pairs WHERE jacc >= $JaccThreshold)
        SELECT lang, COUNT(*) AS n_kept
        FROM documents
        WHERE doc_id NOT IN (SELECT doc_b FROM dropped)
        GROUP BY lang
        ORDER BY lang"""

  val oracles: Map[String, String] = {
    val langs = Seq("en", "es", "de", "fr", "zh")
    def inv(l: String): String =
      TextFns.stopwords(l).map(w => s"'$w'").mkString("[", ",", "]")
    def hits(l: String): String =
      s"CAST(len(list_filter(toks, t -> list_contains(${inv(l)}, t))) AS INTEGER)"

    // 4-hex-char → int via strpos arithmetic (mirrors TextFns.md5Bits16).
    val hex16 = (1 to 4).map { p =>
      s"(strpos('0123456789abcdef', substr(md5(t), $p, 1)) - 1) * ${1L << (4 * (4 - p))}"
    }.mkString(" + ")

    // Shared verbatim by q36 (DataFrame surface) and q206 (spark.sql
    // surface): the two front doors to the same native kernels must land
    // on identical rows.
    val q36SimhashSql = s"""
        WITH t AS (
          SELECT doc_id,
                 list_transform(
                   list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                   t -> $hex16) AS hs
          FROM documents),
        b AS (
          SELECT doc_id,
                 ${(0 until 16).map(i =>
                     s"list_sum(list_transform(hs, h -> CASE WHEN (h // ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END)) AS s_$i"
                   ).mkString(",\n                 ")}
          FROM t)
        SELECT doc_id,
               CAST(${(0 until 16).map(i => s"CASE WHEN s_$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")} AS BIGINT) AS simhash
        FROM b
        ORDER BY doc_id"""

    // bm25Scored's oracle twin: the fixed-point BM25 CTE chain shared by
    // q93 (presentation top-10) and q128 (nDCG ranking audit) — ends at
    // `sc(doc_id, dl, n_hit, sfp)`.
    val bm25Ctes = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl FROM d),
        qt AS (SELECT unnest(['spark', 'join', 'stream']) AS term),
        tf AS (
          SELECT d.doc_id, q.term, d.dl,
                 CAST(len(list_filter(d.toks, x -> x = q.term)) AS BIGINT) AS tf
          FROM d CROSS JOIN qt q
          WHERE len(list_filter(d.toks, x -> x = q.term)) > 0),
        df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        fp AS (
          SELECT tf.doc_id, tf.dl, tf.tf,
                 CAST(ROUND(ln((g.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / g.avgdl))
                   * 1e9) AS BIGINT) AS contrib_fp
          FROM tf JOIN df USING (term) CROSS JOIN g),
        sc AS (
          SELECT doc_id, dl, CAST(COUNT(*) AS BIGINT) AS n_hit,
                 CAST(SUM(tf) AS BIGINT) AS tf_total,
                 CAST(SUM(contrib_fp) AS BIGINT) AS sfp
          FROM fp GROUP BY doc_id, dl)"""

    Map(
      "q31_text_stats" -> """
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_subwords,
               CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
               CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(toks) AS avg_token_len,
               CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','a','in','is','that'], t))) AS DOUBLE)
                 / len(toks) AS stop_ratio
        FROM t
        ORDER BY doc_id""",

      "q32_lang_id" -> s"""
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        h AS (
          SELECT doc_id, lang,
                 ${langs.map(l => s"${hits(l)} AS h_$l").mkString(",\n                 ")}
          FROM t)
        SELECT doc_id, lang,
               CASE ${langs.map(l => s"WHEN h_$l = greatest(${langs.map(x => s"h_$x").mkString(",")}) THEN '$l'").mkString(" ")}
               END AS pred_lang,
               ${langs.map(l => s"h_$l").mkString(", ")}
        FROM h
        ORDER BY doc_id""",

      "q33_dedup_exact" -> """
        WITH t AS (
          SELECT doc_id,
                 array_to_string(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')[1:2], ' ') AS key
          FROM documents)
        SELECT key, COUNT(*) AS n_docs, MIN(doc_id) AS kept
        FROM t
        GROUP BY key
        HAVING COUNT(*) > 1
        ORDER BY key""",

      "q34_minhash_pairs" -> s"""
        $pairsCtes
        SELECT doc_a, doc_b, jacc
        FROM pairs
        WHERE jacc >= $JaccThreshold
        ORDER BY doc_a, doc_b""",

      "q35_minhash_keep" -> minhashKeepSql,

      // The incremental path must reproduce the full-corpus dedup exactly
      // — same oracle as q35, and the gate's hash compare enforces it.
      "q51_dedup_incremental" -> minhashKeepSql,

      // Transitive closure over the confirmed pairs via recursive CTE:
      // comp(u) = min id reachable from u (including u). The engine side
      // computes the same fixpoint iteratively (pointer jumping); the
      // oracle pins cluster membership exactly.
      "q59_dedup_components" -> s"""
        ${pairsCtes.replaceFirst("(?i)WITH", "WITH RECURSIVE")},
        e AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jacc >= $JaccThreshold
          UNION ALL
          SELECT doc_b AS u, doc_a AS v FROM pairs WHERE jacc >= $JaccThreshold),
        r(u, v) AS (
          SELECT u, v FROM e
          UNION
          SELECT r.u, e2.v FROM r JOIN e e2 ON r.v = e2.u),
        comp AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS component FROM r GROUP BY u)
        SELECT component, COUNT(*) AS n_members
        FROM comp
        GROUP BY component
        ORDER BY component""",

      // Both engines rank on the 6-dp-ROUNDED score (see the query
      // comment); ROW_NUMBER is BIGINT in DuckDB, cast to match Spark's
      // int rank.
      "q62_tfidf_topk" -> """
        WITH t AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT doc_id, term,
                 ROUND(cnt * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n),
        r AS (
          SELECT doc_id, term, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, term) AS rank
          FROM scored)
        SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score
        FROM r WHERE rank <= 3
        ORDER BY doc_id, rank""",

      "q36_simhash" -> q36SimhashSql,
      "q206_sql_simhash" -> q36SimhashSql,

      "q49_stratified_sample" -> {
        val sampHash = hex32.replace("md5(x)", "md5('samp|' || CAST(doc_id AS VARCHAR))")
        s"""
        WITH g AS (
          SELECT lang, CAST($sampHash AS BIGINT) % 100 AS gate
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN gate < (CASE lang WHEN 'en' THEN 30 WHEN 'es' THEN 60
                                               WHEN 'de' THEN 60 WHEN 'fr' THEN 80
                                               WHEN 'zh' THEN 100 ELSE 100 END)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM g
        GROUP BY lang
        ORDER BY lang"""
      },

      // The oracle can't reproduce Spark's HLL++ sketch value (engine-
      // specific), and doesn't need to: it pins the EXACT distinct counts
      // and the bound verdict as literal TRUE — if Spark's sketch drifts
      // past 3·rsd of exact, within_bound flips false and the hash gate
      // fails. COUNT(DISTINCT) is BIGINT in both engines.
      "q58_approx_distinct_bound" -> """
        SELECT lang,
               COUNT(DISTINCT text) AS exact_distinct,
               TRUE AS within_bound
        FROM documents
        GROUP BY lang
        ORDER BY lang""",

      // Same regex family, RE2/Java-common syntax only; DuckDB needs the
      // explicit 'g' flag (Spark's regexp_replace is global by default).
      "q70_pii_redact" -> """
        WITH p AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com or +1-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS txt
          FROM documents),
        r AS (
          SELECT doc_id, txt,
                 regexp_replace(
                   regexp_replace(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\+1-555-[0-9]{3,4}', '<PHONE>', 'g') AS redacted
          FROM p)
        SELECT doc_id,
               CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(txt, '\+1-555-[0-9]{3,4}')) AS BIGINT) AS n_phones,
               md5(redacted) AS redacted_md5,
               (len(regexp_extract_all(redacted, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) = 0
                AND len(regexp_extract_all(redacted, '\+1-555-[0-9]{3,4}')) = 0) AS clean
        FROM r ORDER BY doc_id""",

      // Chunk starts are 1, 1+48, ... <= len (1-indexed token positions in
      // both engines); list slices clamp at the end so the tail chunk is
      // short, never padded.
      "q67_doc_chunks" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        c AS (
          SELECT doc_id,
                 CAST((st - 1) // 48 AS BIGINT) AS chunk_id,
                 CAST(st AS BIGINT) AS start_tok,
                 toks[st : st + 63] AS chunk
          FROM t, UNNEST(generate_series(1, greatest(len(toks), 1), 48)) AS u(st))
        SELECT doc_id, chunk_id, start_tok,
               CAST(len(chunk) AS INTEGER) AS chunk_len,
               array_to_string(chunk, ' ') AS chunk_text
        FROM c ORDER BY doc_id, chunk_id""",

      "q68_seq_packing" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n
          FROM documents),
        w AS (
          SELECT doc_id, lang, n,
                 COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
          FROM t)
        SELECT doc_id, lang, n,
               CAST(cum_prev // 512 AS BIGINT) AS first_seq,
               CAST((cum_prev + n - 1) // 512 AS BIGINT) AS last_seq,
               CAST(cum_prev % 512 AS BIGINT) AS seq_offset
        FROM w ORDER BY doc_id""",

      // Like q58: the oracle cannot (and must not) reproduce the sketch —
      // it pins the exact top-10 counts, the data-dependent `guaranteed`
      // flags, and the two MG theorems as literal TRUE. Any Spark-side
      // sketch violation flips a boolean and fails the hash gate.
      "q66_heavy_hitters_bound" -> """
        WITH s AS (
          SELECT regexp_replace(text, '\s+', '', 'g') AS t FROM documents),
        ch AS (
          SELECT substr(t, i, 1) AS c
          FROM s, UNNEST(generate_series(1, length(t))) AS u(i)),
        cnt AS (SELECT c, COUNT(*) AS exact_n FROM ch GROUP BY 1),
        tot AS (SELECT SUM(exact_n) AS n FROM cnt)
        SELECT c, exact_n,
               exact_n > n / 21.0 AS guaranteed,
               TRUE AS present_ok,
               TRUE AS bound_ok
        FROM cnt, tot
        ORDER BY exact_n DESC, c LIMIT 10""",

      // Bigram semantics mirror TextFns.wordShingles: a doc with < 2
      // tokens yields its single token as the one "gram" (greatest(..,1)),
      // so the fractions are total functions. SUM over BIGINT is HUGEINT
      // in DuckDB — cast back so the hash compare sees int64 like Spark.
      "q63_repetition_stats" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram
          FROM t, UNNEST(generate_series(1, greatest(len(toks) - 1, 1))) AS u(i)),
        c AS (
          SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(cnt) AS BIGINT) AS n_grams,
               CAST(MAX(cnt) AS BIGINT) AS max_gram_n,
               CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_gram_frac,
               CAST(COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS DOUBLE) / SUM(cnt) AS dup_gram_frac,
               (CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) <= 0.10
                AND CAST(COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS DOUBLE) / SUM(cnt) <= 0.15) AS keep
        FROM c GROUP BY doc_id ORDER BY doc_id""",

      "q48_rolling_fp" -> s"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        h AS (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(toks, x -> CAST($hex32 AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007) AS fp
          FROM t)
        SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n_same_fp
        FROM h
        ORDER BY doc_id""",

      "q37_trigram_jaccard" -> s"""
        WITH g AS (
          SELECT doc_id, lang, source,
                 CAST(floor(n_chars / 100) AS BIGINT) AS lb,
                 list_distinct(list_transform(
                   list_transform(
                     generate_series(1, greatest(length(text) - 2, 1)),
                     i -> substr(text, i, 3)),
                   x -> CAST(ascii(substr(x, 1, 1)) * 65536
                           + ascii(substr(x, 2, 1)) * 256
                           + ascii(substr(x, 3, 1)) AS BIGINT))) AS gr
          FROM documents)
        SELECT lang, source, doc_a, doc_b, jacc FROM (
          SELECT x.lang, x.source, x.doc_id AS doc_a, y.doc_id AS doc_b,
                 CAST(len(list_intersect(x.gr, y.gr)) AS DOUBLE)
                   / (len(x.gr) + len(y.gr) - len(list_intersect(x.gr, y.gr))) AS jacc
          FROM g x JOIN g y
            ON x.lang = y.lang AND x.source = y.source AND x.lb = y.lb
               AND x.doc_id < y.doc_id)
        WHERE jacc >= 0.5
        ORDER BY doc_a, doc_b""",

      // Positional 5-grams; docs under 5 tokens get an empty series (the
      // Spark side filters its short-doc padding gram the same way). The
      // interval union is the lead() gaps trick on both engines.
      "q71_repeated_ngrams" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks, toks FROM t),
        g AS (
          SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 array_to_string(toks[i:i+4], ' ') AS gram
          FROM n, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)),
        rep AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
        rp AS (SELECT doc_id, pos,
                      LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
               FROM g WHERE gram IN (SELECT gram FROM rep)),
        cov AS (
          SELECT doc_id, COUNT(*) AS n_rep_grams,
                 SUM(CASE WHEN nxt IS NULL THEN 5 ELSE LEAST(5, nxt - pos) END) AS covered_tokens
          FROM rp GROUP BY doc_id)
        SELECT n.doc_id, n.n_toks,
               CAST(COALESCE(cov.n_rep_grams, 0) AS BIGINT) AS n_rep_grams,
               CAST(COALESCE(cov.covered_tokens, 0) AS BIGINT) AS covered_tokens,
               CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE) / n.n_toks AS rep_frac,
               (CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE) / n.n_toks) <= 0.2 AS keep
        FROM n LEFT JOIN cov USING (doc_id)
        ORDER BY doc_id""",

      // q59's transitive closure + a keeper window: longest doc wins,
      // ties to the lowest id. n_members is BIGINT on both engines.
      "q72_cluster_keeper" -> s"""
        ${pairsCtes.replaceFirst("(?i)WITH", "WITH RECURSIVE")},
        e AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jacc >= $JaccThreshold
          UNION ALL
          SELECT doc_b AS u, doc_a AS v FROM pairs WHERE jacc >= $JaccThreshold),
        r(u, v) AS (
          SELECT u, v FROM e
          UNION
          SELECT r.u, e2.v FROM r JOIN e e2 ON r.v = e2.u),
        comp AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS component FROM r GROUP BY u),
        m AS (
          SELECT comp.doc_id, comp.component, d.n_chars
          FROM comp JOIN documents d USING (doc_id)),
        k AS (
          SELECT component, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY component
                                    ORDER BY n_chars DESC, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY component) AS n_members
          FROM m)
        SELECT component, doc_id AS keeper, n_chars AS keeper_n_chars,
               CAST(n_members AS BIGINT) AS n_members
        FROM k WHERE rn = 1
        ORDER BY component""",

      // The pair table is built over the DISTINCT-token tf relation on
      // both engines; 1-char tokens contribute no pair (generate_series
      // empty / length filter). SUM over BIGINT cast back from HUGEINT.
      "q76_bpe_merge_step" -> """
        WITH t AS (
          SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS tok
          FROM documents),
        tf AS (SELECT tok, COUNT(*) AS f FROM t GROUP BY 1),
        p AS (
          SELECT substr(tok, i, 2) AS pair, CAST(SUM(f) AS BIGINT) AS w
          FROM tf, UNNEST(generate_series(1, len(tok) - 1)) AS u(i)
          GROUP BY 1),
        r AS (SELECT pair, w, ROW_NUMBER() OVER (ORDER BY w DESC, pair) AS rank
              FROM p)
        SELECT CAST(rank AS INTEGER) AS rank, pair, w
        FROM r WHERE rank <= 10 ORDER BY rank""",

      // Mean/std derived from integer (n, Σx, Σx²) exactly as Spark does;
      // both engines round z to 6 dp BEFORE the outlier compare.
      // sd > 0 guard mirrors the Spark twin: degenerate groups get NULL
      // z / NULL is_outlier on both engines (never NaN/±Inf).
      "q77_zscore" -> """
        WITH s AS (
          SELECT lang, COUNT(*) AS n,
                 CAST(SUM(n_chars) AS BIGINT) AS s1,
                 CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
          FROM documents GROUP BY 1),
        m AS (
          SELECT lang, CAST(s1 AS DOUBLE) / n AS mean,
                 sqrt(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd
          FROM s)
        SELECT doc_id, d.lang, n_chars,
               ROUND(mean, 6) AS mean_len,
               ROUND(sd, 6) AS sd_len,
               CASE WHEN sd > 0 THEN ROUND((n_chars - mean) / sd, 6) END AS z,
               CASE WHEN sd > 0
                    THEN abs(ROUND((n_chars - mean) / sd, 6)) > 2.0 END AS is_outlier
        FROM documents d JOIN m ON d.lang = m.lang
        ORDER BY doc_id""",

      // Same lower-nearest-rank selection as q13's oracle, per lang at
      // p5/p95; ties interchangeable (the VALUE at the rank is unique).
      "q78_winsorize" -> """
        WITH r AS (
          SELECT lang, doc_id, n_chars, CAST(n_chars AS DOUBLE) AS len,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS cnt
          FROM documents),
        p05 AS (SELECT lang, len AS p5 FROM r
                WHERE rn = CAST(FLOOR(0.05 * (cnt - 1)) AS BIGINT) + 1),
        p95 AS (SELECT lang, len AS p95 FROM r
                WHERE rn = CAST(FLOOR(0.95 * (cnt - 1)) AS BIGINT) + 1)
        SELECT doc_id, d.lang, n_chars,
               CAST(p5 AS BIGINT) AS p05_len,
               CAST(p95 AS BIGINT) AS p95_len,
               LEAST(GREATEST(n_chars, CAST(p5 AS BIGINT)), CAST(p95 AS BIGINT))
                 AS clamped
        FROM documents d
        JOIN p05 ON d.lang = p05.lang
        JOIN p95 ON d.lang = p95.lang
        ORDER BY doc_id""",

      // Integer-exact weighted gate: hash32·Σw < k·w·2^32 (see the query
      // comment), in HUGEINT (int128) so it cannot overflow at any
      // corpus scale — mirroring the Spark twin's decimal(38,0). The
      // per-lang Σw is a scalar subquery-free window-free join, same as
      // Spark's broadcast agg.
      "q75_weighted_sample" -> {
        val wsampHash = hex32.replace("md5(x)", "md5('wsamp|' || CAST(doc_id AS VARCHAR))")
        s"""
        WITH w AS (
          SELECT doc_id, lang, n_chars AS w FROM documents),
        s AS (SELECT lang, CAST(SUM(w) AS BIGINT) AS sum_w FROM w GROUP BY lang)
        SELECT doc_id, w.lang, w.w,
               (CAST($wsampHash AS HUGEINT) * s.sum_w
                  < CAST(20 AS HUGEINT) * w.w * ${1L << 32}) AS kept
        FROM w JOIN s ON w.lang = s.lang
        ORDER BY doc_id"""
      },

      // 8-token windows via the same inclusive-slice idiom as q71; the
      // benchmark set is doc_id ≡ 0 (mod 10); <8-token docs contribute no
      // windows (empty generate_series) but stay in the output at 0 hits.
      "q79_decontaminate" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks, toks FROM t),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
          FROM n, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)),
        b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        h AS (SELECT doc_id, COUNT(DISTINCT gram) AS n_hit
              FROM g WHERE doc_id % 10 <> 0 AND gram IN (SELECT gram FROM b)
              GROUP BY doc_id)
        SELECT n.doc_id, n.n_toks,
               CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
               COALESCE(h.n_hit, 0) > 0 AS contaminated
        FROM n LEFT JOIN h USING (doc_id)
        WHERE n.doc_id % 10 <> 0
        ORDER BY doc_id""",

      // Integer-exact mixture gate: quota = (N·3) // 20 (integer div on
      // both engines); kept iff hash32·n_l < quota·2^32 — same exact
      // gate family as q49/q75, in HUGEINT like q75's oracle so the
      // quota·2^32 product cannot overflow at any corpus size.
      "q80_mixture_balance" -> {
        val mixHash = hex32.replace("md5(x)", "md5('mix|' || CAST(doc_id AS VARCHAR))")
        s"""
        WITH pl AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        q AS (SELECT lang, n_docs,
                     (SELECT COUNT(*) FROM documents) * 3 // 20 AS quota
              FROM pl)
        SELECT d.lang, q.n_docs, CAST(q.quota AS BIGINT) AS quota,
               CAST(SUM(CASE WHEN CAST($mixHash AS HUGEINT) * q.n_docs
                                  < CAST(q.quota AS HUGEINT) * ${1L << 32}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               (q.quota >= q.n_docs) AS uncapped
        FROM documents d JOIN q ON d.lang = q.lang
        GROUP BY d.lang, q.n_docs, q.quota
        ORDER BY d.lang"""
      },

      // The five-stage chain built from the member oracles' verbatim
      // fragments: q33's prefix-key dedup, q131's rule cascade, q79's
      // 8-gram bench overlap (bench from the full corpus), q80's HUGEINT
      // mixture gate (census over the s3 survivors), q68's packing window.
      "q209_pipeline_curation" -> {
        val mixHash = hex32.replace("md5(x)",
          "md5('mix|' || CAST(doc_id AS VARCHAR))")
        s"""
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        k1 AS (
          SELECT doc_id, lang, toks,
                 array_to_string(toks[1:2], ' ') AS key
          FROM t),
        s1 AS (
          SELECT doc_id, lang, toks FROM k1
          WHERE doc_id IN (SELECT MIN(doc_id) FROM k1 GROUP BY key)),
        f AS (
          SELECT doc_id, lang, toks,
                 CAST(len(toks) AS BIGINT) AS n,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len,
                 CAST(list_max(list_transform(list_distinct(toks),
                   x -> len(list_filter(toks, y -> y = x)))) AS BIGINT) AS max_rep
          FROM s1 WHERE len(toks) > 0),
        s2 AS (
          SELECT doc_id, lang, toks, n FROM f
          WHERE n BETWEEN 5 AND 1000 AND 2 * n <= sum_len AND sum_len <= 12 * n
            AND 5 * max_rep <= n),
        bg AS (
          SELECT DISTINCT array_to_string(toks[i:i+7], ' ') AS gram
          FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)
          WHERE doc_id % 10 = 0),
        cont AS (
          SELECT DISTINCT doc_id
          FROM s2, UNNEST(generate_series(1, len(toks) - 7)) AS u(i)
          WHERE array_to_string(toks[i:i+7], ' ') IN (SELECT gram FROM bg)),
        s3 AS (
          SELECT doc_id, lang, n FROM s2
          WHERE doc_id % 10 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)),
        pl AS (SELECT lang, COUNT(*) AS n_docs FROM s3 GROUP BY lang),
        q AS (SELECT lang, n_docs,
                     (SELECT COUNT(*) FROM s3) * 3 // 20 AS quota
              FROM pl),
        s4 AS (
          SELECT s3.doc_id, s3.lang, s3.n
          FROM s3 JOIN q USING (lang)
          WHERE CAST($mixHash AS HUGEINT) * q.n_docs
                < CAST(q.quota AS HUGEINT) * ${1L << 32}),
        w AS (
          SELECT doc_id, lang, n,
                 COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
          FROM s4)
        SELECT doc_id, lang, n,
               CAST(cum_prev // 512 AS BIGINT) AS first_seq,
               CAST((cum_prev + n - 1) // 512 AS BIGINT) AS last_seq,
               CAST(cum_prev % 512 AS BIGINT) AS seq_offset
        FROM w ORDER BY doc_id"""
      },

      // Add-one bigram LM: both engines compute −ln((c2+1)/(c1+V)) per
      // bigram POSITION, average per doc, and round to 6 dp before the
      // keep compare. V = COUNT(DISTINCT second word) over bigram types.
      "q81_bigram_surprisal" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram,
                 toks[i] AS w1, toks[i+1] AS w2
          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)),
        c2 AS (SELECT gram, COUNT(*) AS c2 FROM g GROUP BY gram),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM g GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT w2) AS v FROM g),
        sc AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
                 ROUND(AVG(-ln((c2.c2 + 1.0) / (c1.c1 + v.v))), 6) AS avg_nll
          FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v
          GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               sc.avg_nll,
               CASE WHEN sc.n_bigrams IS NULL THEN TRUE
                    ELSE sc.avg_nll <= 3.43 END AS keep
        FROM t LEFT JOIN sc USING (doc_id)
        ORDER BY doc_id""",

      // Exact nearest-rank p50 twice (q78's selection idiom): median of
      // length, then median of |x − med|; r rounded to 6 dp; MAD = 0
      // yields NULL r / NULL verdict on both engines.
      "q82_robust_scale" -> """
        WITH r1 AS (
          SELECT lang, doc_id, n_chars, CAST(n_chars AS DOUBLE) AS len,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS cnt
          FROM documents),
        med AS (SELECT lang, len AS med FROM r1
                WHERE rn = CAST(FLOOR(0.5 * (cnt - 1)) AS BIGINT) + 1),
        r2 AS (
          SELECT d.lang, abs(CAST(d.n_chars AS DOUBLE) - m.med) AS adev,
                 ROW_NUMBER() OVER (PARTITION BY d.lang
                   ORDER BY abs(CAST(d.n_chars AS DOUBLE) - m.med)) AS rn,
                 COUNT(*) OVER (PARTITION BY d.lang) AS cnt
          FROM documents d JOIN med m ON d.lang = m.lang),
        mad AS (SELECT lang, adev AS mad FROM r2
                WHERE rn = CAST(FLOOR(0.5 * (cnt - 1)) AS BIGINT) + 1)
        SELECT d.doc_id, d.lang, d.n_chars, m.med, x.mad,
               CASE WHEN x.mad > 0.0
                    THEN ROUND((CAST(d.n_chars AS DOUBLE) - m.med)
                               / (1.4826 * x.mad), 6) END AS r,
               CASE WHEN x.mad > 0.0
                    THEN abs(ROUND((CAST(d.n_chars AS DOUBLE) - m.med)
                                   / (1.4826 * x.mad), 6)) > 1.35 END AS is_outlier
        FROM documents d
        JOIN med m ON d.lang = m.lang
        JOIN mad x ON d.lang = x.lang
        ORDER BY doc_id""",

      // Prefix-filter containment is EXACT (no-recall-loss guarantee in
      // the query comment), so the oracle replicates the same candidate
      // generation over the same md5-derived hashes: hash-sorted prefix
      // of |hs|−⌈0.9·|hs|⌉+1 (pure integer arithmetic, mirroring the
      // Spark twin exactly — no float 0.1 literal) joined against the
      // full posting index, exact intersect confirm. Reuses pairsCtes'
      // hashed CTE (unreferenced CTEs are inert).
      "q83_containment_pairs" -> s"""
        $pairsCtes,
        sorted AS (SELECT doc_id, list_sort(hs) AS hs FROM hashed),
        pref AS (
          SELECT doc_id, unnest(hs[1:(len(hs) - ((9 * len(hs) + 9) // 10) + 1)]) AS h
          FROM sorted),
        post AS (SELECT doc_id AS pid, unnest(hs) AS h FROM sorted),
        cand2 AS (
          SELECT DISTINCT LEAST(p.doc_id, q.pid) AS doc_a,
                          GREATEST(p.doc_id, q.pid) AS doc_b
          FROM pref p JOIN post q USING (h) WHERE p.doc_id <> q.pid),
        conf AS (
          SELECT c.doc_a, c.doc_b,
                 len(list_intersect(a.hs, b.hs)) AS isz,
                 len(a.hs) AS la, len(b.hs) AS lb
          FROM cand2 c
          JOIN sorted a ON c.doc_a = a.doc_id
          JOIN sorted b ON c.doc_b = b.doc_id)
        SELECT doc_a, doc_b, CAST(isz AS BIGINT) AS n_common,
               ROUND(CAST(isz AS DOUBLE) / LEAST(la, lb), 6) AS containment,
               ROUND(CAST(isz AS DOUBLE) / (la + lb - isz), 6) AS jacc
        FROM conf
        WHERE CAST(isz AS DOUBLE) / LEAST(la, lb) >= 0.9
        ORDER BY doc_a, doc_b""",

      // First-owner = MIN(doc_id) per shingle hash, same keep-lowest-id
      // convention as q35/q51; counts are over DISTINCT shingle types per
      // doc (hs is distinct by construction on both engines).
      "q84_ngram_novelty" -> s"""
        $pairsCtes,
        e AS (SELECT doc_id, unnest(hs) AS h FROM hashed),
        f AS (SELECT h, MIN(doc_id) AS first_owner FROM e GROUP BY h),
        agg AS (
          SELECT e.doc_id, COUNT(*) AS n_types,
                 SUM(CASE WHEN f.first_owner = e.doc_id THEN 1 ELSE 0 END) AS n_novel
          FROM e JOIN f USING (h)
          GROUP BY e.doc_id)
        SELECT doc_id, CAST(n_types AS BIGINT) AS n_types,
               CAST(n_novel AS BIGINT) AS n_novel,
               ROUND(CAST(n_novel AS DOUBLE) / n_types, 6) AS novelty,
               ROUND(CAST(n_novel AS DOUBLE) / n_types, 6) >= 0.5 AS keep
        FROM agg
        ORDER BY doc_id""",

      // Same division tree as the Spark twin — (c2/n2)/((u1/n1)·(u2/n1))
      // in doubles, ln, 6-dp round BEFORE ranking; ties broken by gram.
      "q85_pmi_phrases" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        u AS (SELECT unnest(toks) AS tok FROM t),
        uc AS (SELECT tok, COUNT(*) AS u FROM u GROUP BY tok),
        n1 AS (SELECT CAST(SUM(u) AS BIGINT) AS n1 FROM uc),
        g AS (
          SELECT array_to_string(toks[i:i+1], ' ') AS gram,
                 toks[i] AS w1, toks[i+1] AS w2
          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS s(i)),
        c2 AS (SELECT gram, MIN(w1) AS w1, MIN(w2) AS w2, COUNT(*) AS c2
               FROM g GROUP BY gram),
        n2 AS (SELECT CAST(SUM(c2) AS BIGINT) AS n2 FROM c2),
        p AS (
          SELECT c2.gram, c2.c2,
                 ROUND(ln((CAST(c2.c2 AS DOUBLE) / n2.n2) /
                   ((CAST(a.u AS DOUBLE) / n1.n1)
                     * (CAST(b.u AS DOUBLE) / n1.n1))), 6) AS pmi
          FROM c2
          CROSS JOIN n1 CROSS JOIN n2
          JOIN uc a ON c2.w1 = a.tok
          JOIN uc b ON c2.w2 = b.tok
          WHERE c2.c2 >= 5),
        r AS (SELECT gram, c2, pmi,
                     ROW_NUMBER() OVER (ORDER BY pmi DESC, gram) AS rank
              FROM p)
        SELECT CAST(rank AS INTEGER) AS rank, gram, CAST(c2 AS BIGINT) AS c2, pmi
        FROM r WHERE rank <= 20 ORDER BY rank""",

      // Same salted md5-derived hash (x aliased to 'cdc|' || tok so the
      // shared hex32 arithmetic applies verbatim), same exclusive prefix-
      // sum chunk ids, same cross-doc-shared rule (distinct docs > 1).
      "q86_cdc_chunks" -> s"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        p AS (
          SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS tok,
                 'cdc|' || toks[i] AS x
          FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)),
        h AS (
          SELECT doc_id, pos, tok,
                 CASE WHEN CAST($hex32 AS BIGINT) % 8 = 0 THEN 1 ELSE 0 END AS brk
          FROM p),
        c AS (
          SELECT doc_id, pos, tok,
                 COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
          FROM h),
        ch AS (
          SELECT doc_id, chunk, md5(string_agg(tok, ' ' ORDER BY pos)) AS ck,
                 COUNT(*) AS clen
          FROM c GROUP BY doc_id, chunk),
        sh AS (SELECT ck FROM ch GROUP BY ck HAVING COUNT(DISTINCT doc_id) > 1),
        agg AS (
          SELECT doc_id, COUNT(*) AS n_chunks,
                 SUM(CASE WHEN ck IN (SELECT ck FROM sh) THEN 1 ELSE 0 END) AS n_dup_chunks,
                 SUM(clen) AS n_toks
          FROM ch GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(n_chunks, 0) AS BIGINT) AS n_chunks,
               CAST(COALESCE(n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
               CAST(COALESCE(n_toks, 0) AS BIGINT) AS n_toks,
               CASE WHEN COALESCE(n_chunks, 0) > 0
                    THEN ROUND(CAST(COALESCE(n_dup_chunks, 0) AS DOUBLE)
                      / n_chunks, 6) END AS dup_frac
        FROM documents d LEFT JOIN agg USING (doc_id)
        ORDER BY doc_id""",

      // Postings pinned in doc_id order on both engines and serialized to
      // ONE pipe-joined string (the q23 house rule: gate output is
      // scalars-only so the driver comparator can sort/hash every column);
      // BIGINT || VARCHAR concatenation renders integers without decimal
      // points on both.
      "q87_postings" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        p AS (
          SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS term
          FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)),
        pd AS (
          SELECT term, doc_id, COUNT(*) AS tf, MIN(pos) AS first_pos
          FROM p GROUP BY term, doc_id),
        st AS (
          SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
          FROM pd GROUP BY term),
        r AS (
          SELECT term, df, cf,
                 ROW_NUMBER() OVER (ORDER BY df DESC, cf DESC, term) AS rank
          FROM st)
        SELECT CAST(rank AS INTEGER) AS rank, r.term,
               CAST(df AS BIGINT) AS df, cf,
               string_agg(pd.doc_id || ':' || pd.first_pos || ':' || pd.tf,
                 '|' ORDER BY pd.doc_id) AS postings
        FROM r JOIN pd ON r.term = pd.term
        WHERE rank <= 20
        GROUP BY rank, r.term, df, cf
        ORDER BY rank""",

      // The same fixed-point pipeline unrolled: // is DuckDB integer
      // division, div is Spark's — both truncate toward zero and every
      // operand here is non-negative, so all three iterations are
      // bit-identical integer arithmetic on both engines.
      "q88_textrank" -> """
        WITH t AS (
          SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT toks[i] AS a, toks[i + 1] AS b
          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS s(i)
          WHERE toks[i] <> toks[i + 1]),
        e AS (
          SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v, COUNT(*) AS w
          FROM g GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        dir AS (
          SELECT u AS src, v AS dst, w FROM e
          UNION ALL
          SELECT v AS src, u AS dst, w FROM e),
        ws AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wu FROM dir GROUP BY src),
        nn AS (SELECT COUNT(*) AS n FROM ws),
        r0 AS (SELECT src AS node, 1000000000000 // n AS r FROM ws, nn),
        d1 AS (
          SELECT d.dst AS node, SUM((r.r * d.w) // w2.wu) AS s
          FROM dir d JOIN r0 r ON d.src = r.node JOIN ws w2 ON d.src = w2.src
          GROUP BY d.dst),
        r1 AS (SELECT node, ((1000000000000 * 15) // 100) // n + (85 * s) // 100 AS r
               FROM d1, nn),
        d2 AS (
          SELECT d.dst AS node, SUM((r.r * d.w) // w2.wu) AS s
          FROM dir d JOIN r1 r ON d.src = r.node JOIN ws w2 ON d.src = w2.src
          GROUP BY d.dst),
        r2 AS (SELECT node, ((1000000000000 * 15) // 100) // n + (85 * s) // 100 AS r
               FROM d2, nn),
        d3 AS (
          SELECT d.dst AS node, SUM((r.r * d.w) // w2.wu) AS s
          FROM dir d JOIN r2 r ON d.src = r.node JOIN ws w2 ON d.src = w2.src
          GROUP BY d.dst),
        r3 AS (SELECT node, ((1000000000000 * 15) // 100) // n + (85 * s) // 100 AS r
               FROM d3, nn),
        rk AS (SELECT node, r, ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rank
               FROM r3)
        SELECT CAST(rank AS INTEGER) AS rank, node AS word,
               CAST(r AS BIGINT) AS score_fp
        FROM rk WHERE rank <= 20 ORDER BY rank""",

      // Reuses pairsCtes' hashed CTE for the same md5-derived distinct
      // shingle-hash sets; source pairs ordered lexicographically on
      // both engines (plain byte compare on ASCII source ids).
      "q89_source_overlap" -> s"""
        $pairsCtes,
        sg AS (
          SELECT DISTINCT d.source, u.h
          FROM hashed JOIN documents d USING (doc_id), UNNEST(hashed.hs) AS u(h)),
        sz AS (SELECT source, COUNT(*) AS n FROM sg GROUP BY source),
        ov AS (
          SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
          FROM sg a JOIN sg b ON a.h = b.h AND a.source < b.source
          GROUP BY 1, 2)
        SELECT source_a, source_b, CAST(n_common AS BIGINT) AS n_common,
               CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
               ROUND(CAST(n_common AS DOUBLE) / LEAST(za.n, zb.n), 6) AS overlap
        FROM ov JOIN sz za ON ov.source_a = za.source
                JOIN sz zb ON ov.source_b = zb.source
        ORDER BY source_a, source_b""",

      // q81's scoring CTEs verbatim, then the q78/q82 lower-nearest-rank
      // selection at p33/p67 per language over the 6-dp-ROUNDED scores —
      // rank ties are interchangeable (the value at the rank is unique),
      // and the bucket compare runs on rounded values on both engines.
      "q90_surprisal_buckets" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS gram,
                 toks[i] AS w1, toks[i+1] AS w2
          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)),
        c2 AS (SELECT gram, COUNT(*) AS c2 FROM g GROUP BY gram),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM g GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT w2) AS v FROM g),
        sc AS (
          SELECT doc_id, ROUND(AVG(-ln((c2.c2 + 1.0) / (c1.c1 + v.v))), 6) AS avg_nll
          FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v
          GROUP BY doc_id),
        b AS (
          SELECT d.doc_id, d.lang, sc.avg_nll
          FROM documents d LEFT JOIN sc USING (doc_id)),
        r AS (
          SELECT lang, avg_nll,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY avg_nll) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS cnt
          FROM b WHERE avg_nll IS NOT NULL),
        p33 AS (SELECT lang, avg_nll AS p33 FROM r
                WHERE rn = CAST(FLOOR(0.33 * (cnt - 1)) AS BIGINT) + 1),
        p67 AS (SELECT lang, avg_nll AS p67 FROM r
                WHERE rn = CAST(FLOOR(0.67 * (cnt - 1)) AS BIGINT) + 1)
        SELECT b.doc_id, b.lang, b.avg_nll, p33.p33, p67.p67,
               CASE WHEN b.avg_nll IS NULL THEN NULL
                    WHEN b.avg_nll <= p33.p33 THEN 'head'
                    WHEN b.avg_nll <= p67.p67 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM b JOIN p33 USING (lang) JOIN p67 USING (lang)
        ORDER BY doc_id""",

      // Same idf form, same left-associated contribution expression
      // tree, same ×1e9 fixed-point round-then-int64-sum as the Spark
      // twin (HUGEINT sum → double is exact at these magnitudes), same
      // (score desc, doc_id) total order under LIMIT.
      "q93_bm25" -> s"""$bm25Ctes
        SELECT doc_id, dl, n_hit, ROUND(sfp / 1e9, 6) AS score
        FROM sc
        ORDER BY score DESC, doc_id LIMIT 10""",

      // Same p·ln(p/q) tree, ×1e12 fixed-point per-type contributions,
      // int64 sum — order-independent on both engines.
      "q94_source_kl" -> """
        WITH t AS (
          SELECT source,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        u AS (SELECT source, unnest(toks) AS tok FROM t),
        cs AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY source, tok),
        ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM cs GROUP BY source),
        cw AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS c_w FROM cs GROUP BY tok),
        nn AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM cw),
        fp AS (
          SELECT cs.source,
                 CAST(ROUND((CAST(cs.c AS DOUBLE) / ns.n_s)
                   * ln((CAST(cs.c AS DOUBLE) / ns.n_s) / (CAST(cw.c_w AS DOUBLE) / nn.n))
                   * 1e12) AS BIGINT) AS kfp
          FROM cs JOIN ns USING (source) JOIN cw USING (tok) CROSS JOIN nn)
        SELECT source, MAX(ns.n_s) AS n_toks, CAST(COUNT(*) AS BIGINT) AS vocab,
               ROUND(SUM(kfp) / 1e12, 6) AS kl
        FROM fp JOIN ns USING (source) GROUP BY source
        ORDER BY source""",

      // Same −p·ln p tree, ×1e12 fixed-point, 6-dp round before the
      // keep compare.
      "q95_doc_entropy" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        c AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY doc_id, tok),
        n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS types
              FROM c GROUP BY doc_id),
        fp AS (
          SELECT c.doc_id,
                 CAST(ROUND(-(CAST(c.c AS DOUBLE) / n.n) * ln(CAST(c.c AS DOUBLE) / n.n)
                   * 1e12) AS BIGINT) AS hfp
          FROM c JOIN n USING (doc_id))
        SELECT n.doc_id, n.n AS n_toks, n.types AS n_types,
               ROUND(CAST(n.types AS DOUBLE) / n.n, 6) AS ttr,
               ROUND(SUM(hfp) / 1e12, 6) AS entropy,
               ROUND(SUM(hfp) / 1e12, 6) >= 2.5 AS keep
        FROM fp JOIN n USING (doc_id) GROUP BY n.doc_id, n.n, n.types
        ORDER BY n.doc_id""",

      // Reuses pairsCtes' sig/pairs CTEs: the estimate is the fraction
      // of the 8 signature components that agree; jacc is the exact
      // sorted-set Jaccard both engines already compute for q34.
      // abs_err is computed on the UNROUNDED jacc then 6-dp rounded,
      // mirroring the Spark twin.
      "q96_minhash_estimate" -> s"""
        $pairsCtes,
        est AS (
          SELECT p.doc_a, p.doc_b, p.jacc,
                 CAST(len(list_filter(generate_series(1, $NumHashes),
                   j -> ma.mh[j] = mb.mh[j])) AS BIGINT) AS n_match
          FROM pairs p
          JOIN sig ma ON p.doc_a = ma.doc_id
          JOIN sig mb ON p.doc_b = mb.doc_id
          WHERE p.jacc >= $JaccThreshold)
        SELECT doc_a, doc_b, ROUND(jacc, 6) AS jacc, n_match,
               ROUND(n_match / ${NumHashes.toDouble}, 6) AS est_jacc,
               ROUND(abs(n_match / ${NumHashes.toDouble} - jacc), 6) AS abs_err
        FROM est ORDER BY doc_a, doc_b""",

      // Integer bit-length − 1 on both engines (format('{:b}') here,
      // bin() in Spark) — never float log2.
      "q97_length_buckets" -> """
        SELECT lang, CAST(length(format('{:b}', n_chars)) - 1 AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY lang, bucket
        ORDER BY lang, bucket""",

      // Rank ties broken by token on both engines; head_cov is a ratio
      // of exact integer counts, 6-dp rounded.
      "q98_head_coverage" -> """
        WITH t AS (
          SELECT lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        u AS (SELECT lang, unnest(toks) AS tok FROM t),
        c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY lang, tok),
        r AS (SELECT lang, tok, c,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rn
              FROM c),
        n AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY lang)
        SELECT r.lang, MAX(n.n) AS n_toks,
               CAST(SUM(CASE WHEN rn <= 10 THEN c ELSE 0 END) AS BIGINT) AS head_count,
               ROUND(CAST(SUM(CASE WHEN rn <= 10 THEN c ELSE 0 END) AS DOUBLE) / MAX(n.n), 6)
                 AS head_cov
        FROM r JOIN n USING (lang) GROUP BY r.lang
        ORDER BY r.lang""",

      // Same 1e-6 fixed-point √n_l weights (so the weight TOTAL is an
      // exact integer sum, never an order-dependent float sum), the same
      // single double expression tree for the threshold, the same hash32
      // gate.
      "q101_temperature_resample" -> {
        val tempHash = hex32.replace("md5(x)", "md5('temp|' || CAST(doc_id AS VARCHAR))")
        s"""
        WITH pl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l
                    FROM documents GROUP BY lang),
        w AS (SELECT lang, n_l,
                     CAST(ROUND(sqrt(CAST(n_l AS DOUBLE)) * 1000000) AS BIGINT) AS w_fp
              FROM pl),
        tot AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS sw_fp,
                       CAST(SUM(n_l) AS BIGINT) AS n FROM w),
        thr AS (
          SELECT lang, n_l, w_fp,
                 LEAST(CAST(4294967296 AS BIGINT),
                   CAST(ROUND(CAST((n * 3) // 10 AS DOUBLE)
                     * w_fp / sw_fp * 4294967296 / n_l) AS BIGINT)) AS t_l
          FROM w, tot),
        k AS (
          SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN CAST($tempHash AS BIGINT) < t.t_l
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
          FROM documents d JOIN thr t USING (lang) GROUP BY d.lang)
        SELECT k.lang, k.n_docs, ROUND(t.w_fp / 1e6, 6) AS w_l, t.t_l,
               k.n_kept,
               ROUND(CAST(k.n_kept AS DOUBLE) / k.n_docs, 6) AS keep_rate
        FROM k JOIN thr t USING (lang)
        ORDER BY k.lang"""
      },

      // Same 48-bit md5-prefix token hashes, the same 48 ±1 bit-counter
      // folds (list_sum per bit — the unfused image of graft_simhash48,
      // integer-exact), the same 4×12-bit pigeonhole bands and xor/
      // bit_count confirm.
      "q102_simhash_neardup" -> s"""
        WITH $simhashCtes
        SELECT doc_a, doc_b, sim_a, sim_b,
               CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
        FROM sxcand
        WHERE bit_count(xor(sim_a, sim_b)) <= 3
        ORDER BY doc_a, doc_b""",

      // The q34 pair relation (pairsCtes, jacc >= threshold like q96's
      // oracle) joined against the same hash32 90/5/5 split gate; leak
      // when exactly one endpoint is in train.
      "q103_split_leakage" -> {
        val splitHash = hex32.replace("md5(x)", "md5('split|' || CAST(doc_id AS VARCHAR))")
        s"""
        $pairsCtes,
        sp AS (
          SELECT doc_id,
                 CASE WHEN CAST($splitHash AS BIGINT) % 100 < 90 THEN 'train'
                      WHEN CAST($splitHash AS BIGINT) % 100 < 95 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents)
        SELECT p.doc_a, p.doc_b, ROUND(p.jacc, 6) AS jacc,
               a.split AS split_a, b.split AS split_b,
               (a.split = 'train') <> (b.split = 'train') AS leak
        FROM pairs p
        JOIN sp a ON p.doc_a = a.doc_id
        JOIN sp b ON p.doc_b = b.doc_id
        WHERE p.jacc >= $JaccThreshold
        ORDER BY p.doc_a, p.doc_b"""
      },

      // Same 1e-6 fixed-point Jaccard weights summed exactly, rounded
      // once at the end; degree/max are order-free already.
      "q104_dup_degree" -> s"""
        $pairsCtes,
        conf AS (
          SELECT doc_a, doc_b,
                 CAST(ROUND(jacc * 1000000) AS BIGINT) AS jfp
          FROM pairs WHERE jacc >= $JaccThreshold),
        e AS (
          SELECT doc_a AS doc_id, jfp FROM conf
          UNION ALL SELECT doc_b, jfp FROM conf)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree,
               ROUND(SUM(jfp) / 1e6, 6) AS wdegree,
               ROUND(MAX(jfp) / 1e6, 6) AS max_jacc
        FROM e GROUP BY doc_id
        ORDER BY doc_id""",

      // Same fixed-point per-contribution rounding, same expression
      // trees over exact integer features.
      "q105_quality_score" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT doc_id, lang, n_toks,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f)
        SELECT doc_id, lang, n_toks,
               CAST(ROUND(sfp / 1000.0) AS BIGINT) / 1e6 AS score,
               sfp > 0 AS keep
        FROM s ORDER BY doc_id""",

      // Same integer-exact bucketing, same cumulative-down-the-axis
      // window over the bucket aggregate.
      "q106_score_roc" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT doc_id, lang,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f),
        bk AS (
          SELECT CAST(FLOOR(sfp / 2e8) AS INTEGER) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
          FROM s GROUP BY 1),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt FROM bk),
        cum AS (
          SELECT bucket, n, pos,
                 CAST(SUM(pos) OVER (ORDER BY bucket DESC) AS BIGINT) AS tp,
                 CAST(SUM(n) OVER (ORDER BY bucket DESC) AS BIGINT) AS pp
          FROM bk)
        SELECT bucket, CAST(ROUND(bucket * 0.2, 1) AS DOUBLE) AS thr, n, pos, tp,
               pp - tp AS fp,
               ROUND(CAST(tp AS DOUBLE) / pt, 6) AS tpr,
               ROUND(CAST(pp - tp AS DOUBLE) / (nt - pt), 6) AS fpr
        FROM cum, tot
        ORDER BY bucket DESC""",

      // Same k=5 md5 probe hashes into the same derived m, same
      // bit-relation join, same contract arithmetic (rounded on both
      // sides before the bound comparison).
      "q109_bloom_audit" -> {
        val bloomHash = hex32.replace("md5(x)",
          "md5('bloom' || CAST(i AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR))")
        s"""
        WITH p AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_ref,
                 (CAST(1 AS BIGINT) << length(bin(8 * COUNT(*) - 1))) AS m
          FROM documents WHERE doc_id % 2 = 0),
        pr AS (
          SELECT doc_id, lang, doc_id % 2 = 0 AS is_ref,
                 CAST($bloomHash AS BIGINT) % p.m AS pos
          FROM documents, generate_series(0, 4) g(i), p),
        bits AS (SELECT DISTINCT pos FROM pr WHERE is_ref),
        mem AS (
          SELECT pr.doc_id, pr.lang, pr.is_ref,
                 MIN(CASE WHEN bits.pos IS NULL THEN 0 ELSE 1 END) = 1 AS member
          FROM pr LEFT JOIN bits ON pr.pos = bits.pos
          GROUP BY 1, 2, 3),
        agg AS (
          SELECT lang,
                 CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_l,
                 CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
                 CAST(SUM(CASE WHEN is_ref AND NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_fn,
                 CAST(SUM(CASE WHEN NOT is_ref AND member THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
          FROM mem GROUP BY 1)
        SELECT a.lang, a.n_ref_l, a.n_test, a.n_fn, a.n_fp, p.m,
               ROUND(CAST(a.n_fp AS DOUBLE) / a.n_test, 6) AS fpr_obs,
               ROUND(POWER(1.0 - EXP(-5.0 * p.n_ref / p.m), 5), 6) AS fpr_exp,
               a.n_fn = 0 AND
                 ROUND(CAST(a.n_fp AS DOUBLE) / a.n_test, 6)
                   <= 3.0 * ROUND(POWER(1.0 - EXP(-5.0 * p.n_ref / p.m), 5), 6)
                 AS within_bound
        FROM agg a, p
        ORDER BY a.lang"""
      },

      // pairsCtes (MinHash side) and simhashCtes (SimHash side) composed
      // in one WITH; same 6-dp jacc, same hamming, same full-outer pair
      // alignment.
      "q111_dedup_agreement" -> s"""
        $pairsCtes,
        $simhashCtes,
        shp AS (
          SELECT doc_a, doc_b,
                 CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
          FROM sxcand WHERE bit_count(xor(sim_a, sim_b)) <= 3),
        mhp AS (
          SELECT doc_a, doc_b, ROUND(jacc, 6) AS jacc
          FROM pairs WHERE jacc >= $JaccThreshold)
        SELECT COALESCE(m.doc_a, s.doc_a) AS doc_a,
               COALESCE(m.doc_b, s.doc_b) AS doc_b,
               m.doc_a IS NOT NULL AS in_minhash,
               s.doc_a IS NOT NULL AS in_simhash,
               m.jacc, s.hamming
        FROM mhp m FULL OUTER JOIN shp s
          ON m.doc_a = s.doc_a AND m.doc_b = s.doc_b
        ORDER BY doc_a, doc_b""",

      // Same distinct-(doc, tok) df relation, same (df DESC, tok ASC)
      // top-5 tie-break, same left-join density arithmetic.
      "q114_stopword_induction" -> """
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
          FROM documents),
        df AS (
          SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM tok GROUP BY 1),
        top AS (SELECT tok FROM df ORDER BY df DESC, tok LIMIT 5)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(SUM(CASE WHEN tok IN (SELECT tok FROM top) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
               ROUND(CAST(SUM(CASE WHEN tok IN (SELECT tok FROM top) THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS stop_density
        FROM tok GROUP BY doc_id ORDER BY doc_id""",

      // Same sfp fixed-point score and 2e8-wide buckets as q105/q106,
      // same NULL-guarded (p−q)·ln(p/q) term.
      "q117_score_psi" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT doc_id,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f),
        bk AS (
          SELECT CAST(FLOOR(sfp / 2e8) AS INTEGER) AS bucket,
                 CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
                 CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_odd
          FROM s GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n_even) AS BIGINT) AS t_even,
                 CAST(SUM(n_odd) AS BIGINT) AS t_odd
          FROM bk),
        pq AS (
          SELECT bucket, n_even, n_odd,
                 CAST(n_even AS DOUBLE) / t_even AS p,
                 CAST(n_odd AS DOUBLE) / t_odd AS q
          FROM bk, tot)
        SELECT bucket, n_even, n_odd,
               ROUND(p, 6) AS p_even, ROUND(q, 6) AS p_odd,
               CASE WHEN n_even > 0 AND n_odd > 0
                    THEN ROUND((p - q) * ln(p / q), 6) END AS psi_term
        FROM pq ORDER BY bucket""",

      // Same 3-token boundary keys (1-based inclusive slices), same
      // suffix→prefix equi-join.
      "q119_split_continuity" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 6),
        suf AS (
          SELECT doc_id AS doc_a,
                 array_to_string(toks[len(toks)-2:len(toks)], ' ') AS key
          FROM f),
        pre AS (
          SELECT doc_id AS doc_b, array_to_string(toks[1:3], ' ') AS key
          FROM f),
        admitted AS (
          SELECT s.key FROM
            (SELECT key, COUNT(*) AS ns FROM suf GROUP BY 1) s
            JOIN (SELECT key, COUNT(*) AS np FROM pre GROUP BY 1) p
              USING (key)
          WHERE ns <= 1000 AND np <= 1000)
        SELECT doc_a, doc_b, key AS boundary_gram
        FROM suf JOIN admitted USING (key) JOIN pre USING (key)
        WHERE doc_a <> doc_b
        ORDER BY doc_a, doc_b""",

      // Same (n_chars, doc_id) deterministic rank, same NULL rule for
      // single-doc languages, decile from the ROUNDED quantile.
      "q120_quantile_normalize" -> """
        WITH r AS (
          SELECT doc_id, lang, n_chars,
                 CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
          FROM documents),
        q AS (
          SELECT doc_id, lang, n_chars, rn, n_lang,
                 CASE WHEN n_lang > 1
                      THEN ROUND(CAST(rn - 1 AS DOUBLE) / (n_lang - 1), 6) END AS q
          FROM r)
        SELECT doc_id, lang, n_chars, rn, n_lang, q,
               CASE WHEN q IS NOT NULL
                    THEN CAST(LEAST(9, FLOOR(q * 10)) AS INTEGER) END AS decile
        FROM q ORDER BY doc_id""",

      // Same sfp fixed-point ordering key, same exact integer budget
      // (3·Σtoks // 10), same cumulative frame over a unique ordering.
      "q121_token_budget" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT doc_id, lang, n_toks,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f),
        tot AS (
          SELECT lang, CAST(SUM(n_toks) AS BIGINT) AS lang_toks,
                 CAST((3 * SUM(n_toks)) // 10 AS BIGINT) AS budget
          FROM s GROUP BY 1),
        c AS (
          SELECT s.doc_id, s.lang, s.n_toks,
                 CAST(SUM(s.n_toks) OVER (PARTITION BY s.lang
                   ORDER BY s.sfp DESC, s.doc_id) AS BIGINT) AS cum_toks,
                 tot.budget
          FROM s JOIN tot USING (lang))
        SELECT doc_id, lang, n_toks, cum_toks, budget,
               cum_toks <= budget AS kept
        FROM c ORDER BY doc_id""",

      // Same deterministic next-10 pair sample over the SAME shingle/
      // signature/band CTEs as q34; identical Jaccard rationals, same
      // double bucket floor, same theoretical curve arithmetic.
      "q122_minhash_scurve" -> s"""$pairsCtes,
        pr AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM documents a JOIN documents b
            ON b.doc_id - a.doc_id BETWEEN 1 AND 10),
        jx AS (
          SELECT p.doc_a, p.doc_b,
                 CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.hs, sb.hs))) AS jacc
          FROM pr p JOIN hashed sa ON sa.doc_id = p.doc_a
                    JOIN hashed sb ON sb.doc_id = p.doc_b),
        det AS (
          SELECT DISTINCT p.doc_a, p.doc_b
          FROM pr p JOIN bands x ON x.doc_id = p.doc_a
                    JOIN bands y ON y.doc_id = p.doc_b
                      AND y.b = x.b AND y.key = x.key),
        bk AS (
          SELECT LEAST(9, CAST(FLOOR(jacc * 10) AS BIGINT)) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN d.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_detected
          FROM jx LEFT JOIN det d USING (doc_a, doc_b)
          GROUP BY 1)
        SELECT CAST(bucket AS INTEGER) AS bucket, n_pairs, n_detected,
               ROUND(CAST(n_detected AS DOUBLE) / n_pairs, 6) AS det_rate,
               ROUND((bucket + 0.5) / 10.0, 2) AS s_mid,
               ROUND(1 - POWER(1 - POWER((bucket + 0.5) / 10.0, 2), 4), 6) AS p_theory
        FROM bk ORDER BY bucket""",

      // Same per-language stopword-hit counts and first-match-wins
      // argmax as q32's oracle, collapsed to the confusion matrix.
      "q123_lang_confusion" -> s"""
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        h AS (
          SELECT doc_id, lang,
                 ${langs.map(l => s"${hits(l)} AS h_$l").mkString(",\n                 ")}
          FROM t),
        p AS (
          SELECT doc_id, lang,
                 CASE ${langs.map(l => s"WHEN h_$l = greatest(${langs.map(x => s"h_$x").mkString(",")}) THEN '$l'").mkString(" ")}
                      ELSE 'und' END AS pred_lang
          FROM h),
        cells AS (
          SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
          FROM p GROUP BY 1, 2),
        w AS (
          SELECT lang, pred_lang, n,
                 CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
          FROM cells)
        SELECT lang, pred_lang, n, n_lang,
               ROUND(CAST(n AS DOUBLE) / n_lang, 6) AS frac,
               lang = pred_lang AS agree
        FROM w ORDER BY lang, pred_lang""",

      // Same bigram-type collapse, same D = 0.75 discount tree with the
      // identical double evaluation order, same ×1e9 fixed-point
      // selection key.
      "q124_kneser_ney" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT array_to_string(toks[i:i+1], ' ') AS gram,
                 toks[i] AS w1, toks[i+1] AS w2
          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
          WHERE len(toks) >= 2),
        c12 AS (SELECT gram, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                FROM g GROUP BY gram, w1, w2),
        c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                      CAST(COUNT(*) AS BIGINT) AS fanout
               FROM c12 GROUP BY w1),
        ct AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont FROM c12 GROUP BY w2),
        tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM c12),
        p AS (
          SELECT gram, c12.c12, c1.c1, c1.fanout, ct.cont,
                 CAST(ROUND((GREATEST(CAST(c12.c12 AS DOUBLE) - 0.75, CAST(0 AS DOUBLE)) / c1.c1
                   + 0.75 * (CAST(c1.fanout AS DOUBLE) / c1.c1) * (CAST(ct.cont AS DOUBLE) / tt.nt))
                   * 1e9) AS BIGINT) AS p_fp
          FROM c12 JOIN c1 USING (w1) JOIN ct USING (w2) CROSS JOIN tt)
        SELECT gram, c12, c1, fanout, cont, ROUND(p_fp / 1e9, 6) AS p_kn
        FROM p ORDER BY p_fp DESC, gram LIMIT 20""",

      // Same ×1e9 per-doc log points, exact HUGEINT moment sums (the
      // decimal(38,0) twin), identical final double expression order.
      "q125_heaps_fit" -> """
        WITH t AS (
          SELECT source,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        p AS (
          SELECT source,
                 CAST(ROUND(ln(CAST(len(toks) AS DOUBLE)) * 1e9) AS BIGINT) AS x,
                 CAST(ROUND(ln(CAST(len(list_distinct(toks)) AS DOUBLE)) * 1e9) AS BIGINT) AS y
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM p GROUP BY source),
        m AS (
          SELECT source, n_docs, sx, sy,
                 CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                 CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
                 CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
          FROM s)
        SELECT source, n_docs,
               CASE WHEN den > 0 THEN ROUND(num / den, 6) END AS beta,
               CASE WHEN den > 0 THEN ROUND((CAST(sy AS DOUBLE) - num / den
                 * CAST(sx AS DOUBLE)) / n_docs / 1e9, 6) END AS ln_k,
               CASE WHEN den > 0 AND deny > 0
                    THEN ROUND(num * num / (den * deny), 6) END AS r2
        FROM m ORDER BY source""",

      // Same (lang, tok) collapse, same unique-ordered rank/cumsum
      // window, same exact 20·cum ≥ 19·total integer threshold.
      "q126_vocab_coverage" -> """
        WITH u AS (
          SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\s+'),
                   x -> x <> '')) AS tok
          FROM documents),
        c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY lang, tok),
        tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t,
                       CAST(COUNT(*) AS BIGINT) AS vocab
                FROM c GROUP BY lang),
        r AS (
          SELECT lang, c,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
                 CAST(SUM(c) OVER w AS BIGINT) AS cum
          FROM c WINDOW w AS (PARTITION BY lang ORDER BY c DESC, tok)),
        hit AS (
          SELECT r.lang, tot.t, tot.vocab,
                 MIN(r.rk) AS k95, MIN_BY(r.cum, r.rk) AS cum95
          FROM r JOIN tot USING (lang)
          WHERE r.cum * 20 >= tot.t * 19
          GROUP BY r.lang, tot.t, tot.vocab)
        SELECT lang, vocab, t AS total_toks, k95,
               ROUND(CAST(cum95 AS DOUBLE) / t, 6) AS cov95
        FROM hit ORDER BY lang""",

      // Same 3·n scored stream (tf = 0 rows included), same μ = 100
      // Dirichlet tree with identical double order, same exact int64
      // selection key.
      "q127_query_likelihood" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t
              WHERE len(toks) > 0),
        qt AS (SELECT unnest(['spark', 'join', 'stream']) AS tok),
        tf AS (
          SELECT d.doc_id, q.tok,
                 CAST(len(list_filter(d.toks, x -> x = q.tok)) AS BIGINT) AS tf
          FROM d CROSS JOIN qt q
          WHERE len(list_filter(d.toks, x -> x = q.tok)) > 0),
        cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY tok),
        ctot AS (SELECT CAST(SUM(dl) AS BIGINT) AS c FROM d),
        fp AS (
          SELECT d.doc_id, d.dl,
                 CAST(ROUND(ln((COALESCE(tf.tf, CAST(0 AS BIGINT))
                   + 100.0 * (CAST(cf.cf AS DOUBLE) / ctot.c))
                   / (CAST(d.dl AS DOUBLE) + 100.0)) * 1e9) AS BIGINT) AS contrib_fp
          FROM d CROSS JOIN qt q
          JOIN cf ON cf.tok = q.tok
          LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.tok = q.tok
          CROSS JOIN ctot),
        s AS (
          SELECT doc_id, dl, CAST(SUM(contrib_fp) AS BIGINT) AS sfp
          FROM fp GROUP BY doc_id, dl)
        SELECT doc_id, dl, ROUND(sfp / 1e9, 6) AS score
        FROM s ORDER BY sfp DESC, doc_id LIMIT 10""",

      // Same exact (sfp, doc_id) / (tf_total, doc_id) ranking keys over
      // the shared BM25 CTEs, same per-position linear ×1e9 gains, same
      // cumulative integer sums and fp-ratio nDCG.
      "q128_ndcg" -> s"""$bm25Ctes,
        bm AS (SELECT doc_id, tf_total AS rel,
                      ROW_NUMBER() OVER (ORDER BY sfp DESC, doc_id) AS rk
               FROM sc),
        bmg AS (SELECT rk,
                       CAST(ROUND(CAST(rel AS DOUBLE)
                         / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0))
                         * 1e9) AS BIGINT) AS gfp
                FROM bm WHERE rk <= 10),
        id AS (SELECT doc_id, tf_total AS rel,
                      ROW_NUMBER() OVER (ORDER BY tf_total DESC, doc_id) AS rk
               FROM sc),
        idg AS (SELECT rk,
                       CAST(ROUND(CAST(rel AS DOUBLE)
                         / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0))
                         * 1e9) AS BIGINT) AS gfp
                FROM id WHERE rk <= 10),
        ks AS (SELECT unnest(generate_series(1, 10)) AS k),
        dcg AS (SELECT ks.k, CAST(SUM(bmg.gfp) AS BIGINT) AS dfp
                FROM ks JOIN bmg ON bmg.rk <= ks.k GROUP BY ks.k),
        icg AS (SELECT ks.k, CAST(SUM(idg.gfp) AS BIGINT) AS ifp
                FROM ks JOIN idg ON idg.rk <= ks.k GROUP BY ks.k)
        SELECT k, ROUND(dfp / 1e9, 6) AS dcg, ROUND(ifp / 1e9, 6) AS idcg,
               ROUND(CAST(dfp AS DOUBLE) / ifp, 6) AS ndcg
        FROM dcg JOIN icg USING (k)
        ORDER BY k""",

      // Same exact-integer rule tests (2n <= sum_len, 5·max_rep <= n),
      // same own-language stopword inventories, same per-lang counts.
      "q131_rule_cascade" -> s"""
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT lang,
                 CAST(len(toks) AS BIGINT) AS n,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len,
                 CAST(list_max(list_transform(list_distinct(toks),
                   x -> len(list_filter(toks, y -> y = x)))) AS BIGINT) AS max_rep,
                 CASE ${langs.map(l => s"WHEN lang = '$l' THEN ${hits(l)}").mkString(" ")} END AS stop_hits
          FROM t WHERE len(toks) > 0),
        r AS (
          SELECT lang,
                 (n BETWEEN 5 AND 1000) AS p_words,
                 (2 * n <= sum_len AND sum_len <= 12 * n) AS p_avglen,
                 (stop_hits >= 1) AS p_stop,
                 (5 * max_rep <= n) AS p_rep
          FROM f)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN NOT p_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
               CAST(SUM(CASE WHEN NOT p_avglen THEN 1 ELSE 0 END) AS BIGINT) AS fail_avglen,
               CAST(SUM(CASE WHEN NOT p_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
               CAST(SUM(CASE WHEN NOT p_rep THEN 1 ELSE 0 END) AS BIGINT) AS fail_rep,
               CAST(SUM(CASE WHEN p_words AND p_avglen AND p_stop AND p_rep
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM r GROUP BY 1 ORDER BY lang""",

      // q81's LM CTEs at per-gram granularity, the same ×1e9 fixed-point
      // before selection, the same unique (nll_fp, position) rank order,
      // the same exact-int k and sums.
      "q132_mink_surprisal" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, i, array_to_string(toks[i:i+1], ' ') AS gram,
                 toks[i] AS w1, toks[i+1] AS w2
          FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
          WHERE len(toks) >= 2),
        c2 AS (SELECT gram, COUNT(*) AS c2 FROM g GROUP BY 1),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM g GROUP BY 1),
        v AS (SELECT COUNT(DISTINCT w2) AS v FROM g),
        sc AS (
          SELECT doc_id, i,
                 CAST(ROUND(-ln((c2.c2 + 1.0) / (c1.c1 + v.v)) * 1e9) AS BIGINT) AS nll_fp
          FROM g JOIN c2 USING (gram) JOIN c1 USING (w1) CROSS JOIN v),
        r AS (
          SELECT doc_id, nll_fp,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY nll_fp, i) AS rn
          FROM sc),
        tot AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(nll_fp) AS BIGINT) AS sum_fp,
                 GREATEST(1, CAST(COUNT(*) // 5 AS BIGINT)) AS k
          FROM sc GROUP BY 1),
        sel AS (
          SELECT r.doc_id, CAST(SUM(r.nll_fp) AS BIGINT) AS mink_fp
          FROM r JOIN tot USING (doc_id) WHERE r.rn <= tot.k GROUP BY 1)
        SELECT tot.doc_id, tot.n_bigrams, tot.k,
               ROUND(mink_fp / k / 1e9, 6) AS mink_nll,
               ROUND(sum_fp / n_bigrams / 1e9, 6) AS avg_nll,
               ROUND(mink_fp / k / 1e9, 6) <= 3.0 AS suspect
        FROM sel JOIN tot USING (doc_id)
        ORDER BY doc_id""",

      // Same salted md5-prefix row hashes, same vocab-bounded weighted
      // build, same min-over-rows estimate and exact-int Markov bound.
      "q133_cms_audit" -> s"""
        WITH t AS (
          SELECT list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        ts AS (SELECT unnest(toks) AS tok FROM t),
        e AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact FROM ts GROUP BY 1),
        n AS (SELECT CAST(SUM(exact) AS BIGINT) AS n_total FROM e),
        tb AS (
          SELECT tok, exact, r,
                 CAST((${hex32.replace("md5(x)",
                   "md5('cms' || CAST(r AS VARCHAR) || '|' || tok)")}) % 1024 AS BIGINT) AS bucket
          FROM e, generate_series(0, 3) g(r)),
        sk AS (SELECT r, bucket, CAST(SUM(exact) AS BIGINT) AS cell
               FROM tb GROUP BY 1, 2),
        est AS (
          SELECT tb.tok, tb.exact, CAST(MIN(sk.cell) AS BIGINT) AS est
          FROM tb JOIN sk USING (r, bucket) GROUP BY 1, 2),
        top AS (SELECT * FROM est ORDER BY exact DESC, tok LIMIT 50)
        SELECT tok, exact, est,
               CAST(est - exact AS BIGINT) AS err,
               (est - exact) * 512 <= n_total AS within_bound, n_total
        FROM top CROSS JOIN n
        ORDER BY exact DESC, tok""",

      // Same (lang, source, ⌊len/100⌋) blocks, same length prefilter;
      // DuckDB's exact levenshtein agrees with Spark's banded form on
      // every pair the <= 20 filter admits.
      "q134_editdist_join" -> """
        WITH t AS (
          SELECT doc_id, lang, source, text,
                 CAST(length(text) AS BIGINT) AS len,
                 CAST(length(text) // 100 AS BIGINT) AS blk
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
               a.len AS la, b.len AS lb,
               CAST(levenshtein(a.text, b.text) AS INTEGER) AS led
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source AND a.blk = b.blk
         AND a.doc_id < b.doc_id AND abs(a.len - b.len) <= 20
        WHERE levenshtein(a.text, b.text) <= 20
        ORDER BY doc_a, doc_b""",

      // Same exact integer sums; ratios divided once from the sums.
      "q135_tokenizer_fertility" -> """
        WITH t AS (
          SELECT lang, source, text,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT lang, source,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_sub,
                 CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars_ns
          FROM t WHERE len(toks) > 0)
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS tot_toks,
               ROUND(SUM(n_chars_ns) / SUM(n_toks), 6) AS chars_per_tok,
               ROUND(SUM(n_sub) / SUM(n_toks), 6) AS subs_per_tok,
               ROUND(SUM(n_toks) / COUNT(*), 6) AS toks_per_doc
        FROM f GROUP BY 1, 2
        ORDER BY lang, source""",

      // Same confirmed-pair edges, same id-ordered two-step triangle
      // join, same exact wedge arithmetic.
      "q136_dup_triangles" -> s"""
        $pairsCtes,
        e AS (SELECT doc_a, doc_b FROM pairs WHERE jacc >= $JaccThreshold),
        deg AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT doc_a AS v FROM e UNION ALL SELECT doc_b AS v FROM e)
          GROUP BY 1),
        da AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                      CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
               FROM deg),
        ea AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
        tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
               FROM e e1 JOIN e e2 ON e1.doc_b = e2.doc_a
                         JOIN e e3 ON e1.doc_a = e3.doc_a
                                  AND e2.doc_b = e3.doc_b)
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges > 0
                    THEN ROUND(3.0 * n_triangles / n_wedges, 6) END AS global_cc
        FROM da CROSS JOIN ea CROSS JOIN tr""",

      // Same (source, gram) exact counts; Simpson/top-share/TTR divide
      // identical exact sums in identical double trees.
      "q137_ngram_diversity" -> """
        WITH t AS (
          SELECT source,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        g AS (
          SELECT source, array_to_string(toks[i:i+2], ' ') AS gram
          FROM t, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
          WHERE len(toks) >= 3),
        c AS (SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS c
              FROM g GROUP BY 1, 2),
        a AS (
          SELECT source,
                 CAST(SUM(c) AS BIGINT) AS n_grams,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs,
                 CAST(MAX(c) AS BIGINT) AS max_c
          FROM c GROUP BY 1)
        SELECT source, n_grams, n_types,
               CASE WHEN n_grams > 1
                    THEN ROUND(CAST(rep_pairs AS DOUBLE)
                      / (CAST(n_grams AS DOUBLE) * (CAST(n_grams AS DOUBLE) - 1)), 6) END AS simpson,
               ROUND(CAST(max_c AS DOUBLE) / n_grams, 6) AS top_share,
               ROUND(CAST(n_types AS DOUBLE) / n_grams, 6) AS ttr
        FROM a ORDER BY source""",

      // Same (x desc, doc_id) rank, same ×1e9 fixed-point logs, same
      // exact Σ − k·ln(x_k) integer subtraction divided once.
      "q138_hill_tail" -> """
        WITH t AS (
          SELECT source, CAST(n_chars AS BIGINT) AS x, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rn,
                 CAST(ROUND(ln(CAST(n_chars AS DOUBLE)) * 1e9) AS BIGINT) AS lfp
          FROM documents),
        tot AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                 LEAST(50, CAST(COUNT(*) // 10 AS BIGINT)) AS k
          FROM t GROUP BY 1),
        xk AS (
          SELECT t.source, t.lfp AS lk
          FROM t JOIN tot USING (source) WHERE t.rn = tot.k),
        s AS (
          SELECT t.source, tot.n, tot.k, CAST(SUM(t.lfp) AS BIGINT) AS sl
          FROM t JOIN tot USING (source) WHERE t.rn <= tot.k
          GROUP BY 1, 2, 3)
        SELECT s.source, s.n, s.k,
               CASE WHEN s.k >= 5 AND s.sl - s.k * xk.lk > 0
                    THEN ROUND(CAST(s.k AS DOUBLE) * 1e9 / (s.sl - s.k * xk.lk), 6) END AS alpha
        FROM s JOIN xk USING (source)
        ORDER BY source""",

      // Same even/odd split, same top-20 (c DESC, tok) vocab frame, same
      // anti-join OOV mass in exact integers.
      "q139_oov_projection" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        tk AS (SELECT doc_id, lang, unnest(toks) AS tok FROM t),
        trainc AS (
          SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM tk WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        vocab AS (
          SELECT lang, tok FROM (
            SELECT lang, tok,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rn
            FROM trainc)
          WHERE rn <= 20),
        evalc AS (
          SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM tk WHERE doc_id % 2 = 1 GROUP BY 1, 2),
        oov AS (
          SELECT e.lang, CAST(SUM(e.c) AS BIGINT) AS oov_tokens,
                 CAST(COUNT(*) AS BIGINT) AS oov_types
          FROM evalc e ANTI JOIN vocab v ON v.lang = e.lang AND v.tok = e.tok
          GROUP BY 1),
        tote AS (
          SELECT lang, CAST(SUM(c) AS BIGINT) AS eval_tokens,
                 CAST(COUNT(*) AS BIGINT) AS eval_types
          FROM evalc GROUP BY 1)
        SELECT tote.lang, tote.eval_tokens, tote.eval_types,
               COALESCE(oov.oov_tokens, 0) AS oov_tokens,
               COALESCE(oov.oov_types, 0) AS oov_types,
               ROUND(COALESCE(oov.oov_tokens, 0) / tote.eval_tokens, 6) AS oov_rate
        FROM tote LEFT JOIN oov USING (lang)
        ORDER BY lang""",

      // Same packed-trigram sets as q37, same (lang, lb) blocks, same
      // (n_chars, doc_id) rank order and 3-successor neighborhood.
      "q142_sorted_neighborhood" -> """
        WITH g AS (
          SELECT doc_id, lang, n_chars,
                 CAST(floor(n_chars / 100) AS BIGINT) AS lb,
                 list_distinct(list_transform(
                   list_transform(
                     generate_series(1, greatest(length(text) - 2, 1)),
                     i -> substr(text, i, 3)),
                   x -> CAST(ascii(substr(x, 1, 1)) * 65536
                           + ascii(substr(x, 2, 1)) * 256
                           + ascii(substr(x, 3, 1)) AS BIGINT))) AS gr
          FROM documents),
        r AS (
          SELECT doc_id, lang, lb, gr,
                 ROW_NUMBER() OVER (PARTITION BY lang, lb
                   ORDER BY n_chars, doc_id) AS rn
          FROM g),
        px AS (
          SELECT lang, lb, rn + j AS rnb, doc_id AS ida, gr AS ga
          FROM r, generate_series(1, 3) t(j)),
        pr AS (
          SELECT p.ida, b.doc_id AS idb,
                 CAST(len(list_intersect(p.ga, b.gr)) AS DOUBLE)
                   / (len(p.ga) + len(b.gr) - len(list_intersect(p.ga, b.gr))) AS jacc
          FROM px p JOIN r b
            ON b.lang = p.lang AND b.lb = p.lb AND b.rn = p.rnb)
        SELECT LEAST(ida, idb) AS doc_a, GREATEST(ida, idb) AS doc_b,
               ROUND(jacc, 6) AS jacc
        FROM pr WHERE jacc >= 0.5
        ORDER BY doc_a, doc_b""",

      // Same distinct 8-gram sets hashed through the same md5 prefix
      // arithmetic, same df >= 2 rule, exact int counts.
      "q144_gram_dup_fraction" -> s"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(toks) - 7),
            i -> array_to_string(toks[i:i+7], ' '))) AS grams
          FROM f),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(grams, x -> CAST($hex32 AS BIGINT))) AS gram
          FROM sh),
        df AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY 1)
        SELECT g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               ROUND(CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_frac
        FROM g JOIN df USING (gram)
        GROUP BY 1
        ORDER BY doc_id""",

      // q59's recursive-CTE components, histogrammed.
      "q145_cluster_sizes" -> s"""
        ${pairsCtes.replaceFirst("(?i)WITH", "WITH RECURSIVE")},
        e AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs WHERE jacc >= $JaccThreshold
          UNION ALL
          SELECT doc_b AS u, doc_a AS v FROM pairs WHERE jacc >= $JaccThreshold),
        r(u, v) AS (
          SELECT u, v FROM e
          UNION
          SELECT r.u, e2.v FROM r JOIN e e2 ON r.v = e2.u),
        comp AS (
          SELECT u AS doc_id, LEAST(u, MIN(v)) AS component FROM r GROUP BY u),
        sizes AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM comp GROUP BY component)
        SELECT n_members AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(n_members * COUNT(*) AS BIGINT) AS docs_covered
        FROM sizes
        GROUP BY n_members
        ORDER BY cluster_size""",

      // q144's hashed gram relation, topped by (df DESC, hash) with the
      // earliest carrier; corpus size as the share denominator.
      "q146_boilerplate_origin" -> s"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, len(toks) - 7),
            i -> array_to_string(toks[i:i+7], ' '))) AS grams
          FROM f),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(grams, x -> CAST($hex32 AS BIGINT))) AS h
          FROM sh),
        df AS (
          SELECT h, CAST(COUNT(*) AS BIGINT) AS df,
                 CAST(MIN(doc_id) AS BIGINT) AS origin_doc
          FROM g GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM f),
        top AS (
          SELECT h, df, origin_doc FROM df WHERE df >= 2
          ORDER BY df DESC, h LIMIT 10)
        SELECT h AS gram_h, df, origin_doc,
               ROUND(df / n_docs, 6) AS doc_share, n_docs
        FROM top CROSS JOIN n
        ORDER BY df DESC, gram_h""",

      // q105's score CTEs + q120's exact rank-quantile decile, grouped.
      "q148_score_length_bias" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT doc_id, lang, n_toks,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f),
        r AS (
          SELECT lang, sfp,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_toks, doc_id) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
          FROM s),
        dec AS (
          SELECT lang, sfp,
                 CAST(LEAST(9, FLOOR(ROUND(CAST(rn - 1 AS DOUBLE) / (n_lang - 1), 6) * 10)) AS INTEGER) AS decile
          FROM r WHERE n_lang > 1)
        SELECT lang, decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(CAST(SUM(sfp) AS DOUBLE) / COUNT(*) / 1e9, 6) AS mean_score,
               ROUND(SUM(CASE WHEN sfp > 0 THEN 1 ELSE 0 END) / COUNT(*), 6) AS keep_rate
        FROM dec GROUP BY 1, 2
        ORDER BY lang, decile""",

      // q149's posting-join twin: identical tf saturation, df pruning,
      // 1e4 fixed-point weights, top-8 per doc, exact int dot/norms.
      "q149_sparse_cosine" -> """
        WITH t AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
        df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        w AS (
          SELECT tf.doc_id, tf.term,
                 CAST(ROUND(LEAST(tf.cnt, 1000) * ln(CAST(n.n AS DOUBLE) / df.df) * 10000) AS BIGINT) AS wfp
          FROM tf JOIN df USING (term) CROSS JOIN n
          WHERE df.df <= 1000 AND df.df < n.n),
        top AS (
          SELECT doc_id, term, wfp FROM (
            SELECT doc_id, term, wfp,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wfp DESC, term) AS rn
            FROM w WHERE wfp > 0) WHERE rn <= 8),
        nrm AS (SELECT doc_id, CAST(SUM(wfp * wfp) AS BIGINT) AS nrm FROM top GROUP BY 1),
        p AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared,
                 CAST(SUM(a.wfp * b.wfp) AS BIGINT) AS dot
          FROM top a JOIN top b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        c AS (
          SELECT doc_a, doc_b, n_shared,
                 ROUND(CAST(dot AS DOUBLE) /
                       sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)), 6) AS cosine
          FROM p JOIN nrm na ON p.doc_a = na.doc_id
                 JOIN nrm nb ON p.doc_b = nb.doc_id)
        SELECT doc_a, doc_b, n_shared, cosine FROM c
        WHERE cosine >= 0.6
        ORDER BY doc_a, doc_b""",

      // q151's twin: exact int64 Fano cleared of denominators; the corpus
      // doc count enters as a CTE scalar (same value as the Spark side's
      // memoized CorpusStats literal).
      "q151_term_burstiness" -> """
        WITH t AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
          FROM documents),
        tc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        a AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                 CAST(SUM(c) AS BIGINT) AS tot,
                 CAST(SUM(c * c) AS BIGINT) AS s2
          FROM tc GROUP BY 1)
        SELECT term, df, tot,
               ROUND(CAST(n.n * s2 - tot * tot AS DOUBLE) / (n.n * tot), 6) AS fano
        FROM a CROSS JOIN n
        WHERE df >= 20
        ORDER BY fano DESC, term LIMIT 20""",

      // q152's twin: q136's edge/degree/triangle CTEs, triangles unnested
      // to their three corners.
      "q152_clustering_coeff" -> s"""
        $pairsCtes,
        e AS (SELECT doc_a, doc_b FROM pairs WHERE jacc >= $JaccThreshold),
        deg AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT doc_a AS v FROM e UNION ALL SELECT doc_b AS v FROM e)
          GROUP BY 1),
        tr AS (
          SELECT unnest([e1.doc_a, e1.doc_b, e2.doc_b]) AS v
          FROM e e1 JOIN e e2 ON e1.doc_b = e2.doc_a
                    JOIN e e3 ON e1.doc_a = e3.doc_a AND e2.doc_b = e3.doc_b),
        tv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_tri FROM tr GROUP BY 1)
        SELECT deg.v AS doc_id, deg.deg,
               CAST(COALESCE(tv.n_tri, 0) AS BIGINT) AS n_tri,
               ROUND(CAST(2 * COALESCE(tv.n_tri, 0) AS DOUBLE) / (deg.deg * (deg.deg - 1)), 6) AS local_cc
        FROM deg LEFT JOIN tv ON deg.v = tv.v
        WHERE deg.deg >= 2
        ORDER BY doc_id""",

      // q153's twin: identical segmentation regex, trim, ≥20-char floor,
      // md5-prefix sentence hash, distinct-doc df.
      "q153_sentence_dup_share" -> s"""
        WITH sr AS (
          SELECT doc_id, source,
                 unnest(list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x))) AS sent
          FROM documents),
        sh AS (
          SELECT doc_id, source,
                 unnest(list_transform([sent], x -> CAST($hex32 AS BIGINT))) AS h
          FROM sr WHERE len(sent) >= 20),
        sdf AS (
          SELECT h, CAST(COUNT(*) AS BIGINT) AS sdf
          FROM (SELECT DISTINCT h, doc_id FROM sh) GROUP BY 1)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_sents,
               CAST(SUM(CASE WHEN sdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               ROUND(SUM(CASE WHEN sdf >= 2 THEN 1 ELSE 0 END) / COUNT(*), 6) AS dup_share
        FROM sh JOIN sdf USING (h)
        GROUP BY 1
        ORDER BY source""",

      // q154's twin: q105's score CTEs, min-max 1e-6 fixed-point
      // normalization, 10 value bins.
      "q154_score_calibration" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT doc_id, lang,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f),
        mm AS (SELECT CAST(MIN(sfp) AS BIGINT) AS lo, CAST(MAX(sfp) AS BIGINT) AS hi FROM s),
        p AS (
          SELECT lang,
                 CAST(ROUND(CAST(sfp - lo AS DOUBLE) / (hi - lo) * 1000000) AS BIGINT) AS p_fp
          FROM s CROSS JOIN mm WHERE hi > lo),
        b AS (
          SELECT CAST(LEAST(9, p_fp // 100000) AS INTEGER) AS bin, lang, p_fp
          FROM p)
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
               ROUND(CAST(SUM(p_fp) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_p,
               ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS obs_rate,
               ROUND(CAST(SUM(p_fp) AS DOUBLE) / COUNT(*) / 1e6
                     - CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS gap
        FROM b GROUP BY 1
        ORDER BY bin""",

      // q155's twin: distinct (term, doc) presence per parity half,
      // identical min-df floor and rounded log-ratio drift.
      "q155_idf_drift" -> """
        WITH g AS (
          SELECT DISTINCT doc_id, doc_id % 2 AS h,
                 unnest(list_distinct(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))) AS term
          FROM documents),
        df AS (
          SELECT term,
                 CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_a,
                 CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS df_b
          FROM g GROUP BY 1),
        nn AS (
          SELECT CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
          FROM documents)
        SELECT term, df_a, df_b,
               ROUND(ln(CAST(na AS DOUBLE) / df_a) - ln(CAST(nb AS DOUBLE) / df_b), 6) AS drift
        FROM df CROSS JOIN nn
        WHERE df_a >= 5 AND df_b >= 5
        ORDER BY ABS(drift) DESC, term
        LIMIT 15""",

      // q157's twin: the q34 pair CTEs + the q49 hash-gate split
      // assignment, canonical lexicographic split pair, 1-row total.
      "q157_split_leakage" -> {
        val splitHash = hex32.replace("md5(x)",
          "md5('split|' || CAST(doc_id AS VARCHAR))")
        s"""$pairsCtes,
        sp AS (
          SELECT doc_id,
                 CASE WHEN CAST($splitHash AS BIGINT) % 10 < 8 THEN 'train'
                      WHEN CAST($splitHash AS BIGINT) % 10 = 8 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents),
        lab AS (
          SELECT LEAST(a.split, b.split) AS split_a,
                 GREATEST(a.split, b.split) AS split_b
          FROM pairs p
          JOIN sp a ON p.doc_a = a.doc_id
          JOIN sp b ON p.doc_b = b.doc_id
          WHERE p.jacc >= ${JaccThreshold}),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lab)
        SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               split_a <> split_b AS is_leak,
               ROUND(CAST(COUNT(*) AS DOUBLE) / n_total, 6) AS share
        FROM lab CROSS JOIN tot
        GROUP BY split_a, split_b, n_total
        ORDER BY split_a, split_b""" },

      // q158's twin: same top-100 rank window over the vocab aggregate,
      // same ×1e9 logs / HUGEINT moments / final double trees as q125.
      "q158_zipf_slope" -> """
        WITH c AS (
          SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
          FROM documents),
        cc AS (
          SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM c GROUP BY 1, 2),
        r AS (
          SELECT lang, c,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rnk
          FROM cc),
        p AS (
          SELECT lang,
                 CAST(ROUND(ln(CAST(rnk AS DOUBLE)) * 1e9) AS BIGINT) AS x,
                 CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT) AS y
          FROM r WHERE rnk <= 100),
        s AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_top,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM p GROUP BY lang),
        m AS (
          SELECT lang, n_top, sx, sy,
                 CAST(n_top AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                 CAST(n_top AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
                 CAST(n_top AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
          FROM s)
        SELECT lang, n_top,
               CASE WHEN den > 0 THEN ROUND(num / den, 6) END AS slope,
               CASE WHEN den > 0 THEN ROUND((CAST(sy AS DOUBLE) - num / den
                 * CAST(sx AS DOUBLE)) / n_top / 1e9, 6) END AS ln_c1,
               CASE WHEN den > 0 AND deny > 0
                    THEN ROUND(num * num / (den * deny), 6) END AS r2
        FROM m ORDER BY lang""",

      // q159's twin: identical count-of-counts over the term aggregate.
      "q159_good_turing" -> """
        WITH c AS (
          SELECT lang, unnest(list_filter(string_split_regex(trim(text), '\s+'),
                       x -> x <> '')) AS tok
          FROM documents),
        cc AS (
          SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM c GROUP BY 1, 2),
        g AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM cc GROUP BY lang)
        SELECT lang, n_types, n_tokens, n1, n2,
               ROUND(CAST(n1 AS DOUBLE) / n_tokens, 6) AS p_unseen,
               CASE WHEN n1 > 0 THEN ROUND(2.0 * n2 / n1, 6) END AS r1_star
        FROM g ORDER BY lang""",

      // q160's twin: same shared-term decomposition, the same ×1e9
      // fixed-point contribution tree, ln2 normalization.
      "q160_source_jsd" -> """
        WITH c AS (
          SELECT source, unnest(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '')) AS tok
          FROM documents),
        cc AS (
          SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM c GROUP BY 1, 2),
        tt AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM cc GROUP BY 1),
        p AS (SELECT cc.source, tok, c, tot FROM cc JOIN tt ON cc.source = tt.source),
        shared AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(ROUND((CAST(a.c AS DOUBLE) / a.tot * ln(2 * (CAST(a.c AS DOUBLE) / a.tot)
                   / (CAST(a.c AS DOUBLE) / a.tot + CAST(b.c AS DOUBLE) / b.tot))
                   + CAST(b.c AS DOUBLE) / b.tot * ln(2 * (CAST(b.c AS DOUBLE) / b.tot)
                   / (CAST(a.c AS DOUBLE) / a.tot + CAST(b.c AS DOUBLE) / b.tot))
                   - (CAST(a.c AS DOUBLE) / a.tot + CAST(b.c AS DOUBLE) / b.tot) * ln(2))
                   * 0.5 * 1e9) AS BIGINT) AS fp
          FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source)
        SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_shared,
               ROUND((CAST(SUM(fp) AS DOUBLE) / 1e9 + ln(2)) / ln(2), 6) AS jsd_norm
        FROM shared GROUP BY 1, 2
        ORDER BY src_a, src_b""",

      // q164's twin: same ascending rank window, HUGEINT moment, same
      // final double tree.
      "q164_length_gini" -> """
        WITH r AS (
          SELECT lang, n_chars, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS i
          FROM documents),
        g AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                 SUM(CAST(i AS HUGEINT) * n_chars) AS swx
          FROM r GROUP BY lang)
        SELECT lang, n_docs, total_chars,
               CASE WHEN n_docs > 1 AND total_chars > 0 THEN ROUND(
                 2.0 * CAST(swx AS DOUBLE)
                 / (CAST(n_docs AS DOUBLE) * CAST(total_chars AS DOUBLE))
                 - (CAST(n_docs AS DOUBLE) + 1) / n_docs, 6) END AS gini
        FROM g ORDER BY lang""",

      // q166's twin: q105's score CTEs, the same 1e-6 re-fixed-pointing,
      // per-group integer-rounded between-moment, identical final trees.
      "q166_score_anova" -> """
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM t WHERE len(toks) > 0),
        s AS (
          SELECT doc_id,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f),
        j AS (
          SELECT s.doc_id, d.source,
                 CAST(ROUND(CAST(sfp AS DOUBLE) / 1e3) AS BIGINT) AS s6
          FROM s JOIN documents d ON s.doc_id = d.doc_id),
        g AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(s6) AS BIGINT) AS sum_g,
                 SUM(CAST(s6 AS HUGEINT) * s6) AS ss_g
          FROM j GROUP BY 1),
        tt AS (
          SELECT CAST(SUM(n_g) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(sum_g) AS BIGINT) AS ss, SUM(ss_g) AS qq,
                 SUM(CAST(ROUND(CAST(CAST(sum_g AS HUGEINT) * sum_g AS DOUBLE) / n_g) AS HUGEINT)) AS ssb_raw
          FROM g)
        SELECT nn AS n_docs, k AS n_groups,
               CASE WHEN CAST(qq AS DOUBLE)
                 - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn > 0
                 THEN ROUND((CAST(ssb_raw AS DOUBLE)
                   - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn)
                 / (CAST(qq AS DOUBLE)
                   - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn), 6) END AS eta2,
               CASE WHEN k > 1 AND nn > k AND CAST(qq AS DOUBLE)
                 - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn
                 - (CAST(ssb_raw AS DOUBLE)
                   - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn) > 0
                 THEN ROUND(((CAST(ssb_raw AS DOUBLE)
                   - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn) / (k - 1))
                 / ((CAST(qq AS DOUBLE)
                   - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn
                   - (CAST(ssb_raw AS DOUBLE)
                     - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn)) / (nn - k)), 6) END AS f_stat
        FROM tt""",

      // q167's twin: q153's segmentation, the q32 per-sentence stopword
      // argmax, identical entropy fixed-pointing.
      "q167_mixed_lang" -> s"""
        WITH sr AS (
          SELECT doc_id, lang,
                 unnest(list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x))) AS sent
          FROM documents),
        st AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(sent), '\\s+'), x -> x <> '') AS toks
          FROM sr WHERE len(sent) >= 20),
        h AS (
          SELECT doc_id, lang,
                 ${langs.map(l => s"${hits(l)} AS h_$l").mkString(",\n                 ")}
          FROM st),
        pr AS (
          SELECT doc_id, lang,
                 CASE ${langs.map(l => s"WHEN h_$l = greatest(${langs.map(x => s"h_$x").mkString(",")}) THEN '$l'").mkString(" ")}
                 END AS pred
          FROM h),
        pc AS (
          SELECT doc_id, lang, pred, CAST(COUNT(*) AS BIGINT) AS c
          FROM pr GROUP BY 1, 2, 3),
        pd AS (
          SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS n_langs,
                 CAST(SUM(CAST(ROUND(c * ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS scl
          FROM pc GROUP BY 1, 2),
        pe AS (
          SELECT doc_id, lang, n_langs,
                 CAST(ROUND((ln(CAST(n AS DOUBLE)) - CAST(scl AS DOUBLE) / 1e9 / n) * 1e9) AS BIGINT) AS h_fp
          FROM pd)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
               ROUND(CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS mixed_share,
               ROUND(CAST(SUM(h_fp) AS DOUBLE) / COUNT(*) / 1e9, 6) AS mean_entropy
        FROM pe GROUP BY 1
        ORDER BY lang""",

      // q171's twin: same value-level counts, same cumulative ECDFs,
      // same exact-integer supremum.
      "q171_ks_drift" -> """
        WITH v AS (
          SELECT doc_id % 2 AS h, n_chars AS x FROM documents),
        c AS (
          SELECT x,
                 CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM v GROUP BY 1),
        t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM c),
        k AS (
          SELECT CAST(SUM(ca) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
                 CAST(SUM(cb) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
          FROM c),
        m AS (
          SELECT na, nb,
                 MAX(ABS(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)) AS d_num
          FROM k CROSS JOIN t GROUP BY 1, 2)
        SELECT na, nb,
               CASE WHEN na > 0 AND nb > 0 THEN ROUND(
                 CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * nb), 6) END AS ks_d,
               CASE WHEN na > 0 AND nb > 0 THEN ROUND(
                 sqrt(CAST(na AS DOUBLE) * nb / (CAST(na AS DOUBLE) + nb))
                 * (CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * nb)), 6) END AS ks_scaled
        FROM m""",

      // q172's twin: the q157 split gate, identical margins and χ² term.
      "q172_split_balance" -> {
        val splitHash = hex32.replace("md5(x)",
          "md5('split|' || CAST(doc_id AS VARCHAR))")
        s"""
        WITH sp AS (
          SELECT lang,
                 CASE WHEN CAST($splitHash AS BIGINT) % 10 < 8 THEN 'train'
                      WHEN CAST($splitHash AS BIGINT) % 10 = 8 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents),
        cells AS (
          SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS o
          FROM sp GROUP BY 1, 2),
        sm AS (SELECT split, CAST(SUM(o) AS BIGINT) AS st FROM cells GROUP BY 1),
        lm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS lt FROM cells GROUP BY 1),
        nt AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells)
        SELECT cells.split, cells.lang, o AS n_docs,
               ROUND(CAST(o AS DOUBLE) / st, 6) AS obs_share,
               ROUND(CAST(lt AS DOUBLE) / nn, 6) AS corpus_share,
               CAST(ROUND(POWER(o - CAST(st AS DOUBLE) * lt / nn, 2)
                 / (CAST(st AS DOUBLE) * lt / nn) * 1e6) AS BIGINT) AS chi2_term_fp
        FROM cells
        JOIN sm ON cells.split = sm.split
        JOIN lm ON cells.lang = lm.lang
        CROSS JOIN nt
        ORDER BY cells.split, cells.lang""" },

      // q173's twin: pairs CTEs, explicit threshold grid, same
      // keep-lowest-id drop counting.
      "q173_threshold_sweep" -> s"""
        $pairsCtes
        SELECT CAST(t AS DOUBLE) / 100.0 AS threshold,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_dropped
        FROM pairs p, generate_series(50, 95, 5) g(t)
        WHERE p.jacc >= $JaccThreshold AND p.jacc >= CAST(t AS DOUBLE) / 100.0
        GROUP BY t
        ORDER BY threshold""",

      // q174's twin: same vocab collapse, same ×1e9 entropy moment.
      "q174_unigram_entropy" -> """
        WITH c AS (
          SELECT source, unnest(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '')) AS tok
          FROM documents),
        cc AS (
          SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM c GROUP BY 1, 2),
        g AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(SUM(CAST(ROUND(c * ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS scl
          FROM cc GROUP BY 1)
        SELECT source, n_types, n_tokens,
               ROUND(ln(CAST(n_tokens AS DOUBLE)) - CAST(scl AS DOUBLE) / 1e9 / n_tokens, 6) AS entropy_nats,
               ROUND((ln(CAST(n_tokens AS DOUBLE)) - CAST(scl AS DOUBLE) / 1e9 / n_tokens) / ln(2), 6) AS bits_per_token
        FROM g ORDER BY source""",

      // q175's twin: pairs CTEs → dropped set, q105's score CTEs, same
      // exact per-lang sums and final trees.
      "q175_dup_quality_bias" -> s"""
        $pairsCtes,
        dropped AS (
          SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE jacc >= $JaccThreshold),
        tt AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang,
                 CAST(len(toks) AS BIGINT) AS n_toks,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                 CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len
          FROM tt WHERE len(toks) > 0),
        sc AS (
          SELECT doc_id, lang,
                 CAST(ROUND(1.2 * ln(CAST(n_toks AS DOUBLE) / 50) * 1000000000) AS BIGINT)
                 + CAST(ROUND(2.0 * (CAST(n_types AS DOUBLE) / n_toks - 0.5) * 1000000000) AS BIGINT)
                 + CAST(ROUND(0.8 * (CAST(sum_len AS DOUBLE) / n_toks - 4.5) * 1000000000) AS BIGINT)
                 + CASE WHEN lang = 'en' THEN 500000000 ELSE 0 END AS sfp
          FROM f),
        j AS (
          SELECT sc.lang, sfp,
                 CASE WHEN dropped.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup
          FROM sc LEFT JOIN dropped ON sc.doc_id = dropped.doc_id),
        g AS (
          SELECT lang,
                 CAST(SUM(dup) AS BIGINT) AS n_dup,
                 CAST(SUM(1 - dup) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN dup = 1 THEN sfp ELSE 0 END) AS BIGINT) AS s_dup,
                 CAST(SUM(CASE WHEN dup = 0 THEN sfp ELSE 0 END) AS BIGINT) AS s_kept
          FROM j GROUP BY 1)
        SELECT lang, n_dup, n_kept,
               CASE WHEN n_dup > 0 THEN ROUND(CAST(s_dup AS DOUBLE) / n_dup / 1e9, 6) END AS mean_dup,
               CASE WHEN n_kept > 0 THEN ROUND(CAST(s_kept AS DOUBLE) / n_kept / 1e9, 6) END AS mean_kept,
               CASE WHEN n_dup > 0 AND n_kept > 0 THEN ROUND(
                 CAST(s_dup AS DOUBLE) / n_dup / 1e9
                 - CAST(s_kept AS DOUBLE) / n_kept / 1e9, 6) END AS bias
        FROM g ORDER BY lang""",

      // q181's twin: positional segmentation, the same ≥20-char hash
      // rule, min-owner keep, ordered string_agg reassembly md5.
      "q181_sentence_clean" -> {
        val sentHash = hex32.replace("md5(x)", "md5(sent)")
        s"""
        WITH sp AS (
          SELECT doc_id, string_split_regex(text, '[.!?]+') AS parts FROM documents),
        sr AS (
          SELECT doc_id, unnest(generate_series(1, len(parts))) AS pos,
                 trim(unnest(parts)) AS sent
          FROM sp WHERE len(parts) > 0),
        s2 AS (
          SELECT doc_id, pos, sent,
                 CASE WHEN len(sent) >= 20 THEN CAST($sentHash AS BIGINT) END AS h
          FROM sr WHERE len(sent) > 0),
        own AS (
          SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS sdf,
                 CAST(MIN(doc_id) AS BIGINT) AS owner
          FROM s2 WHERE h IS NOT NULL GROUP BY 1),
        lab AS (
          SELECT s2.doc_id, pos, sent,
                 (h IS NULL OR sdf = 1 OR owner = s2.doc_id) AS keep
          FROM s2 LEFT JOIN own USING (h)),
        g AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sents,
                 CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 md5(string_agg(CASE WHEN keep THEN sent END, '|' ORDER BY pos)) AS raw_md5
          FROM lab GROUP BY 1)
        SELECT doc_id, n_sents, n_kept,
               CASE WHEN n_kept > 0 THEN raw_md5 END AS clean_md5
        FROM g ORDER BY doc_id""" },

      // q182's twin: identical segmentation/token/vowel-group counts and
      // fixed-point grade tree.
      "q182_readability" -> """
        WITH b AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks,
                 len(list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                   x -> trim(x)), x -> len(x) > 0)) AS n_sents
          FROM documents),
        f AS (
          SELECT lang, CAST(n_sents AS BIGINT) AS n_sents,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(list_sum(list_transform(toks,
                   x -> greatest(len(regexp_extract_all(lower(x), '[aeiouy]+')), 1))) AS BIGINT) AS n_syll
          FROM b WHERE len(toks) > 0 AND n_sents > 0),
        p AS (
          SELECT lang,
                 CAST(ROUND((0.39 * CAST(n_words AS DOUBLE) / n_sents
                   + 11.8 * CAST(n_syll AS DOUBLE) / n_words - 15.59) * 1e6) AS BIGINT) AS grade_fp
          FROM f)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(CAST(SUM(grade_fp) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_grade,
               ROUND(CAST(SUM(CASE WHEN grade_fp > 12000000 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hard_share
        FROM p GROUP BY 1
        ORDER BY lang""",

      // q183's twin: identical df/idf fixed-pointing and exact argmax.
      "q183_doc_keywords" -> """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
          FROM documents),
        e AS (SELECT doc_id, unnest(toks) AS term FROM t),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM e GROUP BY 1, 2),
        df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        idf AS (
          SELECT term, df,
                 CAST(ROUND(ln(CAST(n_docs AS DOUBLE) / df) * 1e9) AS BIGINT) AS idf_fp
          FROM df CROSS JOIN nn),
        sc AS (
          SELECT doc_id, term, tf, df, tf * idf_fp AS score_fp
          FROM tf JOIN idf USING (term)),
        rk AS (
          SELECT doc_id, term, tf, df, score_fp,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, term) AS rnk
          FROM sc)
        SELECT doc_id, term AS keyword, tf, df,
               ROUND(CAST(score_fp AS DOUBLE) / 1e9, 6) AS tfidf
        FROM rk WHERE rnk = 1
        ORDER BY doc_id"""
    )
  }
}
