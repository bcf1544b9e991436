package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFns, Vectors}
import graft.operators.{SaltedSelfPairs, TopK}

/** Similarity search + embedding dedup over the `embeddings` table
  * (builder-prompt ANN family): brute-force cosine top-k as the exactness
  * baseline (q38), hyperplane-LSH (q39) and IVF (q44) as the scale paths,
  * banded-LSH near-dup dedup (q47), and a recall gate (q50) that scores
  * the approximate indexes against the exact ranking.
  *
  * All vector math is HOF-based (zip_with/transform/aggregate folding in
  * index order, elements cast to double first) so the identical IEEE
  * sequence is expressible in DuckDB (`list_transform` + `list_reduce`) and
  * cosine scores hash-match bit-for-bit — see graft.functions.Vectors.
  *
  * INDEX GEOMETRY SCALES WITH THE CORPUS (not compile-time constants): the
  * number of hash planes per LSH band and the IVF centroid count are
  * derived from the corpus row count at build time —
  * planes = ceil(log2(n / targetBucket)) keeps expected bucket size near
  * `TargetBucket` as n grows, centroids = floor(sqrt(n)) keeps per-probe
  * scan cost ~sqrt(n). The SAME derivations run inside the oracle SQL
  * (a params CTE over COUNT(*)), in pure integer arithmetic
  * (ceil-log2 via the binary-string length of m-1) so both engines derive
  * identical constants with no float-edge risk. The plane POOL is fixed
  * (seeded, NumBands × MaxPlanesPerBand) and each band uses a prefix of
  * its slice, so a derived plane count selects from identical literals on
  * both sides.
  */
object VectorQueries extends QueryPack {

  private val NumQueries = 5
  private val K = 10
  private val Dim = 64
  private val NProbe = 2
  private val DupCos = 0.4

  /** LSH bands for the dedup family; band COUNT is a recall knob (fixed),
    * band key CARDINALITY is the scale knob (derived from n). */
  private val NumBands = 4

  /** Cap on derived planes per band — 2^16 bucket ids per band. Beyond
    * n ≈ TargetBucket·2^16 vectors the key space stops growing and the
    * oversized-bucket salting guard (SaltedSelfPairs) is what bounds
    * per-task work; raising the cap is a one-constant change (the plane
    * pool and oracle SQL are generated from it). */
  private val MaxPlanesPerBand = 16

  /** Intended vectors per LSH bucket: planes are derived so expected
    * bucket size stays near this as the corpus grows. */
  private val TargetBucket = 32

  /** Hot-bucket guard: oversized LSH buckets are sub-split by
    * SaltedSelfPairs so each join task owns one sub-group pair —
    * ~MaxBucket² candidate pairs per task (same guard as q37's trigram
    * blocks). */
  private val MaxBucket = 1000

  /** Deterministic hyperplane pool shared by the Spark plan and the
    * generated oracle SQL (same literals on both sides). Band b uses
    * slots [b·MaxPlanesPerBand, b·MaxPlanesPerBand + planesPerBand(n));
    * slot→plane never shifts when the derived count changes. */
  private val pool: Seq[Seq[Double]] =
    Vectors.hyperplanes(NumBands * MaxPlanesPerBand, Dim, seed = 42L)

  /** ceil(log2(m)) in exact integer arithmetic (0 for m ≤ 1) — the SQL
    * twin is `length(bin(m - 1))`, also exact. */
  private def ceilLog2(m: Long): Int =
    if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)

  /** Derived planes per band: smallest p with n/2^p ≤ TargetBucket,
    * floored at 2, capped at MaxPlanesPerBand. Public: callers banding
    * their own relations (bandTable/lshSearch) must derive the same
    * geometry the index was built with. */
  def planesPerBand(n: Long): Int =
    math.min(MaxPlanesPerBand,
      math.max(2, ceilLog2((n + TargetBucket - 1) / TargetBucket)))

  /** Derived IVF centroid count: ~sqrt(n), floored at 16 (sqrt of an
    * integer is correctly rounded in IEEE, so floor is engine-stable). */
  private[queries] def numCentroids(n: Long): Long =
    math.max(16L, math.floor(math.sqrt(n.toDouble)).toLong)

  /** Lloyd-training sample gate threshold (per-million): centroids are
    * trained on ~30·numCentroids(n) rows selected by a deterministic,
    * content-independent hash gate (same md5 gate family as q49's
    * stratified sample — every engine, every partitioning draws the same
    * rows), not the full corpus. Full-corpus training made index BUILD
    * O(n·sqrt(n)·d) per Lloyd pass — the round-5 q44 regression; sampled
    * training is O(30·n·d) total. The multiplier is 30 POINTS PER
    * CENTROID, not 10: measured at sf0.01, a 10·√n sample dropped
    * recall@10 from 0.86 to 0.64 (too few points to place √n centroids),
    * while 30·√n matches full-corpus training — and still vanishes
    * relative to n as the corpus grows (30·√n/n → 0). Pure integer
    * derivation so the oracle's params CTE computes the identical
    * threshold. */
  private[queries] def sampleThreshPpm(n: Long): Long =
    math.min(1000000L, 30L * numCentroids(n) * 1000000L / n)

  /** PUBLIC: nearest-centroid assignment — best centroid per vector by
    * (cosine desc, c_id asc). Centroids are broadcast — bounded
    * (~sqrt(n) rows) at any corpus scale. */
  def assignTo(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.join(broadcast(cents), expr("true"))
      .select(col("vec_id"), col("embedding"), col("c_id"),
              Vectors.cosine(col("embedding"), col("c_emb")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("embedding"), col("c_id")),
                  struct(col("sim"), -col("c_id"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
              col("best.c_id").as("cluster"))

  /** One Lloyd update: per-cluster, per-dimension mean of the member
    * vectors. The mean goes through FIXED-POINT longs (round(v·1e6), exact
    * order-independent integer sums) so the result is bit-identical across
    * engines and shuffle orders — the same determinism rule as
    * Num.fixedSum. Shape: explode to (cluster, dim) — 64·n rows, one
    * shuffle agg keyed (cluster, dim), then re-assembled in dim order. */
  private def lloydStep(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cluster"), col("pos"),
              round(col("v").cast("double") * 1000000.0).cast("long").as("fx"))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("fx")).as("s"), count(lit(1)).as("cnt"))
      .withColumn("m", col("s").cast("double") / col("cnt") / 1000000.0)
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
                     x => x.getField("m")).as("c_emb"))
      .select(col("cluster").as("c_id"), col("c_emb"))

  // ---- query bodies (named so q50 can compose the other three) ----

  /** PUBLIC search surface: exact cosine top-k of `queries` (q_id, q_emb)
    * against `corpus` (vec_id, embedding). The query side is broadcast;
    * the corpus is never shuffled — only the k·salt level-1 survivors
    * move (TopK.perKey). The gate's q38 binds this to the corpus table
    * with its first NumQueries vectors as queries. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
              Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
    TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
        k, col("vec_id"))
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
  }

  private def exactTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val qs = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    cosineTopK(emb, qs, K).orderBy(col("q_id"), col("rank"))
  }

  /** The NumBands band-key columns over an `embedding` column: band b's
    * key is the sign pattern of its np-plane slice of the fixed pool.
    * Shared by the LSH search (q39) and the LSH dedup (q47/q52). */
  private def bandKeyCols(np: Int): Seq[org.apache.spark.sql.Column] =
    (0 until NumBands).map { b =>
      Vectors.lshBucket(col("embedding"),
        (0 until np).map(j => pool(b * MaxPlanesPerBand + j)))
    }

  /** (vec_id, band, key) band table for any (vec_id, embedding) relation —
    * the narrow relation every LSH consumer joins on. Public: pair with
    * lshSearch/dedupAgainstDropped over arbitrary relations. */
  def bandTable(emb: DataFrame, np: Int): DataFrame =
    emb.select(col("vec_id"),
      posexplode(array(bandKeyCols(np): _*)).as(Seq("band", "key")))

  /** The banded LSH INDEX of a corpus, materialized once per (geometry,
    * corpus fingerprint) and shared by every consumer — search (q39),
    * dedup (q47), incremental dedup (q52), recall gate (q50). Without
    * this, each query (and each SIDE of a self-join) re-scans the corpus
    * and recomputes NumBands·np 64-dim dot products per row; with it, the
    * corpus is banded exactly once and consumers read a narrow
    * (vec_id, band, key) relation — the index-build/serve split a
    * production vector store would express as a real table. Subset band
    * tables (q52's corpus/batch split) are FILTERS of this relation:
    * band keys are per-row, so filtering commutes with banding. */
  private def materializedBands(s: SparkSession, d: String, emb: DataFrame,
                                np: Int): DataFrame =
    graft.operators.MaterializeOnce(
      s"emb_bands|$np|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
      bandTable(emb, np)
    }

  /** Exact-cosine confirmation of candidate (id_a, id_b) pairs against the
    * two source relations; returns the distinct id_b values with a
    * confirmed lower/other-side near-duplicate. */
  private def confirmedDroppedIds(cand: DataFrame, left: DataFrame,
                                  right: DataFrame): DataFrame =
    cand
      .join(left.select(col("vec_id").as("ia"), col("embedding").as("ea")),
            col("id_a") === col("ia"))
      .join(right.select(col("vec_id").as("ib"), col("embedding").as("eb")),
            col("id_b") === col("ib"))
      .filter(Vectors.cosine(col("ea"), col("eb")) >= DupCos)
      .select(col("id_b").as("vec_b")).distinct()

  /** INCREMENTAL embedding dedup — the vector twin of
    * TextPipelineQueries.dedupAgainstDropped: distinct batch vec_ids to
    * DROP, i.e. batch vectors that are cosine-confirmed near-dups of ANY
    * corpus vector (band-key equi-join against the standing band table —
    * never corpus×corpus) or of a lower-id vector within their own batch
    * (salted self-pairs). `np` is the index's plane count — FIXED at
    * index-build time in production (band keys are np-dependent, so
    * corpus and batch must be keyed with the same geometry). */
  def dedupAgainstDropped(corpusEmb: DataFrame, batchEmb: DataFrame,
                          np: Int,
                          corpusBands: Option[DataFrame] = None,
                          batchBands: Option[DataFrame] = None): DataFrame = {
    val cb = corpusBands.getOrElse(bandTable(corpusEmb, np))
      .select(col("band"), col("key"), col("vec_id").as("id_a"))
    val nb = batchBands.getOrElse(bandTable(batchEmb, np))
    val cross = nb.select(col("band"), col("key"), col("vec_id").as("id_b"))
      .join(cb, Seq("band", "key"))
      .select(col("id_a"), col("id_b")).distinct()
    val crossDropped = confirmedDroppedIds(cross, corpusEmb, batchEmb)
    val innerDropped = confirmedDroppedIds(
      SaltedSelfPairs.pairs(nb, Seq("band", "key"), "vec_id", MaxBucket).distinct(),
      batchEmb, batchEmb)
    crossDropped.union(innerDropped).distinct()
  }

  /** PUBLIC: SemDeDup verdict for an (vec_id, embedding) relation against
    * a trained centroid table — per-vector (vec_id, cluster, cos_cent,
    * is_dropped). Candidates are within-cluster pairs only (salted), the
    * keeper of each confirmed neighborhood is the member farthest from
    * its centroid (cos_cent ASC, vec_id ASC tiebreak). Exposed so the
    * spec can drive it with a hand-built cluster geometry. */
  /** Per-vector (vec_id, embedding, cluster, cos_cent) against the trained
    * centroids — the relation both SemDeDup forms score and report over. */
  private def semDedupCc(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned.join(broadcast(cents), col("cluster") === col("c_id"))
      .select(col("vec_id"), col("embedding"), col("cluster"),
              Vectors.cosine(col("embedding"), col("c_emb")).as("cos_cent"))

  /** The SemDeDup core over a CANDIDATE pair relation (id_a, id_b):
    * exact-cosine confirm at DupCos, then the keeper-order drop rule — x
    * is dropped when any confirmed neighbor y precedes it in
    * (cos_cent ASC, vec_id ASC). Shared by the one-pass (q189) and
    * incremental (q190) verdicts, so the two can only differ in WHICH
    * pairs they generate — never in how a pair is judged. */
  private def semDedupDrops(pairs: DataFrame, emb: DataFrame,
                            ccn: DataFrame): DataFrame = {
    val conf = pairs
      .join(emb.select(col("vec_id").as("ia"), col("embedding").as("ea")),
            col("id_a") === col("ia"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("eb")),
            col("id_b") === col("ib"))
      .filter(Vectors.cosine(col("ea"), col("eb")) >= DupCos)
      .select(col("id_a"), col("id_b"))
    // Both orientations: x survives only if no confirmed neighbor y
    // precedes it in the keeper order. Derived in ONE pass (explode of the
    // two orderings) — a union of two projections would evaluate the
    // salted pair-join + exact-cosine confirm subtree twice.
    val oriented = conf
      .select(explode(array(
        struct(col("id_a").as("x"), col("id_b").as("y")),
        struct(col("id_b").as("x"), col("id_a").as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    oriented
      .join(ccn.select(col("vec_id").as("x"), col("cos_cent").as("cx")), Seq("x"))
      .join(ccn.select(col("vec_id").as("y"), col("cos_cent").as("cy")), Seq("y"))
      .filter(col("cy") < col("cx") ||
              (col("cy") === col("cx") && col("y") < col("x")))
      .select(col("x")).distinct()
  }

  private def semDedupFinish(cc: DataFrame, dropped: DataFrame): DataFrame =
    cc.join(dropped.withColumnRenamed("x", "dx"),
            col("vec_id") === col("dx"), "left_outer")
      .select(col("vec_id"), col("cluster"), col("cos_cent"),
              when(col("dx").isNotNull, 1).otherwise(0).as("is_dropped"))

  def semDedupVerdict(emb: DataFrame, cents: DataFrame): DataFrame = {
    // assignTo (a corpus × √n-centroid cosine argmax — the single most
    // expensive kernel here) feeds both the scored relation and the pair
    // generator, and cc feeds the keeper-order joins twice plus the final
    // report; without a barrier every consumer re-planned the whole
    // assignment subtree (zero runtime exchange reuse, r19 plan audit).
    // One eager localCheckpoint each (per-invocation RDD — nothing
    // survives across runs) replaces 3-5 assignment computations with one.
    // Tradeoff, stated once for every localCheckpoint in this file: the
    // checkpointed blocks live on executors until the DataFrame is GC'd
    // (there is no safe in-function unpersist point — the returned plan
    // still references them), and lineage truncation means an executor
    // loss during the run fails the query instead of recomputing. Both are
    // acceptable for a bounded per-invocation relation; on a cluster,
    // `checkpoint(reliable)` trades speed back for fault tolerance.
    val assigned = assignTo(emb, cents).localCheckpoint(true)
    val cc = semDedupCc(assigned, cents).localCheckpoint(true)
    val drops = semDedupDrops(
      SaltedSelfPairs.pairs(assigned, Seq("cluster"), "vec_id", MaxBucket),
      emb, cc.select(col("vec_id"), col("cos_cent")))
    semDedupFinish(cc, drops)
  }

  /** INCREMENTAL SemDeDup (the q51/q52/q188 discipline applied to q189):
    * vectors with id < `t` are the STANDING corpus, id ≥ `t` the arriving
    * batch. The standing pass re-derives the standing-only drops (in
    * production, the previous run's output); the ARRIVAL pass generates
    * only pairs that involve a batch member — batch × standing within
    * cluster (salted rectangle: [[SaltedSelfPairs.crossPairs]]) plus the
    * batch's own within-cluster self pairs — so an ingestion tick pays
    * O(batch-scoped pairs), never the corpus². Because the full
    * within-cluster pair set decomposes EXACTLY into
    * {standing²} ∪ {batch×standing} ∪ {batch²}, and the keeper rule is
    * per-pair over the SAME global cos_cent relation, the combined
    * verdict equals the one-pass q189 — a new arrival farther from its
    * centroid correctly displaces a standing keeper. The oracle IS
    * q189's full-corpus SQL verbatim, so incremental ≡ full is
    * machine-checked, not asserted. */
  def semDedupIncrementalVerdict(emb: DataFrame, cents: DataFrame,
                                 t: Long): DataFrame = {
    // Same barrier rationale as semDedupVerdict, amplified: the standing/
    // batch split and the three pair generators made the incremental form
    // re-plan assignTo up to 6× (it carried a confirmed 2× bench flag in
    // this round's pre-run); cc additionally feeds four keeper-order joins.
    val assigned = assignTo(emb, cents).localCheckpoint(true)
    val cc = semDedupCc(assigned, cents).localCheckpoint(true)
    val ccn = cc.select(col("vec_id"), col("cos_cent"))
    val standing = assigned.select(col("cluster"), col("vec_id"))
      .filter(col("vec_id") < t)
    val batch = assigned.select(col("cluster"), col("vec_id"))
      .filter(col("vec_id") >= t)
    val standingDrops = semDedupDrops(
      SaltedSelfPairs.pairs(standing, Seq("cluster"), "vec_id", MaxBucket),
      emb, ccn)
    val arrivalPairs = SaltedSelfPairs
      .crossPairs(batch, standing, Seq("cluster"), "vec_id", MaxBucket)
      .union(SaltedSelfPairs.pairs(batch, Seq("cluster"), "vec_id", MaxBucket))
    semDedupFinish(cc,
      standingDrops.union(semDedupDrops(arrivalPairs, emb, ccn)).distinct())
  }

  /** LSH-bucketed ANN, MULTI-band: each of the NumBands bands buckets the
    * corpus by the sign-pattern of planesPerBand(n) hyperplanes (a derived
    * count — bucket cardinality grows with the corpus so expected bucket
    * size stays ~TargetBucket); a corpus vector is a candidate when it
    * shares ANY band bucket with the query, then candidates are scored
    * exactly. One band was a weak retriever (measured recall@10 of 0.08 at
    * sf0.01 — a near neighbor missing a single 4-bit signature is gone);
    * band-OR candidate generation is the standard LSH recall amplifier
    * (miss probability (1-p)^NumBands) at NumBands× the candidate cost —
    * still O(NumBands·TargetBucket) per query at any scale. The joins are
    * band-key equi-joins with the tiny query side broadcast. */
  /** PUBLIC search surface: banded-LSH approximate top-k. `corpusBands` is
    * the (vec_id, band, key) index relation (materializedBands for the
    * corpus tables; bandTable-shaped for arbitrary relations),
    * `queryBands` the same banding of the query vectors. Candidates are
    * corpus vectors sharing ANY band bucket with a query (band-OR),
    * scored exactly; all joins are band-key equi-joins with the query
    * side broadcast. */
  def lshSearch(corpus: DataFrame, corpusBands: DataFrame,
                queries: DataFrame, queryBands: DataFrame, k: Int): DataFrame = {
    val cand = corpusBands.join(broadcast(queryBands), Seq("band", "key"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val scored = cand
      .join(corpus, Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
              Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
    TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
        k, col("vec_id"))
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Corpus row count / max id — one memoized job per corpus per JVM
    * (CorpusStats), never a per-query scalar action. */
  private def embStats(s: SparkSession, d: String) =
    graft.operators.CorpusStats.of(s, d, "embeddings", "vec_id")

  private def lshTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val np = planesPerBand(embStats(s, d).n)
    val bd = materializedBands(s, d, emb, np)
    val qs = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val qb = bd.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("band"), col("key"))
    lshSearch(emb, bd, qs, qb, K).orderBy(col("q_id"), col("rank"))
  }

  /** IVF-style ANN: coarse quantization into numCentroids(n) ≈ sqrt(n)
    * clusters — deterministic init (the first ncent vectors) then TWO
    * Lloyd iterations over a deterministic ~30·ncent-row SAMPLE (see
    * sampleThreshPpm; assignment by max cosine with id tiebreak;
    * fixed-point per-dimension means), then the FULL corpus is assigned
    * once against the trained centroids and each query probes only its 2
    * nearest clusters. Candidate generation is a cluster equi-join —
    * O(nprobe·sqrt(n)) of the corpus per query, the inverted-file scale
    * shape; training touches O(sqrt(n)) rows per pass and the trained
    * index is persisted per corpus fingerprint (real index-build/serve
    * split). */
  /** PUBLIC: train the IVF coarse quantizer for an (vec_id, embedding)
    * relation of n rows — deterministic init (first numCentroids(n)
    * vectors), two Lloyd iterations over the hash-gated ~30·√n sample.
    * Persist the result (the gate uses MaterializeOnce keyed by corpus
    * fingerprint) — this is the index-BUILD half of the split. */
  def trainIvfCentroids(emb: DataFrame, n: Long): DataFrame = {
    val ncent = numCentroids(n)
    val sthresh = sampleThreshPpm(n)
    val samp = emb.filter(
      pmod(TextFns.hash32(concat(lit("ivfs|"), col("vec_id").cast("string"))),
        lit(1000000L)) < sthresh)
    val cents0 = emb.filter(col("vec_id") < ncent)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    lloydStep(assignTo(samp, lloydStep(assignTo(samp, cents0))))
  }

  /** PUBLIC: IVF serve — probe the `nprobe` nearest trained clusters per
    * query and score only their members. `assigned` is the corpus with
    * its `cluster` column (assignTo), `cents` the trained centroids;
    * centroids and probes are broadcast (both constant-bounded). */
  def ivfSearch(assigned: DataFrame, cents: DataFrame, queries: DataFrame,
                k: Int, nprobe: Int): DataFrame = {
    val probes = queries.join(broadcast(cents), expr("true"))
      .select(col("q_id"), col("q_emb"), col("c_id"),
              Vectors.cosine(col("q_emb"), col("c_emb")).as("sim"))
    val probed = TopK.perKey(probes, Seq("q_id"),
        Seq(col("sim").desc, col("c_id")), nprobe, col("c_id"), salt = 4)
      .select(col("q_id"), col("q_emb"), col("c_id").as("probe_cluster"))
    val scored = assigned.join(broadcast(probed),
        col("cluster") === col("probe_cluster") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
              Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
    TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
        k, col("vec_id"))
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Sub-split plan for hot IVF posting lists — the operator that ACTS on
    * q112's `is_hot` audit signal (a cluster past `hotFactor`× the even
    * share would otherwise be scanned by ONE task per probe at serve
    * time): per cluster, the number of hash sub-lists its posting list is
    * split into — `ceil(balance / hotFactor)` so every sub-list lands
    * near-or-under hotFactor× the even share, 1 for non-hot clusters.
    * Pure integer arithmetic over the (≤ √n)-row size relation; the 1-row
    * (total, occupied) aggregate broadcasts back (whitelisted NLJ). */
  def ivfSubSplits(assigned: DataFrame, hotFactor: Int = 2): DataFrame = {
    val sz = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_assigned"))
    val tot = sz.agg(sum(col("n_assigned")).as("n_total"), count(lit(1)).as("k_occ"))
    sz.join(broadcast(tot), expr("true"))
      .select(col("cluster"),
        expr(s"greatest(CAST(1 AS BIGINT), (n_assigned * k_occ + $hotFactor * n_total - 1) div ($hotFactor * n_total))")
          .as("nsplits"))
  }

  /** The assignment relation with its sub-list id: a deterministic hash of
    * vec_id mod the cluster's split count (same md5 hash family as every
    * engine-stable gate — partitioning-independent, so the layout is
    * reproducible across engines and reshuffles). `splits` is ≤ √n rows —
    * broadcast. */
  def ivfSubSplitAssignments(assigned: DataFrame, splits: DataFrame): DataFrame =
    assigned.join(broadcast(splits), Seq("cluster"))
      .withColumn("sub",
        pmod(TextFns.hash32(concat(lit("ivfsub|"), col("vec_id").cast("string"))),
          col("nsplits")))

  /** IVF serve over the SUB-SPLIT layout: probes explode to one row per
    * (probed cluster, sub-list) and the candidate join is keyed on
    * (cluster, sub) — so a hot cluster's posting list is scanned by
    * `nsplits` tasks instead of one, while the union of its sub-lists is
    * exactly the flat posting list: results are IDENTICAL to
    * [[ivfSearch]] by construction (gate q196 machine-checks this against
    * q44's oracle). Probe fan-out is nprobe · ceil(balance/hotFactor)
    * rows per query — bounded by the layout invariant, broadcastable. */
  def ivfSearchSubSplit(assignedSub: DataFrame, splits: DataFrame,
                        cents: DataFrame, queries: DataFrame,
                        k: Int, nprobe: Int): DataFrame = {
    val probes = queries.join(broadcast(cents), expr("true"))
      .select(col("q_id"), col("q_emb"), col("c_id"),
              Vectors.cosine(col("q_emb"), col("c_emb")).as("sim"))
    val probed = TopK.perKey(probes, Seq("q_id"),
        Seq(col("sim").desc, col("c_id")), nprobe, col("c_id"), salt = 4)
      .select(col("q_id"), col("q_emb"), col("c_id").as("probe_cluster"))
    val probedSub = probed.join(broadcast(splits),
        col("probe_cluster") === col("cluster"))
      .select(col("q_id"), col("q_emb"), col("probe_cluster"),
        explode(expr("sequence(CAST(0 AS BIGINT), nsplits - 1)")).as("probe_sub"))
    val scored = assignedSub.join(broadcast(probedSub),
        col("cluster") === col("probe_cluster") &&
        col("sub") === col("probe_sub") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
              Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
    TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
        k, col("vec_id"))
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** CENTROID-DRIFT REFRESH plan — the operator that ACTS on the drift
    * audit family (q170 flags label-centroid drift; q205 gives the IVF
    * index the same audit→actuator upgrade q196 gave q112's `is_hot`):
    * per occupied cluster, the fixed-point mean of its CURRENT members
    * (one [[lloydStep]] — the mini-Lloyd pass over standing assignments,
    * no retraining) is compared to the standing centroid by the
    * deterministic index-ordered cosine; the quarter of occupied clusters
    * that drifted farthest (rank by drift_cos ASC, c_id tiebreak — never
    * vacuous at any tier, unlike a fixed threshold) take their member
    * mean as the refreshed centroid, the rest keep the standing centroid
    * UNCHANGED — so an ingestion tick pays O(n·d) for the means and the
    * undrifted majority of the index is bit-identical before and after
    * (the q188/q196 incremental-≡-full discipline; machine-checked by the
    * oracle's verbatim per-element array compare). Scale shape: one keyed
    * (cluster, dim) shuffle agg for the means; ranking is a single-task
    * window over the ≤ √n occupied-cluster relation — bounded at any
    * corpus size. */
  private def centroidRefreshFull(assigned: DataFrame, cents: DataFrame): DataFrame = {
    val means = lloydStep(assigned).withColumnRenamed("c_emb", "m_emb")
    val sizes = assigned.groupBy(col("cluster").as("c_id"))
      .agg(count(lit(1)).as("n_members"))
    val dr = cents.join(means, Seq("c_id")).join(sizes, Seq("c_id"))
      .select(col("c_id"), col("n_members"), col("c_emb"), col("m_emb"),
        Vectors.cosine(col("c_emb"), col("m_emb")).as("drift_cos"))
    // Drift cut WITHOUT a global rank window (that plan funnels the
    // relation through one SinglePartition exchange — forbidden by the
    // plan lint even on a bounded input): the quarter threshold is the
    // ⌊k_occ/4⌋-th smallest (drift_cos, c_id) pair, derived by ONE scalar
    // aggregate over the ≤ √n cluster relation (the sanctioned
    // partial→final shape) and broadcast back; is_drifted = pair ≤
    // threshold — equivalent to rank ≤ greatest(1, k_occ div 4) because
    // c_id makes every pair unique.
    val kth = dr.agg(
        sort_array(collect_list(struct(col("drift_cos"), col("c_id")))).as("sorted"),
        count(lit(1)).as("k_occ"))
      .select(element_at(col("sorted"),
        greatest(lit(1L), expr("k_occ div 4")).cast("int")).as("thresh"))
    dr.join(broadcast(kth), expr("true"))
      .withColumn("is_drifted",
        when(struct(col("drift_cos"), col("c_id")) <= col("thresh"), 1).otherwise(0))
      .withColumn("refreshed_emb",
        when(col("is_drifted") === 1, col("m_emb")).otherwise(col("c_emb")))
  }

  def centroidRefresh(assigned: DataFrame, cents: DataFrame): DataFrame =
    centroidRefreshFull(assigned, cents)
      .select(col("c_id"), col("n_members"),
        round(col("drift_cos"), 6).as("drift_cos"), col("is_drifted"),
        // Gate outputs are scalars-only (GateSchemaSpec / the driver's
        // comparator): the centroid array serializes to one string of
        // 1e-9-fixed-point integers — HALF_UP and DuckDB's
        // half-away-from-zero agree at every scale for identical doubles.
        concat_ws(",", transform(col("refreshed_emb"),
          x => round(x * 1000000000.0).cast("long").cast("string")))
          .as("refreshed"))

  /** The refreshed centroid TABLE (c_id, c_emb) [[centroidRefresh]]
    * implies — the serve-side relation RecallFloorSpec gates: the
    * refreshed index must still clear the q50 recall floor. */
  def refreshedCentroids(assigned: DataFrame, cents: DataFrame): DataFrame =
    centroidRefreshFull(assigned, cents)
      .select(col("c_id"), col("refreshed_emb").as("c_emb"))

  private def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = embStats(s, d).n
    val cents = graft.operators.MaterializeOnce(
      s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
      trainIvfCentroids(emb, n)
    }
    val assigned = assignTo(emb, cents)
    val qs = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    ivfSearch(assigned, cents, qs, K, NProbe)
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_cosine_topk" -> (exactTopK _),
    "q39_ann_lsh" -> (lshTopK _),
    "q44_ann_ivf" -> (ivfTopK _),

    // Governed int8 scalar quantization (the storage-side half of the ANN
    // family: 4x smaller vectors for the same index): per-vector symmetric
    // scale = max|v|/127, q_i = round(v_i/scale), dequant = q_i·scale. The
    // gate asserts the two quantization theorems per vector — max
    // reconstruction error <= scale/2 (round-to-nearest), and cosine
    // against the original >= 0.999 — plus the exact (dim, scale) pair.
    // Pure per-row HOF map, no shuffle but the presentation sort; the
    // booleans (not raw floats) are the gated surface, so the thresholds
    // carry margins >> 1 ulp. scale > 0 keeps the op total on zero
    // vectors (none in this corpus; dropped, like the oracle).
    "q69_embed_quantize_bound" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .withColumn("dim", size(col("embedding")))
        .withColumn("scale",
          array_max(transform(col("embedding"), x => abs(x))).cast("double")
            / 127.0)
        .filter(col("scale") > 0)
        .withColumn("deq", transform(col("embedding"),
          x => round(x.cast("double") / col("scale")) * col("scale")))
      base.select(col("vec_id"), col("dim"), col("scale"),
          (aggregate(
            zip_with(col("embedding"), col("deq"),
              (a, b) => abs(a.cast("double") - b)),
            lit(0.0), (m, x) => greatest(m, x))
            <= col("scale") / 2 * 1.000000001).as("err_ok"),
          (Vectors.cosineHof(col("embedding"), col("deq")) >= 0.999).as("cos_ok"))
        .orderBy(col("vec_id"))
    }),

    // Embedding-cosine near-dup DEDUP (the vector member of the dedup
    // family — q38/q39/q44 are search): BANDED multi-hash LSH candidate
    // pairs — NumBands independent bands, each keyed by planesPerBand(n)
    // sign bits, so key cardinality GROWS with the corpus (expected bucket
    // ~TargetBucket at any n; the round-4 fixed-16-bucket scheme was
    // quadratic within buckets at scale). Pairs sharing ANY band key are
    // candidates (SaltedSelfPairs: oversized buckets are sub-split so no
    // join task owns a whole hot bucket), then confirmed by exact
    // cosine ≥ threshold against the source relation — the band stream
    // itself stays (id, band, key)-narrow. Resolution drops every vector
    // with ANY lower-id near-duplicate (same one-pass rule as q35);
    // reported per vector as (vec_id, is_dropped).
    "q47_embed_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val np = planesPerBand(embStats(s, d).n)
      val bd = materializedBands(s, d, emb, np)
      val dropped = confirmedDroppedIds(
        SaltedSelfPairs.pairs(bd, Seq("band", "key"), "vec_id", MaxBucket).distinct(),
        emb, emb)
      emb.join(dropped, col("vec_id") === col("vec_b"), "left_outer")
        .select(col("vec_id"),
                when(col("vec_b").isNotNull, 1).otherwise(0).as("is_dropped"))
        .orderBy(col("vec_id"))
    }),

    // INCREMENTAL embedding dedup gate: split the corpus at the 80% point
    // of the id space, dedup the standing corpus within itself and the
    // arriving batch via dedupAgainstDropped — and require the combined
    // verdict vector to EQUAL the full-corpus q47: the oracle for this
    // query is q47's SQL verbatim (same decomposition argument as q51;
    // every corpus id < every batch id).
    "q52_embed_dedup_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val stats = embStats(s, d)
      val np = planesPerBand(stats.n)
      val t = (stats.maxId + 1L) * 4L / 5L
      val corpus = emb.filter(col("vec_id") < t)
      val batch = emb.filter(col("vec_id") >= t)
      // Subset band tables are filters of the ONE materialized index.
      val bands = materializedBands(s, d, emb, np)
      val droppedOld = confirmedDroppedIds(
        SaltedSelfPairs.pairs(bands.filter(col("vec_id") < t),
          Seq("band", "key"), "vec_id", MaxBucket).distinct(),
        corpus, corpus)
      val dropped = droppedOld
        .union(dedupAgainstDropped(corpus, batch, np,
          corpusBands = Some(bands.filter(col("vec_id") < t)),
          batchBands = Some(bands.filter(col("vec_id") >= t)))).distinct()
      emb.join(dropped, col("vec_id") === col("vec_b"), "left_outer")
        .select(col("vec_id"),
                when(col("vec_b").isNotNull, 1).otherwise(0).as("is_dropped"))
        .orderBy(col("vec_id"))
    }),

    // INCREMENTAL IVF assignment (the q51/q52 dedupAgainstDropped
    // discipline applied to ANN serving): the STANDING index — centroids
    // trained when only the first 80% of the id space existed (geometry
    // from the corpus subset's own n, init/sample drawn from corpus rows
    // only) — serves an arriving batch by per-row assignment against the
    // standing centroid table, WITHOUT retraining. The gate requires the
    // incremental assignment relation (standing ∪ newly-assigned) to
    // serve the q44 2-probe search with results EQUAL to assigning the
    // whole corpus against the standing centroids in one pass: the
    // oracle IS that full-pass SQL (ivfAssignCtesOver with the training
    // CTEs pinned to the corpus subset), so incremental ≡ full is
    // machine-checked, not asserted. Training cost stays O(corpus), the
    // batch pays only its own O(batch·√n) assignment — the index
    // build/serve split a production vector store runs on every
    // ingestion tick.
    "q188_ivf_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val stats = embStats(s, d)
      val t = (stats.maxId + 1L) * 4L / 5L
      val corpus = emb.filter(col("vec_id") < t)
      val batch = emb.filter(col("vec_id") >= t)
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents_inc|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        // One count per corpus per JVM (inside the memoized build): the
        // standing index's geometry derives from the corpus size AT BUILD
        // TIME, exactly as the oracle's params CTE counts the subset.
        trainIvfCentroids(corpus, corpus.count())
      }
      val standing = assignTo(corpus, cents)
      val arriving = assignTo(batch, cents)
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ivfSearch(standing.union(arriving), cents, qs, K, NProbe)
        .orderBy(col("q_id"), col("rank"))
    }),

    // HOT-CLUSTER SUB-SPLIT SERVE (the operator q112's is_hot flag calls
    // for — before this, a skewed corpus served its hottest posting list
    // from one task per probe): the SAME memoized index as q44, re-laid
    // as hash sub-lists sized to ≤ ~2× the even share (ivfSubSplits /
    // ivfSubSplitAssignments), probed via the exploded (cluster, sub)
    // keys. The q188/q190 "layout ≡ semantics" discipline: the oracle is
    // q44's flat-index SQL VERBATIM, so the sub-split layout is
    // machine-checked result-identical at every tier; the task-size bound
    // itself is spec-asserted on the adversarial skew tier
    // (IvfSubSplitSpec).
    "q196_ivf_subsplit_serve" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = embStats(s, d).n
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        trainIvfCentroids(emb, n)
      }
      // assigned feeds the split-size aggregate AND the sub-list relation
      // — one eager localCheckpoint instead of re-planning the assignment
      // argmax per consumer (same rationale as q210).
      val assigned = assignTo(emb, cents).localCheckpoint(true)
      val splits = ivfSubSplits(assigned)
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ivfSearchSubSplit(ivfSubSplitAssignments(assigned, splits), splits,
          cents, qs, K, NProbe)
        .orderBy(col("q_id"), col("rank"))
    }),

    // INCREMENTAL CENTROID REFRESH (the drift family's actuator — see
    // centroidRefresh): the SAME memoized index as q44 is audited against
    // its members' current fixed-point means, the most-drifted quarter of
    // occupied clusters takes the mean as its refreshed centroid, the rest
    // are REQUIRED unchanged — the oracle compares the refreshed centroid
    // ARRAYS element-wise against the full SQL re-derivation (training
    // CTEs verbatim + member means + the same rank rule), so a wrongly
    // touched undrifted centroid, a drifted one left stale, or any drifted
    // mean off by one element hash-fails at every tier. The refreshed
    // index's retrieval quality is gated by RecallFloorSpec.
    "q205_ivf_centroid_refresh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = embStats(s, d).n
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        trainIvfCentroids(emb, n)
      }
      centroidRefresh(assignTo(emb, cents), cents).orderBy(col("c_id"))
    }),

    // SERVE FROM THE REFRESHED INDEX (closes q205's refresh→serve loop —
    // before this gate the refreshed centroid table was produced and
    // recall-floor-spec'd but never driven through retrieval under the
    // per-round hash discipline): the q44 2-probe search runs with the
    // REFRESHED centroids as the probe relation while the standing
    // posting lists (assignments) stay as-is — exactly what an IVF serve
    // tier does between a centroid refresh and the next re-assignment
    // tick. The oracle re-derives the refreshed table from the training
    // CTEs verbatim (q205's chain) and serves through it with q44's
    // verbatim serve SQL — a probe ranked against a stale centroid, or a
    // refreshed array off by one element, reorders rows and hash-fails.
    "q210_ivf_refreshed_serve" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = embStats(s, d).n
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        trainIvfCentroids(emb, n)
      }
      // r19 A/B note: an eager localCheckpoint of `assigned` (it feeds the
      // refresh aggregate and the serve join) measured WORSE isolated
      // (1.85 → 2.2 s at an identical 21-job count — the runtime already
      // reuses the assignment subtree here); kept as-is.
      val assigned = assignTo(emb, cents)
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ivfSearch(assigned, refreshedCentroids(assigned, cents), qs, K, NProbe)
        .orderBy(col("q_id"), col("rank"))
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    // scoped to the k-means coarse quantizer's clusters — the THIRD
    // member of the embedding-dedup family (q47 buckets by LSH band
    // keys, q92 flags per-label outliers; this one scopes candidate
    // generation to the SAME trained IVF clusters q44 serves from, so
    // index build cost is shared/memoized). Candidate pairs are the
    // within-cluster self-join (SaltedSelfPairs: a hot cluster is
    // sub-split so no task owns more than ~MaxBucket² candidates — the
    // paper's per-cluster pairwise pass, made skew-safe), confirmed by
    // exact cosine ≥ DupCos. Keeper rule is the paper's: within a
    // duplicate neighborhood, KEEP the member with the LOWEST cosine to
    // its cluster centroid (farthest from the semantic mode — retains
    // the most diverse exemplar); a vector is dropped when ANY confirmed
    // neighbor precedes it in (cos_cent ASC, vec_id ASC) order. Both
    // engines evaluate cos_cent with the identical index-ordered double
    // fold, so the order comparison is bit-deterministic. Scale shape:
    // O(n·√n·d) assignment + Σ cluster_size² bounded pair confirms
    // (cluster balance audited by q112) — never corpus×corpus.
    "q189_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = embStats(s, d).n
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        trainIvfCentroids(emb, n)
      }
      semDedupVerdict(emb, cents).orderBy(col("vec_id"))
    }),

    // INCREMENTAL SemDeDup (q189's ingestion-tick form — the last
    // dedup-family member without a batch-vs-standing twin): the corpus
    // splits at the 80% id point, arrivals are assigned to the STANDING
    // memoized q189 centroids (no retraining — the same cents relation,
    // same MaterializeOnce key), and new candidate pairs are generated
    // only against standing members + the batch itself (salted rectangle
    // cross + salted self pairs). The oracle is q189's full-corpus SQL
    // VERBATIM, so incremental ≡ full is machine-checked per tier.
    "q190_semdedup_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val stats = embStats(s, d)
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        trainIvfCentroids(emb, stats.n)
      }
      val t = (stats.maxId + 1L) * 4L / 5L
      semDedupIncrementalVerdict(emb, cents, t).orderBy(col("vec_id"))
    }),

    // ANN recall gate: recall@K of the LSH (q39) and IVF (q44) indexes
    // against the exact ranking (q38), per query — the number that proves
    // the derived index geometry still retrieves. All three inputs are
    // deterministic gate queries; the composition is two keyed joins over
    // K·NumQueries rows. The denominator is the ACTUAL exact-result count
    // per query (not the constant K): on a corpus with ≤ K rows per query
    // the exact ranking is shorter than K and dividing by K would silently
    // understate recall (it could never reach 1.0).
    "q50_ann_recall" -> ((s, d) => {
      // r19 A/B note: an eager localCheckpoint of the exact ranking (it
      // feeds both hit joins and the denominator aggregate) measured WORSE
      // isolated (2.0 s / 25 jobs → 2.4 s / 30 jobs) — the three consumers
      // pipeline and partially share broadcasts at runtime, and the
      // barrier serializes them. Kept the recompute shape.
      val e = exactTopK(s, d).select(col("q_id"), col("vec_id"))
      def hits(ann: DataFrame, name: String): DataFrame =
        e.as("e").join(ann.select(col("q_id"), col("vec_id")).as("a"),
            col("e.q_id") === col("a.q_id") && col("e.vec_id") === col("a.vec_id"))
          .groupBy(col("e.q_id").as("q_id"))
          .agg(count(lit(1)).as(name))
      val lh = hits(lshTopK(s, d), "lh")
      val ih = hits(ivfTopK(s, d), "ih")
      e.groupBy(col("q_id")).agg(count(lit(1)).as("ne"))
        .join(lh, Seq("q_id"), "left_outer")
        .join(ih, Seq("q_id"), "left_outer")
        .select(col("q_id"),
          (coalesce(col("lh"), lit(0L)).cast("double") / col("ne")).as("recall_lsh"),
          (coalesce(col("ih"), lit(0L)).cast("double") / col("ne")).as("recall_ivf"))
        .orderBy(col("q_id"))
    }),

    // Semantic outlier detection (label-conditioned centroid distance —
    // the embedding-space cousin of q77/q82's scalar outlier scores):
    // per-label centroid as the per-dimension MEAN accumulated in
    // FIXED-POINT int64 (each element rounded to 1e-6 before summing),
    // so the centroid is bit-identical under any partitioning — float
    // summation order never reaches a verdict. Per-vector cosine to the
    // own-label centroid (index-ordered double fold), 6-dp rounded, and
    // cos_c < 0 flags the outlier (corpus-calibrated: 10-40% of vectors
    // across tiers, never vacuous). Scale shape: one (label, dim) keyed
    // shuffle agg — labels·dims rows — broadcast back; per-vector work
    // is one array fold, embarrassingly parallel.
    "q92_semantic_outliers" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val fp = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("xfp", round(col("x").cast("double") * 1000000).cast("long"))
      val cent = fp.groupBy(col("label"), col("dim"))
        .agg(sum(col("xfp")).as("sfp"), count(lit(1)).as("n"))
        .withColumn("c", col("sfp").cast("double") / 1000000.0 / col("n"))
      val carr = cent.groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          e => e.getField("c")).as("centroid"))
      emb.join(broadcast(carr), Seq("label"))
        .select(col("vec_id"), col("label"),
          round(Vectors.cosineHof(col("embedding"), col("centroid")), 6).as("cos_c"))
        .withColumn("is_outlier", col("cos_c") < 0.0)
        .orderBy(col("vec_id"))
    }),

    // Distributed PCA: top principal component of the embedding corpus by
    // the power method, ENTIRELY in exact integer arithmetic so the
    // component — and every per-vector projection score derived from it —
    // is bit-identical under any partitioning or join order (the
    // whitening / spectral-outlier screen of an embedding pipeline).
    // Shape: elements fix-pointed at 1e-6 (the q92 idiom) and centered
    // against per-dimension means; the dims×dims Gram matrix is ONE keyed
    // shuffle agg over the exploded (vec, i)×(vec, j) self-join — per-
    // vector fan-out is dims², the agg collapses to dims² rows with map-
    // side partial combine, so corpus size only scans, never widens.
    // Twelve power-method steps then run on the dims²-row aggregate
    // (64-row matvecs, the q88 unrolled-iteration shape; each step
    // localCheckpoints its 64-row state so the plan stays shallow —
    // the q59 idiom); normalization is pure integer division
    // (u div (max|u| div 1e12)), exact on both engines (both truncate
    // toward zero), and the decimal(38,0)/HUGEINT matvec products cannot
    // overflow at any corpus scale. Like q88's fixed 3-step PageRank,
    // the operator is DEFINED as a fixed 12-step refinement: both
    // engines run the same steps, so the gate is exact regardless of
    // spectral gap. Sign fixed at the largest-|component| dimension
    // (ties to lowest index). The projection join back to vectors is a
    // 64-row broadcast; output is one row per vector.
    "q99_pca_power" -> ((s, d) => {
      val T = 12
      val emb = Tables.embeddings(s, d)
      val xf = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .withColumn("xfp", expr("cast(round(cast(x as double) * 1000000) as bigint)"))
      val mean = xf.groupBy(col("i"))
        .agg(expr("cast(round(avg(xfp)) as bigint)").as("mfp"))
      val cent = xf.join(broadcast(mean), Seq("i"))
        .select(col("vec_id"), col("i"), (col("xfp") - col("mfp")).as("c"))
      val g = graft.operators.MaterializeOnce(
          s"pca_gram|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        cent.select(col("vec_id"), col("i").as("gi"), col("c").as("ca"))
          .join(cent.select(col("vec_id"), col("i").as("gj"), col("c").as("cb")),
            Seq("vec_id"))
          .groupBy(col("gi"), col("gj"))
          .agg(sum(expr("cast(ca as decimal(12,0)) * cast(cb as decimal(12,0))"))
            .as("g"))
      }
      var v = mean.select(col("i"),
        expr("cast(1000000000000 as decimal(38,0))").as("v"))
      for (_ <- 1 to T) {
        val u = g.join(v.select(col("i").as("gj"), col("v")), Seq("gj"))
          .groupBy(col("gi"))
          .agg(sum(expr("cast(g as decimal(38,0)) * v")).as("u"))
        val m = u.agg(max(abs(col("u"))).as("m"))
        v = u.join(broadcast(m), expr("true"))
          .select(col("gi").as("i"),
            expr("cast(u div (m div 1000000000000) as decimal(38,0))").as("v"))
          .localCheckpoint(true)
      }
      val ma = v.agg(max(abs(col("v"))).as("ma"))
      val sgn = v.join(broadcast(ma), expr("true"))
        .filter(abs(col("v")) === col("ma"))
        .agg(expr("min_by(CASE WHEN v > 0 THEN 1 ELSE -1 END, i)").as("sgn"))
      val vf = v.join(broadcast(sgn), expr("true"))
        .select(col("i"), expr("cast(v * sgn as decimal(38,0))").as("v"))
      val proj = cent.join(broadcast(vf), Seq("i"))
        .groupBy(col("vec_id"))
        .agg(sum(expr("cast(c as decimal(12,0)) * v")).as("pfp"))
      proj.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
        .select(col("vec_id"), col("label"),
          round(col("pfp").cast("double") / 1e18, 6).as("proj"),
          (abs(round(col("pfp").cast("double") / 1e18, 6)) > 0.75).as("is_extreme"))
        .orderBy(col("vec_id"))
    }),

    // Hard-negative mining (contrastive-training data prep): for each
    // query vector, the top-5 most-similar vectors with a DIFFERENT
    // label — the "looks similar, means different" pairs a contrastive
    // loss needs. Same scale shape as q38: the tiny query side broadcasts
    // across the corpus (whitelisted bounded-side NLJ, label-exclusion
    // predicate evaluated in the stream), exact cosine via the fused
    // native kernel, and per-query top-k goes through TopK.perKey
    // (per-partition heap + final merge), never a corpus-wide sort.
    "q100_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"))
      val scored = emb.join(broadcast(qs), col("label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
          Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
      TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
          5, col("vec_id"))
        .select(col("q_id"), col("q_label"), col("rank"), col("vec_id"),
          col("label"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Mutual-kNN similarity graph (the clustering / UMAP / label-prop
    // preprocessing structure): an edge (a, b) exists when b is in a's
    // top-5 AND a is in b's top-5 — mutuality prunes hub vectors'
    // asymmetric edges, the standard kNN-graph cleanup. See
    // mutualKnnEdges for the build; fully derived from the shared index
    // geometry, so the graph is deterministic at every tier.
    "q107_mutual_knn" -> ((s, d) =>
      mutualKnnEdges(s, d).orderBy(col("vec_a"), col("vec_b"))),

    // Label-propagation smoothing over the mutual-kNN graph (the label-
    // denoising / weak-supervision-cleanup stage: a vector whose graph
    // neighborhood consistently disagrees with its dataset label is
    // probably mislabeled): three SYNCHRONOUS iterations — fixed count,
    // like q88's PageRank and q99's power method, so the result is a
    // deterministic function of the graph, not of a convergence race —
    // of take-the-mode-of-neighbor-labels with a self-vote (damps
    // oscillation) and smallest-label tie-break. Each iteration is one
    // keyed join + two keyed aggs + a per-vector rank window over the
    // vote aggregate; edges come from the materialized q107 relation, so
    // the expensive graph build happens once per corpus.
    "q108_label_prop" -> ((s, d) => {
      val ed = mutualKnnEdges(s, d)
      val e = ed.select(col("vec_a").as("u"), col("vec_b").as("v"))
        .union(ed.select(col("vec_b").as("u"), col("vec_a").as("v")))
      val l0 = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      var lab = l0
      for (_ <- 1 to 3) {
        val votes = e.join(lab.withColumnRenamed("vec_id", "v"), Seq("v"))
          .select(col("u").as("vec_id"), col("label"))
          .groupBy(col("vec_id"), col("label")).agg(count(lit(1)).as("c"))
          .union(lab.select(col("vec_id"), col("label"), lit(1L).as("c")))
          .groupBy(col("vec_id"), col("label")).agg(sum(col("c")).as("c"))
        lab = votes.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("vec_id")).orderBy(col("c").desc, col("label"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("label"))
      }
      l0.join(lab.withColumnRenamed("label", "label_smooth"), Seq("vec_id"))
        .select(col("vec_id"), col("label").as("label_orig"), col("label_smooth"),
          (col("label") =!= col("label_smooth")).as("changed"))
        .orderBy(col("vec_id"))
    }),

    // IVF index-balance audit (the ops view of q44's index: a skewed
    // cluster-size distribution means hot probe partitions and wasted
    // scan at serve time). Reads the SAME materialized centroids as q44
    // (one training pass per corpus fingerprint), one keyed agg over the
    // assignment, and the 1-row (total, occupied-cluster-count) scalar
    // aggregate broadcast back (whitelisted NLJ). Output is ≤ √n rows;
    // balance = n_assigned·k/n (1.0 = perfectly even), is_hot flags > 2×
    // the even share — the signal that a 100 TB serving tier would
    // sub-split that cluster's posting list.
    "q112_ivf_balance" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = embStats(s, d).n
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        trainIvfCentroids(emb, n)
      }
      val sz = assignTo(emb, cents)
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_assigned"))
      val tot = sz.agg(sum(col("n_assigned")).as("n_total"),
        count(lit(1)).as("k_occ"))
      sz.join(broadcast(tot), expr("true"))
        .select(col("cluster").as("c_id"), col("n_assigned"),
          round(col("n_assigned").cast("double") / col("n_total"), 6)
            .as("share"),
          round(col("n_assigned").cast("double") * col("k_occ")
            / col("n_total"), 6).as("balance"))
        .withColumn("is_hot", col("balance") > 2.0)
        .orderBy(col("c_id"))
    }),

    // Label-cohesion audit: mean intra-label vs label-vs-rest cosine,
    // WITHOUT materializing any pair — the sum-vector identity
    // Σ_{i≠j} x_i·x_j = |Σx|² − Σ|x_i|² turns all-pairs mean similarity
    // into one O(n·d) fixed-point aggregate. Components quantize to
    // 1e-3 longs (identical rounding both engines); per-(label, dim)
    // sums, their squares and the label×global dots accumulate in
    // decimal(38,0)/HUGEINT so no scale overflows; the 64-row global
    // dim-sum relation and the 1-row corpus total broadcast back
    // (whitelisted NLJ). Output |labels| rows; doubles only in the final
    // ratios, rounded at 6 dp from identical integers.
    "q115_label_cohesion" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val fp = emb.select(col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("xfp", round(col("x").cast("double") * 1000.0).cast("long"))
      val sums = fp.groupBy(col("label"), col("dim"))
        .agg(sum(col("xfp")).as("sfp"))
      val sq = fp.groupBy(col("label"))
        .agg(sum(col("xfp") * col("xfp")).as("sq"))
      val gs = sums.groupBy(col("dim")).agg(sum(col("sfp")).as("gfp"))
      val perL = sums.join(broadcast(gs), Seq("dim"))
        .groupBy(col("label"))
        .agg(sum(expr("cast(sfp as decimal(38,0)) * sfp")).as("ss"),
          sum(expr("cast(sfp as decimal(38,0)) * gfp")).as("sg"))
      val nL = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))
      val tot = nL.agg(sum(col("n")).as("n_total"))
      perL.join(sq, Seq("label")).join(nL, Seq("label"))
        .join(broadcast(tot), expr("true"))
        .withColumn("ia", (col("ss") - col("sq")).cast("double") / 1e6
          / (col("n") * (col("n") - 1)))
        .withColumn("ie", (col("sg") - col("ss")).cast("double") / 1e6
          / (col("n") * (col("n_total") - col("n"))))
        .select(col("label"), col("n"), round(col("ia"), 6).as("intra_cos"),
          round(col("ie"), 6).as("inter_cos"),
          round(col("ia") - col("ie"), 6).as("cohesion"))
        .orderBy(col("label"))
    }),

    // Dimension-truncation recall audit (the matryoshka-embedding
    // question: how much of the top-10 survives serving only a prefix of
    // the vector?): recall@K of exact cosine search over the first 16
    // and 32 of the 64 dims against the full-dim exact ranking (q38's).
    // Same q50 composition discipline — three cosineTopK passes (query
    // side broadcast, corpus never shuffled), two keyed joins over
    // K·NumQueries rows. The number that sizes a 4×-cheaper serving tier
    // before anyone ships it.
    "q129_dim_truncation" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val e = cosineTopK(emb, qs, K).select(col("q_id"), col("vec_id"))
      def truncHits(dim: Int, name: String): DataFrame = {
        val embT = emb.select(col("vec_id"),
          slice(col("embedding"), 1, dim).as("embedding"))
        val qsT = qs.select(col("q_id"), slice(col("q_emb"), 1, dim).as("q_emb"))
        val a = cosineTopK(embT, qsT, K).select(col("q_id"), col("vec_id"))
        e.as("e").join(a.as("a"),
            col("e.q_id") === col("a.q_id") && col("e.vec_id") === col("a.vec_id"))
          .groupBy(col("e.q_id").as("q_id")).agg(count(lit(1)).as(name))
      }
      e.groupBy(col("q_id")).agg(count(lit(1)).as("ne"))
        .join(truncHits(16, "h16"), Seq("q_id"), "left_outer")
        .join(truncHits(32, "h32"), Seq("q_id"), "left_outer")
        .select(col("q_id"),
          (coalesce(col("h16"), lit(0L)).cast("double") / col("ne")).as("recall_d16"),
          (coalesce(col("h32"), lit(0L)).cast("double") / col("ne")).as("recall_d32"))
        .orderBy(col("q_id"))
    }),

    // Cross-label near-dup audit (the label-noise signal q108 smooths and
    // q115 scores in aggregate, surfaced as evidence: cosine-confirmed
    // near-dup pairs whose labels DISAGREE are either label errors or
    // boundary content): candidates from the SAME materialized band index
    // as q47 (salted band-key self-join — never all-pairs), exact-cosine
    // confirm, then one keyed agg to the |labels|²-bounded (label_a,
    // label_b) matrix with per-cell counts and the disagree flag.
    "q140_crosslabel_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val np = planesPerBand(embStats(s, d).n)
      val bd = materializedBands(s, d, emb, np)
      val cand = SaltedSelfPairs.pairs(bd, Seq("band", "key"), "vec_id", MaxBucket)
        .distinct()
      cand
        .join(emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
          col("label").as("la")), col("id_a") === col("ia"))
        .join(emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
          col("label").as("lb")), col("id_b") === col("ib"))
        .filter(Vectors.cosine(col("ea"), col("eb")) >= DupCos)
        .groupBy(least(col("la"), col("lb")).cast("long").as("label_a"),
          greatest(col("la"), col("lb")).cast("long").as("label_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("disagree", col("label_a") =!= col("label_b"))
        .orderBy(col("label_a"), col("label_b"))
    }),

    // Embedding isotropy audit (the embedding-health check before any
    // cosine-based retrieval: a large common-mean component or one
    // dominant variance direction silently degrades cosine ranking):
    // anisotropy = ‖mean‖² / E‖x‖² and the max per-dim variance share,
    // from ONE dims-bounded keyed agg over ×1e6-quantized components —
    // per-dim moments are exact int64 sums (order-independent under any
    // partitioning), per-dim derived terms are re-fixed-pointed ×1e12
    // before the cross-dim sums so no float accumulation order exists,
    // and the four output ratios divide exact integers once.
    "q147_embed_isotropy" -> ((s, d) => {
      val x = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("i", "x")))
        .withColumn("xq", expr("cast(round(x * 1e6) as bigint)"))
      val perDim = x.groupBy(col("i")).agg(
        sum(col("xq")).as("s"), sum(expr("xq * xq")).as("q"),
        count(lit(1)).as("n"))
      val p = perDim.select(col("n"),
        expr("cast(round(power(cast(s as double) / n / 1e6, 2) * 1e12) as bigint)")
          .as("mean_fp2"),
        expr("cast(round(cast(q as double) / n) as bigint)").as("msq_fp"))
      p.agg(max(col("n")).as("n_vectors"), count(lit(1)).as("dims"),
          sum(col("mean_fp2")).as("sm"), sum(col("msq_fp")).as("sq2"),
          max(expr("msq_fp - mean_fp2")).as("mx"),
          sum(expr("msq_fp - mean_fp2")).as("sv"))
        .select(col("n_vectors"), col("dims"),
          round(col("sm") / 1e12, 6).as("mean_norm_sq"),
          round(col("sq2") / 1e12, 6).as("mean_sq_norm"),
          round(expr("cast(sm as double) / sq2"), 6).as("anisotropy"),
          expr("case when sv > 0 then round(cast(mx as double) / sv, 6) end")
            .as("max_var_share"))
    }),

    // Int8-quantization recall audit (q69 bounds the per-element error of
    // the symmetric int8 quantizer; THIS measures what actually matters
    // for a serving tier — recall@K of ASYMMETRIC search (float queries
    // against the dequantized int8 corpus) vs the exact float ranking —
    // the q129 dim-truncation audit applied to the other 4×-compression
    // axis): corpus dequantized per-vector with q69's exact scale tree,
    // both rankings via the salted cosineTopK (query side broadcast,
    // never a corpus window), hits from one (q_id, vec_id) equi-join.
    "q162_quant_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val e = cosineTopK(emb, qs, K).select(col("q_id"), col("vec_id"))
      val embQ = emb
        .withColumn("scale",
          array_max(transform(col("embedding"), x => abs(x))).cast("double")
            / 127.0)
        .filter(col("scale") > 0)
        .select(col("vec_id"), transform(col("embedding"),
          x => round(x.cast("double") / col("scale")) * col("scale"))
          .as("embedding"))
      val a = cosineTopK(embQ, qs, K).select(col("q_id"), col("vec_id"))
      val hits = e.as("e").join(a.as("a"),
          col("e.q_id") === col("a.q_id") && col("e.vec_id") === col("a.vec_id"))
        .groupBy(col("e.q_id").as("q_id")).agg(count(lit(1)).as("h"))
      e.groupBy(col("q_id")).agg(count(lit(1)).as("ne"))
        .join(hits, Seq("q_id"), "left_outer")
        .select(col("q_id"),
          (coalesce(col("h"), lit(0L)).cast("double") / col("ne"))
            .as("recall_int8"))
        .orderBy(col("q_id"))
    }),

    // 1-NN label-agreement kappa (the label-noise SCORE beside q140's
    // pair evidence and q108's smoother: if a vector's nearest neighbor
    // usually wears a different label, the labels — or the embeddings —
    // are unreliable; Cohen's κ corrects raw agreement for the marginal
    // label distribution): approximate 1-NN from the SAME materialized
    // band index as q47/q140 (salted band-key self-join candidates, exact
    // cosine, per-vector rank-1 via the salted TopK — candidate-bounded
    // tasks, never all-pairs); agreement/marginal counts are exact int64
    // keyed aggs (|labels|-bounded), p_o/p_e/κ divide once in one
    // identical double tree per engine. Vectors with no LSH candidate are
    // unscored on BOTH engines (the band keys are replicated exactly).
    "q163_knn_label_kappa" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val np = planesPerBand(embStats(s, d).n)
      val bd = materializedBands(s, d, emb, np)
      val cand = SaltedSelfPairs.pairs(bd, Seq("band", "key"), "vec_id", MaxBucket)
        .distinct()
      val sc = cand
        .join(emb.select(col("vec_id").as("ia"), col("embedding").as("ea"),
          col("label").as("la")), col("id_a") === col("ia"))
        .join(emb.select(col("vec_id").as("ib"), col("embedding").as("eb"),
          col("label").as("lb")), col("id_b") === col("ib"))
        .select(col("id_a"), col("id_b"),
          col("la").cast("long").as("la"), col("lb").cast("long").as("lb"),
          Vectors.cosine(col("ea"), col("eb")).as("cos"))
      // Both pair orientations in ONE pass (the semDedupDrops explode
      // idiom): the former union of two projections re-planned the whole
      // salted pair-join + double embedding join + cosine subtree twice
      // (zero runtime exchange reuse, r19 plan audit).
      val dir = sc.select(explode(array(
          struct(col("id_a").as("a"), col("la").as("t"),
            col("id_b").as("nb"), col("lb").as("p"), col("cos")),
          struct(col("id_b").as("a"), col("lb").as("t"),
            col("id_a").as("nb"), col("la").as("p"), col("cos")))).as("o"))
        .select(col("o.a").as("a"), col("o.t").as("t"),
          col("o.nb").as("nb"), col("o.p").as("p"), col("o.cos").as("cos"))
      // s1 (one row per scored vector) feeds the label-marginal aggregate
      // AND the agreement aggregate — materialize the tiny relation once
      // per run (eager localCheckpoint, per-invocation RDD) instead of
      // re-running the whole 1-NN pipeline per branch.
      val s1 = graft.operators.TopK
        .perKey(dir, Seq("a"), Seq(col("cos").desc, col("nb")), 1, col("nb"))
        .select(col("a"), col("t"), col("p"))
        .localCheckpoint(true)
      // Both marginal roles in one pass (same explode idiom).
      val marg = s1.select(explode(array(
          struct(col("t").as("lab"), lit(1L).as("is_t"), lit(0L).as("is_p")),
          struct(col("p").as("lab"), lit(0L).as("is_t"), lit(1L).as("is_p")))).as("m"))
        .select(col("m.lab").as("lab"), col("m.is_t").as("is_t"), col("m.is_p").as("is_p"))
        .groupBy(col("lab"))
        .agg(sum(col("is_t")).as("tc"), sum(col("is_p")).as("pc"))
      val spe = marg.agg(sum(expr("tc * pc")).as("spe"))
      s1.agg(count(lit(1)).as("n_scored"),
          sum(when(col("t") === col("p"), 1L).otherwise(0L)).as("n_agree"))
        .join(broadcast(spe), expr("true"))
        .select(col("n_scored"), col("n_agree"),
          expr("round(cast(n_agree as double) / n_scored, 6)").as("po"),
          expr("round(cast(spe as double) / n_scored / n_scored, 6)").as("pe"),
          expr("case when 1 - cast(spe as double) / n_scored / n_scored > 0" +
            " then round((cast(n_agree as double) / n_scored" +
            " - cast(spe as double) / n_scored / n_scored)" +
            " / (1 - cast(spe as double) / n_scored / n_scored), 6) end")
            .as("kappa"))
    }),

    // Per-label centroid drift between vec_id-parity halves (the
    // embedding-space member of the drift family — q117 is score-PSI,
    // q155 is term-IDF; this asks whether each label's REGION moved
    // between two snapshots): per-(label, dim) component sums over
    // ×1e6-quantized values split by parity (one labels·dims-bounded
    // keyed agg — the q147 exactness discipline), then the cosine
    // between the two centroid vectors per label from exact decimal
    // dot/norm moments; counts divide out of the cosine so no division
    // happens before the final tree. Embarrassingly parallel at any
    // corpus size.
    "q170_label_centroid_drift" -> ((s, d) => {
      val x = Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          pmod(col("vec_id"), lit(2)).as("h"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .withColumn("xq", expr("cast(round(v * 1e6) as bigint)"))
      val pd = x.groupBy(col("label"), col("i")).agg(
        sum(when(col("h") === 0, col("xq")).otherwise(0L)).as("se"),
        sum(when(col("h") === 1, col("xq")).otherwise(0L)).as("so"),
        sum(when(col("h") === 0, 1L).otherwise(0L)).as("ne"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("no"))
      pd.groupBy(col("label")).agg(
          max(col("ne")).as("n_even"), max(col("no")).as("n_odd"),
          sum(expr("cast(se as decimal(18,0)) * cast(so as decimal(18,0))")).as("dot"),
          sum(expr("cast(se as decimal(18,0)) * cast(se as decimal(18,0))")).as("na"),
          sum(expr("cast(so as decimal(18,0)) * cast(so as decimal(18,0))")).as("nb"))
        .select(col("label"), col("n_even"), col("n_odd"),
          expr("case when na > 0 and nb > 0 then round(" +
            "cast(dot as double) / sqrt(cast(na as double))" +
            " / sqrt(cast(nb as double)), 6) end").as("centroid_cos"))
        .orderBy(col("label"))
    })
  )

  /** The mutual-kNN graph (q107's edge relation), materialized once per
    * (geometry, corpus fingerprint) and shared with the label-propagation
    * smoother (q108) — the index-build/serve split applied to the graph:
    * candidates from the standing band index (keyed equi-join, never
    * all-pairs), exact cosine on candidates, per-vector top-5 by a keyed
    * window (bounded per vector by its band-bucket population), and
    * mutuality by one keyed self-join of the ranked relation. */
  private def mutualKnnEdges(s: SparkSession, d: String): DataFrame =
    graft.operators.MaterializeOnce(
      s"mutual_knn|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
      val emb = Tables.embeddings(s, d)
      val np = planesPerBand(embStats(s, d).n)
      val bd = materializedBands(s, d, emb, np)
      val cand = bd.as("x").join(bd.as("y"),
          col("x.key") === col("y.key") && col("x.band") === col("y.band") &&
          col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b")).distinct()
      val scored = cand
        .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), Seq("a"))
        .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), Seq("b"))
        .select(col("a"), col("b"), Vectors.cosine(col("ea"), col("eb")).as("cos"))
      val dir = scored.union(
        scored.select(col("b").as("a"), col("a").as("b"), col("cos")))
      val ranked = dir.withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("a")).orderBy(col("cos").desc, col("b"))).cast("int"))
        .filter(col("rank") <= 5)
      val g = ranked.select(col("a").as("ga"), col("b").as("gb"),
        col("rank").as("rank_ba"))
      ranked.join(g, col("b") === col("ga") && col("a") === col("gb"))
        .filter(col("a") < col("b"))
        .select(col("a").as("vec_a"), col("b").as("vec_b"), col("cos"),
          col("rank").as("rank_ab"), col("rank_ba"))
    }

  val oracles: Map[String, String] = {
    // Index-order left fold, elements cast to double — mirrors
    // Vectors.dot/normSq exactly (list_reduce has no seed; Spark's fold
    // seeds 0.0, and 0.0 + x == x in IEEE for the first element).
    def dotSql(a: String, b: String): String =
      s"list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x + y)"
    def cosSql(q: String, e: String): String =
      s"${dotSql(q, e)} / sqrt(${dotSql(q, q)}) / sqrt(${dotSql(e, e)})"

    def planeLit(p: Seq[Double]): String =
      p.map(_.toString).mkString("[", ",", "]") + "::DOUBLE[]"
    def dotPlane(p: Seq[Double]): String =
      s"list_reduce(list_transform(generate_series(1, $Dim), i -> CAST(embedding[i] AS DOUBLE) * (${planeLit(p)})[i]), (x,y) -> x + y)"
    // Band key for band b: bit j set when embedding · pool[b·Max+j] > 0,
    // for the first `np` (derived) planes of the band's pool slice —
    // j ≥ np contributes 0, mirroring Vectors.lshBucket over pool.take(np).
    def bandKeySql(b: Int): String = (0 until MaxPlanesPerBand).map { j =>
      s"(CASE WHEN $j < p.np THEN (CASE WHEN ${dotPlane(pool(b * MaxPlanesPerBand + j))} > 0 THEN ${1L << j} ELSE 0 END) ELSE 0 END)"
    }.mkString(" + ")

    // The same build-time derivations as planesPerBand/numCentroids/
    // sampleThreshPpm, in exact integer SQL: ceil-log2 via binary-string
    // length of m-1; the sample threshold mirrors the Scala expression's
    // left-to-right integer ops ((30 * ncent) * 1000000) / n exactly.
    def paramsCteOver(rel: String) = s"""params AS (
          SELECT GREATEST(2, LEAST($MaxPlanesPerBand,
                   length(bin((COUNT(*) + ${TargetBucket - 1}) // $TargetBucket - 1)))) AS np,
                 GREATEST(16, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS ncent,
                 LEAST(1000000, ((30 * GREATEST(16, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))) * 1000000) // COUNT(*)) AS sthresh
          FROM $rel)"""
    val paramsCte = paramsCteOver("embeddings")

    // The q44 training-sample hash gate: first 8 md5 hex chars of
    // 'ivfs|<vec_id>' as a 32-bit int (mirrors TextFns.hash32), mod 1e6.
    val sampGate = (1 to 8).map { p =>
      s"(strpos('0123456789abcdef', substr(md5('ivfs|' || CAST(vec_id AS VARCHAR)), $p, 1)) - 1) * ${1L << (4 * (8 - p))}"
    }.mkString(" + ")

    val q38Sql = s"""
        WITH q AS (
          SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NumQueries),
        scored AS (
          SELECT q.q_id, e.vec_id, ${cosSql("q.q_emb", "e.embedding")} AS cos
          FROM q, embeddings e
          WHERE e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id, cos
        FROM ranked
        WHERE rank <= $K
        ORDER BY q_id, rank"""

    // Multi-band candidate generation (band-OR, same banding as q47), then
    // exact scoring of the distinct candidates — mirrors lshTopK.
    val q39Sql = s"""
        WITH $paramsCte,
        b AS (
          ${(0 until NumBands).map(b =>
            s"SELECT vec_id, $b AS band, CAST(${bandKeySql(b)} AS BIGINT) AS key FROM embeddings, params p")
            .mkString("\n          UNION ALL ")}),
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < $NumQueries),
        qb AS (
          SELECT vec_id AS q_id, band, key FROM b WHERE vec_id < $NumQueries),
        cand AS (
          SELECT DISTINCT qb.q_id, e.vec_id
          FROM qb JOIN b e ON e.band = qb.band AND e.key = qb.key
            AND e.vec_id <> qb.q_id),
        scored AS (
          SELECT c.q_id, c.vec_id, ${cosSql("q.q_emb", "e.embedding")} AS cos
          FROM cand c
          JOIN q ON q.q_id = c.q_id
          JOIN embeddings e ON e.vec_id = c.vec_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id, cos
        FROM ranked
        WHERE rank <= $K
        ORDER BY q_id, rank"""

    val q47Sql = s"""
        WITH $paramsCte,
        b AS (
          ${(0 until NumBands).map(b =>
            s"SELECT vec_id, $b AS band, CAST(${bandKeySql(b)} AS BIGINT) AS key FROM embeddings, params p")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
          FROM b x JOIN b y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
        dropped AS (
          SELECT DISTINCT c.vb
          FROM cand c
          JOIN embeddings ea ON ea.vec_id = c.va
          JOIN embeddings eb ON eb.vec_id = c.vb
          WHERE ${cosSql("ea.embedding", "eb.embedding")} >= $DupCos)
        SELECT e.vec_id,
               CASE WHEN d.vb IS NOT NULL THEN 1 ELSE 0 END AS is_dropped
        FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vb
        ORDER BY e.vec_id"""

    // q140: q47's candidate/confirm CTEs, aggregated to the label-pair
    // matrix instead of the drop verdict.
    val q140Sql = s"""
        WITH $paramsCte,
        b AS (
          ${(0 until NumBands).map(b =>
            s"SELECT vec_id, $b AS band, CAST(${bandKeySql(b)} AS BIGINT) AS key FROM embeddings, params p")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
          FROM b x JOIN b y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
        conf AS (
          SELECT LEAST(ea.label, eb.label) AS label_a,
                 GREATEST(ea.label, eb.label) AS label_b
          FROM cand c
          JOIN embeddings ea ON ea.vec_id = c.va
          JOIN embeddings eb ON eb.vec_id = c.vb
          WHERE ${cosSql("ea.embedding", "eb.embedding")} >= $DupCos)
        SELECT label_a, label_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               label_a <> label_b AS disagree
        FROM conf GROUP BY 1, 2
        ORDER BY label_a, label_b"""

    // Shared IVF train+assign CTE prefix (through `assigned`) — the q44
    // serve path and the q112 balance audit read the same index. The
    // TRAINING relation is a parameter: q44/q112 train on the full
    // embeddings table; q188 trains on the standing-corpus subset (the
    // index built before the batch arrived) while `aF` still assigns the
    // FULL table — which is exactly the incremental-assignment identity
    // the q188 gate machine-checks.
    def ivfAssignCtesOver(trainRel: String, prelude: String): String = {
      // One Lloyd round as CTEs: assignment against centroid relation
      // `prev` -> fixed-point per-dimension means -> centroid relation
      // `next`, over the deterministic training SAMPLE (the full corpus is
      // only assigned once, in aF). Mean expression order mirrors the
      // Spark side exactly: CAST(sum AS DOUBLE) / count / 1e6.
      def lloyd(i: Int, prev: String, next: String): String = s"""
        a$i AS (
          SELECT e.vec_id, e.embedding, c.c_id,
                 ${cosSql("e.embedding", "c.c_emb")} AS sim
          FROM samp e, $prev c),
        s$i AS (
          SELECT vec_id, embedding, c_id AS cluster FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn
            FROM a$i)
          WHERE rn = 1),
        m$i AS (
          SELECT cluster, i,
                 SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
                 COUNT(*) AS cnt
          FROM s$i, generate_series(1, $Dim) t(i)
          GROUP BY cluster, i),
        $next AS (
          SELECT cluster AS c_id,
                 list(CAST(s AS DOUBLE) / cnt / 1000000.0 ORDER BY i) AS c_emb
          FROM m$i
          GROUP BY cluster)"""
      s"""
        WITH $prelude${paramsCteOver(trainRel)},
        samp AS (
          SELECT vec_id, embedding FROM $trainRel, params p
          WHERE CAST($sampGate AS BIGINT) % 1000000 < p.sthresh),
        c0 AS (
          SELECT vec_id AS c_id, embedding AS c_emb FROM $trainRel, params p
          WHERE vec_id < p.ncent),
        ${lloyd(1, "c0", "c1")},
        ${lloyd(2, "c1", "c")},
        aF AS (
          SELECT e.vec_id, e.embedding, c.c_id,
                 ${cosSql("e.embedding", "c.c_emb")} AS sim
          FROM embeddings e, c),
        assigned AS (
          SELECT vec_id, embedding, c_id AS cluster FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn
            FROM aF)
          WHERE rn = 1)"""
    }
    val ivfAssignCtes = ivfAssignCtesOver("embeddings", "")

    val q44Sql = s"""$ivfAssignCtes,
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NumQueries),
        p0 AS (
          SELECT q.q_id, q.q_emb, c.c_id,
                 ${cosSql("q.q_emb", "c.c_emb")} AS sim
          FROM q, c),
        probed AS (
          SELECT q_id, q_emb, c_id AS probe_cluster FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
            FROM p0)
          WHERE rn <= $NProbe),
        scored AS (
          SELECT p.q_id, a.vec_id, ${cosSql("p.q_emb", "a.embedding")} AS cos
          FROM probed p JOIN assigned a
            ON a.cluster = p.probe_cluster AND a.vec_id <> p.q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id, cos
        FROM ranked
        WHERE rank <= $K
        ORDER BY q_id, rank"""

    // q188's twin: the SAME serve SQL, but the training CTEs draw from
    // the standing-corpus subset (ids below the 80% watermark, geometry
    // from that subset's count) while aF still assigns the FULL table —
    // i.e. the one-pass formulation the incremental Spark path must equal.
    val q188Sql = {
      val prelude = """tsplit AS (SELECT (MAX(vec_id) + 1) * 4 // 5 AS t FROM embeddings),
        corpus AS (SELECT e.vec_id, e.embedding FROM embeddings e, tsplit WHERE e.vec_id < tsplit.t),
        """
      s"""${ivfAssignCtesOver("corpus", prelude)},
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NumQueries),
        p0 AS (
          SELECT q.q_id, q.q_emb, c.c_id,
                 ${cosSql("q.q_emb", "c.c_emb")} AS sim
          FROM q, c),
        probed AS (
          SELECT q_id, q_emb, c_id AS probe_cluster FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
            FROM p0)
          WHERE rn <= $NProbe),
        scored AS (
          SELECT p.q_id, a.vec_id, ${cosSql("p.q_emb", "a.embedding")} AS cos
          FROM probed p JOIN assigned a
            ON a.cluster = p.probe_cluster AND a.vec_id <> p.q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id, cos
        FROM ranked
        WHERE rank <= $K
        ORDER BY q_id, rank"""
    }

    // q189's twin: the q44 assignment CTEs verbatim, then the paper's
    // cluster-scoped pairwise pass — within-cluster pairs confirmed at
    // DupCos, keeper = (cos_cent ASC, vec_id ASC) minimum of each
    // confirmed neighborhood. cos_cent is the same index-ordered double
    // fold both engines evaluate, so the order comparison agrees
    // bit-for-bit.
    val q189Sql = s"""$ivfAssignCtes,
        cc AS (
          SELECT a.vec_id, a.embedding, a.cluster,
                 ${cosSql("a.embedding", "c.c_emb")} AS cos_cent
          FROM assigned a JOIN c ON c.c_id = a.cluster),
        cand AS (
          SELECT x.vec_id AS va, y.vec_id AS vb
          FROM assigned x JOIN assigned y
            ON x.cluster = y.cluster AND x.vec_id < y.vec_id
          WHERE ${cosSql("x.embedding", "y.embedding")} >= $DupCos),
        orient AS (
          SELECT va AS x, vb AS y FROM cand
          UNION ALL
          SELECT vb AS x, va AS y FROM cand),
        dropped AS (
          SELECT DISTINCT o.x
          FROM orient o
          JOIN cc cx ON cx.vec_id = o.x
          JOIN cc cy ON cy.vec_id = o.y
          WHERE cy.cos_cent < cx.cos_cent
             OR (cy.cos_cent = cx.cos_cent AND o.y < o.x))
        SELECT cc.vec_id, cc.cluster, cc.cos_cent,
               CASE WHEN d.x IS NOT NULL THEN 1 ELSE 0 END AS is_dropped
        FROM cc LEFT JOIN dropped d ON d.x = cc.vec_id
        ORDER BY cc.vec_id"""

    // q205's twin: the q44 training/assignment CTEs verbatim, then the
    // member means re-derived with the SAME fixed-point arithmetic as the
    // Spark lloydStep, the same deterministic drift cosine, and the same
    // most-drifted-quarter rank rule — the refreshed centroid ARRAYS are
    // compared element-wise, so undrifted centroids must be bit-identical
    // to the standing index and drifted ones bit-identical to their means.
    val q205Sql = s"""$ivfAssignCtes,
        mz AS (
          SELECT cluster, i,
                 SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
                 COUNT(*) AS cnt
          FROM assigned, generate_series(1, $Dim) t(i)
          GROUP BY cluster, i),
        means AS (
          SELECT cluster AS c_id, MAX(cnt) AS n_members,
                 list(CAST(s AS DOUBLE) / cnt / 1000000.0 ORDER BY i) AS m_emb
          FROM mz GROUP BY cluster),
        dr AS (
          SELECT c.c_id, m.n_members, c.c_emb, m.m_emb,
                 ${cosSql("c.c_emb", "m.m_emb")} AS drift_cos
          FROM c JOIN means m ON m.c_id = c.c_id),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY drift_cos ASC, c_id) AS rn,
                 COUNT(*) OVER () AS k_occ
          FROM dr)
        SELECT c_id, n_members,
               ROUND(drift_cos, 6) AS drift_cos,
               CAST(CASE WHEN rn <= GREATEST(1, k_occ // 4) THEN 1 ELSE 0 END AS INT) AS is_drifted,
               array_to_string(list_transform(
                 CASE WHEN rn <= GREATEST(1, k_occ // 4) THEN m_emb ELSE c_emb END,
                 x -> CAST(ROUND(x * 1000000000.0) AS BIGINT)), ',') AS refreshed
        FROM rk
        ORDER BY c_id"""

    // q205's refresh chain re-derived, then q44's serve SQL verbatim with
    // the refreshed relation as the probe set (posting lists standing).
    val q210Sql = s"""$ivfAssignCtes,
        mz AS (
          SELECT cluster, i,
                 SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS s,
                 COUNT(*) AS cnt
          FROM assigned, generate_series(1, $Dim) t(i)
          GROUP BY cluster, i),
        means AS (
          SELECT cluster AS c_id, MAX(cnt) AS n_members,
                 list(CAST(s AS DOUBLE) / cnt / 1000000.0 ORDER BY i) AS m_emb
          FROM mz GROUP BY cluster),
        dr AS (
          SELECT c.c_id, c.c_emb, m.m_emb,
                 ${cosSql("c.c_emb", "m.m_emb")} AS drift_cos
          FROM c JOIN means m ON m.c_id = c.c_id),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY drift_cos ASC, c_id) AS rn,
                 COUNT(*) OVER () AS k_occ
          FROM dr),
        cn AS (
          SELECT c_id,
                 CASE WHEN rn <= GREATEST(1, k_occ // 4) THEN m_emb ELSE c_emb END AS c_emb
          FROM rk),
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NumQueries),
        p0 AS (
          SELECT q.q_id, q.q_emb, c.c_id,
                 ${cosSql("q.q_emb", "c.c_emb")} AS sim
          FROM q, cn c),
        probed AS (
          SELECT q_id, q_emb, c_id AS probe_cluster FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
            FROM p0)
          WHERE rn <= $NProbe),
        scored AS (
          SELECT p.q_id, a.vec_id, ${cosSql("p.q_emb", "a.embedding")} AS cos
          FROM probed p JOIN assigned a
            ON a.cluster = p.probe_cluster AND a.vec_id <> p.q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id, cos
        FROM ranked
        WHERE rank <= $K
        ORDER BY q_id, rank"""

    // Recall@K of each approximate index against the exact ranking —
    // the three inputs are the gate queries above, composed as subqueries
    // (DuckDB scopes each subquery's WITH independently). Denominator =
    // actual exact-result count per query, not the literal K (see the
    // Spark twin's comment).
    val q50Sql = s"""
        WITH exact AS (SELECT q_id, vec_id FROM ($q38Sql)),
        lshr AS (SELECT q_id, vec_id FROM ($q39Sql)),
        ivfr AS (SELECT q_id, vec_id FROM ($q44Sql)),
        lh AS (
          SELECT e.q_id, COUNT(*) AS h FROM exact e
          JOIN lshr a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
          GROUP BY e.q_id),
        ih AS (
          SELECT e.q_id, COUNT(*) AS h FROM exact e
          JOIN ivfr a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
          GROUP BY e.q_id),
        qs AS (SELECT q_id, COUNT(*) AS ne FROM exact GROUP BY q_id)
        SELECT q.q_id,
               CAST(COALESCE(lh.h, 0) AS DOUBLE) / q.ne AS recall_lsh,
               CAST(COALESCE(ih.h, 0) AS DOUBLE) / q.ne AS recall_ivf
        FROM qs q
        LEFT JOIN lh ON lh.q_id = q.q_id
        LEFT JOIN ih ON ih.q_id = q.q_id
        ORDER BY q.q_id"""

    // Exact top-K over a DIM-prefix truncation of the vectors (q129):
    // the q38 chain with embedding[1:dim] on both sides; the cosine is
    // the same dotSql fold, just over the shorter list.
    def truncTopSql(dim: Int): String = s"""
        WITH q AS (
          SELECT vec_id AS q_id, embedding[1:$dim] AS q_emb
          FROM embeddings WHERE vec_id < $NumQueries),
        scored AS (
          SELECT q.q_id, e.vec_id, ${cosSql("q.q_emb", s"e.embedding[1:$dim]")} AS cos
          FROM q, embeddings e
          WHERE e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, vec_id FROM ranked WHERE rank <= $K"""

    // Recall of the truncated rankings against the full-dim exact top-K
    // (the q50 composition over q129's inputs).
    val q129Sql = s"""
        WITH exact AS (SELECT q_id, vec_id FROM ($q38Sql)),
        t16 AS (SELECT q_id, vec_id FROM (${truncTopSql(16)})),
        t32 AS (SELECT q_id, vec_id FROM (${truncTopSql(32)})),
        h16 AS (
          SELECT e.q_id, COUNT(*) AS h FROM exact e
          JOIN t16 a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
          GROUP BY e.q_id),
        h32 AS (
          SELECT e.q_id, COUNT(*) AS h FROM exact e
          JOIN t32 a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
          GROUP BY e.q_id),
        qs AS (SELECT q_id, COUNT(*) AS ne FROM exact GROUP BY q_id)
        SELECT q.q_id,
               CAST(COALESCE(h16.h, 0) AS DOUBLE) / q.ne AS recall_d16,
               CAST(COALESCE(h32.h, 0) AS DOUBLE) / q.ne AS recall_d32
        FROM qs q
        LEFT JOIN h16 ON h16.q_id = q.q_id
        LEFT JOIN h32 ON h32.q_id = q.q_id
        ORDER BY q.q_id"""

    // CTE chain producing the mutual-kNN edge relation
    // `mut(a, b, cos, rank_ab, rank_ba)` — shared by q107 and q108.
    val mutualCtes = s"""
        WITH $paramsCte,
        b AS (
          ${(0 until NumBands).map(b =>
            s"SELECT vec_id, $b AS band, CAST(${bandKeySql(b)} AS BIGINT) AS key FROM embeddings, params p")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM b x JOIN b y
            ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
        sc AS (
          SELECT c.a, c.b, ${cosSql("ea.embedding", "eb.embedding")} AS cos
          FROM cand c
          JOIN embeddings ea ON ea.vec_id = c.a
          JOIN embeddings eb ON eb.vec_id = c.b),
        dir AS (
          SELECT a, b, cos FROM sc
          UNION ALL SELECT b AS a, a AS b, cos FROM sc),
        rk AS (
          SELECT a, b, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY a
                   ORDER BY cos DESC, b) AS INTEGER) AS rank
          FROM dir),
        f AS (SELECT * FROM rk WHERE rank <= 5),
        mut AS (
          SELECT f.a, f.b, f.cos, f.rank AS rank_ab, g.rank AS rank_ba
          FROM f JOIN f g ON f.b = g.a AND f.a = g.b
          WHERE f.a < f.b)"""

    // Top-K over the dequantized int8 corpus (q69's exact scale tree:
    // scale = list_max(|x|)/127, dequant = round(x/scale)·scale), float
    // queries — the asymmetric serving ranking q162 audits.
    val quantTopSql = s"""
        WITH qe AS (
          SELECT vec_id,
                 list_transform(embedding, x -> round(CAST(x AS DOUBLE)
                   / (CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE) / 127.0))
                   * (CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE) / 127.0)) AS embedding
          FROM embeddings
          WHERE CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE) / 127.0 > 0),
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $NumQueries),
        scored AS (
          SELECT q.q_id, e.vec_id, ${cosSql("q.q_emb", "e.embedding")} AS cos
          FROM q, qe e
          WHERE e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, vec_id FROM ranked WHERE rank <= $K"""

    val q162Sql = s"""
        WITH exact AS (SELECT q_id, vec_id FROM ($q38Sql)),
        qt AS (SELECT q_id, vec_id FROM ($quantTopSql)),
        h AS (
          SELECT e.q_id, COUNT(*) AS h FROM exact e
          JOIN qt a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
          GROUP BY e.q_id),
        qs AS (SELECT q_id, COUNT(*) AS ne FROM exact GROUP BY q_id)
        SELECT q.q_id,
               CAST(COALESCE(h.h, 0) AS DOUBLE) / q.ne AS recall_int8
        FROM qs q
        LEFT JOIN h ON h.q_id = q.q_id
        ORDER BY q.q_id"""

    // q163: the mutualCtes band/candidate/score chain, directed both
    // ways, rank-1 per vector, then the exact-integer kappa census.
    val q163Sql = s"""
        WITH $paramsCte,
        b AS (
          ${(0 until NumBands).map(b =>
            s"SELECT vec_id, $b AS band, CAST(${bandKeySql(b)} AS BIGINT) AS key FROM embeddings, params p")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM b x JOIN b y
            ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
        sc AS (
          SELECT c.a, c.b, CAST(ea.label AS BIGINT) AS la, CAST(eb.label AS BIGINT) AS lb,
                 ${cosSql("ea.embedding", "eb.embedding")} AS cos
          FROM cand c
          JOIN embeddings ea ON ea.vec_id = c.a
          JOIN embeddings eb ON eb.vec_id = c.b),
        dir AS (
          SELECT a, la AS t, b AS nb, lb AS p, cos FROM sc
          UNION ALL SELECT b AS a, lb AS t, a AS nb, la AS p, cos FROM sc),
        rk AS (
          SELECT a, t, p,
                 ROW_NUMBER() OVER (PARTITION BY a ORDER BY cos DESC, nb) AS rnk
          FROM dir),
        s1 AS (SELECT a, t, p FROM rk WHERE rnk = 1),
        marg AS (
          SELECT lab, CAST(SUM(is_t) AS BIGINT) AS tc, CAST(SUM(is_p) AS BIGINT) AS pc
          FROM (SELECT t AS lab, 1 AS is_t, 0 AS is_p FROM s1
                UNION ALL SELECT p AS lab, 0 AS is_t, 1 AS is_p FROM s1)
          GROUP BY lab),
        spe AS (SELECT CAST(SUM(tc * pc) AS BIGINT) AS spe FROM marg),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
                 CAST(SUM(CASE WHEN t = p THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
          FROM s1)
        SELECT n_scored, n_agree,
               ROUND(CAST(n_agree AS DOUBLE) / n_scored, 6) AS po,
               ROUND(CAST(spe AS DOUBLE) / n_scored / n_scored, 6) AS pe,
               CASE WHEN 1 - CAST(spe AS DOUBLE) / n_scored / n_scored > 0
                    THEN ROUND((CAST(n_agree AS DOUBLE) / n_scored
                      - CAST(spe AS DOUBLE) / n_scored / n_scored)
                      / (1 - CAST(spe AS DOUBLE) / n_scored / n_scored), 6) END AS kappa
        FROM tot CROSS JOIN spe"""

    Map(
      "q38_cosine_topk" -> q38Sql,
      "q39_ann_lsh" -> q39Sql,
      "q47_embed_dedup" -> q47Sql,
      "q140_crosslabel_neardup" -> q140Sql,

      // Same ×1e6 per-component quantization, same exact per-dim moment
      // sums, same ×1e12 re-fixed-pointing before the cross-dim sums.
      "q147_embed_isotropy" -> s"""
        WITH x AS (
          SELECT i, CAST(ROUND(embedding[i] * 1e6) AS BIGINT) AS xq
          FROM embeddings, generate_series(1, $Dim) t(i)),
        d AS (
          SELECT i, CAST(SUM(xq) AS BIGINT) AS s,
                 CAST(SUM(xq * xq) AS BIGINT) AS q,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM x GROUP BY 1),
        p AS (
          SELECT n,
                 CAST(ROUND(POWER(CAST(s AS DOUBLE) / n / 1e6, 2) * 1e12) AS BIGINT) AS mean_fp2,
                 CAST(ROUND(CAST(q AS DOUBLE) / n) AS BIGINT) AS msq_fp
          FROM d),
        a AS (
          SELECT CAST(MAX(n) AS BIGINT) AS n_vectors,
                 CAST(COUNT(*) AS BIGINT) AS dims,
                 CAST(SUM(mean_fp2) AS BIGINT) AS sm,
                 CAST(SUM(msq_fp) AS BIGINT) AS sq2,
                 CAST(MAX(msq_fp - mean_fp2) AS BIGINT) AS mx,
                 CAST(SUM(msq_fp - mean_fp2) AS BIGINT) AS sv
          FROM p)
        SELECT n_vectors, dims,
               ROUND(sm / 1e12, 6) AS mean_norm_sq,
               ROUND(sq2 / 1e12, 6) AS mean_sq_norm,
               ROUND(CAST(sm AS DOUBLE) / sq2, 6) AS anisotropy,
               CASE WHEN sv > 0 THEN ROUND(CAST(mx AS DOUBLE) / sv, 6) END AS max_var_share
        FROM a""",
      // The incremental path must reproduce the full-corpus dedup exactly
      // — same oracle as q47, enforced by the gate's hash compare.
      "q52_embed_dedup_incremental" -> q47Sql,
      "q44_ann_ivf" -> q44Sql,
      // Sub-split layout serve: the flat-index oracle VERBATIM — a layout
      // change must never change a result.
      "q196_ivf_subsplit_serve" -> q44Sql,
      "q188_ivf_incremental" -> q188Sql,
      "q205_ivf_centroid_refresh" -> q205Sql,
      "q210_ivf_refreshed_serve" -> q210Sql,
      "q189_semdedup" -> q189Sql,
      // Incremental ≡ full is THE contract: q190 gates against q189's
      // full-corpus SQL verbatim (the q51/q52/q188 oracle-identity
      // discipline).
      "q190_semdedup_incremental" -> q189Sql,
      "q50_ann_recall" -> q50Sql,
      "q129_dim_truncation" -> q129Sql,
      "q162_quant_recall" -> q162Sql,
      "q163_knn_label_kappa" -> q163Sql,

      // q170's twin: same parity split, ×1e6 quantization, HUGEINT
      // moments, identical final cosine tree.
      "q170_label_centroid_drift" -> s"""
        WITH x AS (
          SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS h, i,
                 CAST(ROUND(embedding[i] * 1e6) AS BIGINT) AS xq
          FROM embeddings, generate_series(1, $Dim) t(i)),
        pd AS (
          SELECT label, i,
                 CAST(SUM(CASE WHEN h = 0 THEN xq ELSE 0 END) AS BIGINT) AS se,
                 CAST(SUM(CASE WHEN h = 1 THEN xq ELSE 0 END) AS BIGINT) AS so,
                 CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ne,
                 CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS no
          FROM x GROUP BY 1, 2),
        g AS (
          SELECT label, CAST(MAX(ne) AS BIGINT) AS n_even,
                 CAST(MAX(no) AS BIGINT) AS n_odd,
                 SUM(CAST(se AS HUGEINT) * so) AS dot,
                 SUM(CAST(se AS HUGEINT) * se) AS na,
                 SUM(CAST(so AS HUGEINT) * so) AS nb
          FROM pd GROUP BY 1)
        SELECT label, n_even, n_odd,
               CASE WHEN na > 0 AND nb > 0 THEN ROUND(
                 CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE))
                 / sqrt(CAST(nb AS DOUBLE)), 6) END AS centroid_cos
        FROM g ORDER BY label""",

      // Mirrors the Spark HOFs op-for-op (round half-away-from-zero in
      // both engines; list_max is order-free; the cosine is the exact
      // dotSql fold) — the booleans must come out TRUE from the same
      // IEEE sequence, and dim/scale pin the quantizer geometry exactly.
      "q69_embed_quantize_bound" -> s"""
        WITH q AS (
          SELECT vec_id,
                 CAST(len(embedding) AS INTEGER) AS dim,
                 CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0 AS scale,
                 embedding
          FROM embeddings),
        r AS (
          SELECT vec_id, dim, scale, embedding,
                 list_transform(embedding, x -> round(CAST(x AS DOUBLE) / scale) * scale) AS deq
          FROM q WHERE scale > 0)
        SELECT vec_id, dim, scale,
               list_max(list_transform(generate_series(1, dim),
                 i -> abs(CAST(embedding[i] AS DOUBLE) - deq[i]))) <= scale / 2 * 1.000000001 AS err_ok,
               ${cosSql("embedding", "deq")} >= 0.999 AS cos_ok
        FROM r ORDER BY vec_id""",

      // Same fixed-point centroid (round-to-1e-6 longs summed exactly,
      // HUGEINT absorbing DuckDB's SUM), same ordered-list assembly, and
      // the cosine is the exact dotSql fold over (float, double) arrays
      // cast to double on both engines; cos_c compared AFTER 6-dp round.
      "q92_semantic_outliers" -> s"""
        WITH fp AS (
          SELECT label, i - 1 AS dim,
                 CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xfp
          FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
        cent AS (
          SELECT label, dim, CAST(SUM(xfp) AS BIGINT) AS sfp, COUNT(*) AS n
          FROM fp GROUP BY 1, 2),
        carr AS (
          SELECT label, list(CAST(sfp AS DOUBLE) / 1000000.0 / n ORDER BY dim) AS centroid
          FROM cent GROUP BY label),
        sc AS (
          SELECT e.vec_id, e.label,
                 ROUND(${cosSql("e.embedding", "c.centroid")}, 6) AS cos_c
          FROM embeddings e JOIN carr c USING (label))
        SELECT vec_id, label, cos_c, cos_c < 0.0 AS is_outlier
        FROM sc ORDER BY vec_id""",

      // The same exact-integer pipeline as the Spark twin: 1e-6 fixed-
      // point elements, integer-rounded per-dimension means, HUGEINT Gram
      // accumulation (mirrors decimal(38,0)), twelve unrolled power-method
      // steps with the SAME integer normalization u // (max|u| // 1e12)
      // (both engines truncate toward zero), the same largest-|component|
      // sign rule, and the projection rounded from the exact integer at
      // the very end. CTEs are MATERIALIZED: each step feeds two
      // consumers, and inlined expansion would be exponential in steps.
      "q99_pca_power" -> {
        val S = 1000000000000L
        val iters = (1 to 12).map { t =>
          val prev = if (t == 1) "v0" else s"v${t - 1}"
          s"""u$t AS MATERIALIZED (
          SELECT g.gi, SUM(CAST(g.g AS HUGEINT) * $prev.v) AS u
          FROM g JOIN $prev ON g.gj = $prev.i GROUP BY g.gi),
        m$t AS MATERIALIZED (SELECT MAX(ABS(u)) AS m FROM u$t),
        v$t AS MATERIALIZED (
          SELECT gi AS i, CAST(u // (m // $S) AS HUGEINT) AS v FROM u$t, m$t)"""
        }.mkString(",\n        ")
        s"""
        WITH xf AS MATERIALIZED (
          SELECT vec_id, CAST(i AS INTEGER) - 1 AS i,
                 CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xfp
          FROM (SELECT vec_id, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i FROM embeddings)),
        mean AS MATERIALIZED (
          SELECT i, CAST(ROUND(AVG(xfp)) AS BIGINT) AS mfp FROM xf GROUP BY i),
        c AS MATERIALIZED (
          SELECT vec_id, xf.i, xfp - mfp AS c FROM xf JOIN mean USING (i)),
        g AS MATERIALIZED (
          SELECT a.i AS gi, b.i AS gj, SUM(CAST(a.c AS HUGEINT) * b.c) AS g
          FROM c a JOIN c b USING (vec_id) GROUP BY a.i, b.i),
        v0 AS (SELECT i, CAST($S AS HUGEINT) AS v FROM mean),
        $iters,
        mx AS (SELECT MAX(ABS(v)) AS ma FROM v12),
        sg AS (SELECT MIN(i) AS si FROM v12, mx WHERE ABS(v) = ma),
        sgn AS (SELECT CASE WHEN v > 0 THEN 1 ELSE -1 END AS s
                FROM v12, sg WHERE i = si),
        vf AS MATERIALIZED (SELECT i, v * s AS v FROM v12, sgn),
        proj AS (
          SELECT c.vec_id, SUM(CAST(c.c AS HUGEINT) * vf.v) AS pfp
          FROM c JOIN vf USING (i) GROUP BY c.vec_id)
        SELECT e.vec_id, e.label, ROUND(CAST(pfp AS DOUBLE) / 1e18, 6) AS proj,
               ABS(ROUND(CAST(pfp AS DOUBLE) / 1e18, 6)) > 0.75 AS is_extreme
        FROM proj JOIN embeddings e USING (vec_id)
        ORDER BY e.vec_id"""
      },

      // Same unrounded cosine fold as q38's oracle, label-exclusion in
      // the predicate, ties broken by vec_id under the rank.
      "q100_hard_negatives" -> s"""
        WITH q AS (
          SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
          FROM embeddings WHERE vec_id < $NumQueries),
        scored AS (
          SELECT q.q_id, q.q_label, e.vec_id, e.label,
                 ${cosSql("q.q_emb", "e.embedding")} AS cos
          FROM q, embeddings e
          WHERE e.label <> q.q_label),
        ranked AS (
          SELECT q_id, q_label, vec_id, label, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, q_label, rank, vec_id, label, cos
        FROM ranked WHERE rank <= 5
        ORDER BY q_id, rank""",

      // Same band index (paramsCte + the identical plane pool), same
      // unrounded cosine fold, same (cos DESC, neighbor) rank, same
      // mutual join.
      "q107_mutual_knn" -> s"""
        $mutualCtes
        SELECT a AS vec_a, b AS vec_b, cos, rank_ab, rank_ba
        FROM mut ORDER BY vec_a, vec_b""",

      // Same three unrolled mode-with-self-vote iterations; DuckDB's
      // SUM(HUGEINT) only orders the rank window, never crosses engines.
      "q108_label_prop" -> {
        def iter(i: Int): String = {
          val p = s"l${i - 1}"
          s"""
        v$i AS (
          SELECT e.u AS vec_id, n.label, CAST(COUNT(*) AS BIGINT) AS c
          FROM e JOIN $p n ON e.v = n.vec_id
          GROUP BY 1, 2
          UNION ALL
          SELECT vec_id, label, 1 AS c FROM $p),
        a$i AS (SELECT vec_id, label, SUM(c) AS c FROM v$i GROUP BY 1, 2),
        l$i AS (
          SELECT vec_id, label FROM (
            SELECT vec_id, label,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY c DESC, label) AS rn
            FROM a$i) WHERE rn = 1)"""
        }
        s"""
        $mutualCtes,
        e AS (SELECT a AS u, b AS v FROM mut UNION ALL SELECT b, a FROM mut),
        l0 AS (SELECT vec_id, label FROM embeddings),
        ${(1 to 3).map(iter).mkString(",")}
        SELECT l0.vec_id, l0.label AS label_orig, l3.label AS label_smooth,
               l0.label <> l3.label AS changed
        FROM l0 JOIN l3 ON l0.vec_id = l3.vec_id
        ORDER BY l0.vec_id"""
      },

      // Same shared train+assign CTE prefix as q44, one GROUP BY over
      // the assignment, identical ratio arithmetic.
      "q112_ivf_balance" -> s"""$ivfAssignCtes,
        sz AS (
          SELECT cluster AS c_id, CAST(COUNT(*) AS BIGINT) AS n_assigned
          FROM assigned GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n_assigned) AS BIGINT) AS n_total,
                 CAST(COUNT(*) AS BIGINT) AS k_occ
          FROM sz)
        SELECT c_id, n_assigned,
               ROUND(CAST(n_assigned AS DOUBLE) / n_total, 6) AS share,
               ROUND(CAST(n_assigned AS DOUBLE) * k_occ / n_total, 6) AS balance,
               CAST(n_assigned AS DOUBLE) * k_occ / n_total > 2.0 AS is_hot
        FROM sz, tot ORDER BY c_id""",

      // Same 1e-3 fixed-point quantization, HUGEINT mirroring
      // decimal(38,0) accumulation, identical final double ratios.
      "q115_label_cohesion" -> """
        WITH fp AS (
          SELECT label, i - 1 AS dim,
                 CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS xfp
          FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
        sums AS (SELECT label, dim, CAST(SUM(xfp) AS BIGINT) AS sfp FROM fp GROUP BY 1, 2),
        sq AS (SELECT label, CAST(SUM(xfp * xfp) AS BIGINT) AS sq FROM fp GROUP BY 1),
        gs AS (SELECT dim, CAST(SUM(sfp) AS BIGINT) AS gfp FROM sums GROUP BY 1),
        perl AS (
          SELECT label,
                 SUM(CAST(sfp AS HUGEINT) * sfp) AS ss,
                 SUM(CAST(sfp AS HUGEINT) * gfp) AS sg
          FROM sums JOIN gs USING (dim) GROUP BY label),
        nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM nl),
        x AS (
          SELECT p.label, nl.n,
                 CAST(p.ss - sq.sq AS DOUBLE) / 1e6 / (nl.n * (nl.n - 1)) AS ia,
                 CAST(p.sg - p.ss AS DOUBLE) / 1e6 / (nl.n * (tot.n_total - nl.n)) AS ie
          FROM perl p JOIN sq USING (label) JOIN nl USING (label), tot)
        SELECT label, n, ROUND(ia, 6) AS intra_cos, ROUND(ie, 6) AS inter_cos,
               ROUND(ia - ie, 6) AS cohesion
        FROM x ORDER BY label"""
    )
  }
}
