package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Vectors
import graft.operators.TopK

/** Similarity search over the `embeddings` table (builder-prompt ANN
  * family): brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * All vector math is HOF-based (zip_with/transform/aggregate folding in
  * index order, elements cast to double first) so the identical IEEE
  * sequence is expressible in DuckDB (`list_transform` + `list_reduce`) and
  * cosine scores hash-match bit-for-bit — see graft.functions.Vectors.
  *
  * Scale design: the query set is tiny and explicitly broadcast; the corpus
  * side streams through a nested-loop (q38) or a bucket-equi-join (q39).
  * Top-k uses the two-level salted select (graft.operators.TopK) so no task
  * ever sorts the whole corpus for one query key.
  */
object VectorQueries extends QueryPack {

  private val NumQueries = 5
  private val K = 10
  private val NumPlanes = 4
  private val Dim = 64
  private val NumCentroids = 16
  private val NProbe = 2
  private val DupCos = 0.4

  /** Deterministic hyperplanes shared by the Spark plan and the generated
    * oracle SQL (same literals on both sides). */
  private val planes: Seq[Seq[Double]] = Vectors.hyperplanes(NumPlanes, Dim, seed = 42L)

  /** Nearest-centroid assignment: best centroid per vector by (cosine desc,
    * c_id asc). Centroids are broadcast — provably bounded (≤ NumCentroids
    * rows) at any corpus scale. */
  private def assignTo(emb: DataFrame, cents: DataFrame): DataFrame =
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k: every (query, corpus) pair scored, exact
    // ranking. The query side (vec_id < 5) is broadcast; the corpus side is
    // never shuffled — only the k·salt level-1 survivors move.
    "q38_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val scored = emb.join(broadcast(qs), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
                Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
      TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
          K, col("vec_id"))
        .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // LSH-bucketed ANN: sign-pattern of 4 fixed random hyperplanes buckets
    // the corpus (16 buckets); each query compares only within its bucket.
    // The join is a bucket equi-join — candidate generation is O(n/buckets)
    // per query, the 100 TB shape for ANN shortlists.
    "q39_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("bucket", Vectors.lshBucket(col("embedding"), planes))
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
                col("bucket").as("q_bucket"))
      val scored = emb.join(broadcast(qs),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
                Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
      TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
          K, col("vec_id"))
        .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF-style ANN: coarse quantization into 16 clusters — deterministic
    // init (the first 16 vectors) then TWO Lloyd iterations (assignment by
    // max cosine with id tiebreak; fixed-point per-dimension means), then
    // each query probes only its 2 nearest trained clusters. Candidate
    // generation is a cluster equi-join — O(nprobe/k of the corpus) per
    // query, the inverted-file scale shape; training is 2 shuffle aggs.
    "q44_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents0 = emb.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      // The trained coarse quantizer IS the IVF index artifact: build it
      // once per (corpus, fingerprint) and persist it as a table — exactly
      // how a production IVF separates index build from query serving.
      val cents = graft.operators.MaterializeOnce(
        s"ivf_cents|$d|${graft.operators.MaterializeOnce.fingerprint(d, "embeddings.parquet")}", s) {
        lloydStep(assignTo(emb, lloydStep(assignTo(emb, cents0))))
      }
      // Final cluster assignment against the trained centroids.
      val assigned = assignTo(emb, cents)
      // Each query probes its NProbe nearest clusters.
      val qs = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val probes = qs.join(broadcast(cents), expr("true"))
        .select(col("q_id"), col("q_emb"), col("c_id"),
                Vectors.cosine(col("q_emb"), col("c_emb")).as("sim"))
      val probed = TopK.perKey(probes, Seq("q_id"),
          Seq(col("sim").desc, col("c_id")), NProbe, col("c_id"), salt = 4)
        .select(col("q_id"), col("q_emb"), col("c_id").as("probe_cluster"))
      // Search only the probed clusters.
      val scored = assigned.join(broadcast(probed),
          col("cluster") === col("probe_cluster") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
                Vectors.cosine(col("q_emb"), col("embedding")).as("cos"))
      TopK.perKey(scored, Seq("q_id"), Seq(col("cos").desc, col("vec_id")),
          K, col("vec_id"))
        .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Embedding-cosine near-dup DEDUP (the vector member of the dedup
    // family — q38/q39/q44 are search): LSH-bucketed candidate pairs
    // (bucket equi-join on the hyperplane sign pattern, never all-pairs),
    // confirmed by exact cosine >= threshold. Resolution drops every
    // vector that has ANY lower-id near-duplicate (the same one-pass rule
    // as q35 — note this is NOT transitive greedy clustering: in a chain
    // a~b~c with a!~c, both b and c are dropped); reported as per-bucket
    // kept/dropped counts. One keyed join, same shape as MinHash dedup.
    "q47_embed_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("bucket", Vectors.lshBucket(col("embedding"), planes))
      val dropped = emb.as("x").join(emb.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .filter(Vectors.cosine(col("x.embedding"), col("y.embedding")) >= DupCos)
        .select(col("y.vec_id").as("vec_b")).distinct()
        .withColumn("is_dropped", lit(1))
      emb.join(dropped, col("vec_id") === col("vec_b"), "left_outer")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_total"),
             sum(coalesce(col("is_dropped"), lit(0))).as("n_dropped"))
        .orderBy(col("bucket"))
    })
  )

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
    // Bucket id: bit i set when embedding · plane_i > 0 (mirrors
    // Vectors.lshBucket; plane literals generated from the same seed).
    val bucketSql = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_reduce(list_transform(generate_series(1, ${Dim}), i -> CAST(embedding[i] AS DOUBLE) * (${planeLit(p)})[i]), (x,y) -> x + y) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

    Map(
      "q38_cosine_topk" -> s"""
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
        ORDER BY q_id, rank""",

      "q39_ann_lsh" -> s"""
        WITH b AS (
          SELECT vec_id, embedding, CAST($bucketSql AS BIGINT) AS bucket FROM embeddings),
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
          FROM b WHERE vec_id < $NumQueries),
        scored AS (
          SELECT q.q_id, e.vec_id, ${cosSql("q.q_emb", "e.embedding")} AS cos
          FROM q JOIN b e ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, vec_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id, cos
        FROM ranked
        WHERE rank <= $K
        ORDER BY q_id, rank""",

      "q47_embed_dedup" -> s"""
        WITH b AS (
          SELECT vec_id, embedding, CAST($bucketSql AS BIGINT) AS bucket FROM embeddings),
        dropped AS (
          SELECT DISTINCT y.vec_id AS vec_b
          FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
          WHERE ${cosSql("x.embedding", "y.embedding")} >= $DupCos)
        SELECT b.bucket,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN d.vec_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM b LEFT JOIN dropped d ON b.vec_id = d.vec_b
        GROUP BY b.bucket
        ORDER BY b.bucket""",

      "q44_ann_ivf" -> {
        // One Lloyd round as CTEs: assignment against centroid relation
        // `prev` -> fixed-point per-dimension means -> centroid relation
        // `next`. Mean expression order mirrors the Spark side exactly:
        // CAST(sum AS DOUBLE) / count / 1e6.
        def lloyd(i: Int, prev: String, next: String): String = s"""
        a$i AS (
          SELECT e.vec_id, e.embedding, c.c_id,
                 ${cosSql("e.embedding", "c.c_emb")} AS sim
          FROM embeddings e, $prev c),
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
        WITH c0 AS (
          SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < $NumCentroids),
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
          WHERE rn = 1),
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
    )
  }
}
