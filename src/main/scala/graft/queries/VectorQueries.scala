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

  /** Deterministic hyperplanes shared by the Spark plan and the generated
    * oracle SQL (same literals on both sides). */
  private val planes: Seq[Seq[Double]] = Vectors.hyperplanes(NumPlanes, Dim, seed = 42L)

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
        ORDER BY q_id, rank"""
    )
  }
}
