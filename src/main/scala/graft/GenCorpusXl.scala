package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deterministic XL documents/embeddings tier generator.
  *
  * The driver's corpus tops out at sf0.1 (5,000 documents / 2,000
  * embeddings), so the n-derived index geometry (LSH planes/band, IVF
  * centroid count, Lloyd sample gate) has been exercised across exactly one
  * real transition. This main writes a strictly larger tier so the scaling
  * claims are measured at a second point: at the defaults (25,000 docs /
  * 10,000 embeddings) the derived geometry moves again — planesPerBand
  * 6 → 9, centroids 44 → 100, Lloyd sample gate ~0.66 → ~0.30.
  *
  * Distribution mirrors what the driver's generator observably produces at
  * sf0.1 (TESTDATA.md, seed 42): documents are whitespace-token texts of
  * 10-100 tokens drawn uniformly from the same 30-word vocabulary, langs
  * en/de/es/fr/zh and sources src0-src19 uniform, `n_chars = len(text)`,
  * with a small planted duplicate structure (driver: 8/5000 exact-dup ids,
  * ~5% of texts carrying the `dup` marker token). Embeddings are UNIT-NORM
  * iid-Gaussian 64-dim float vectors whose `label` is uncorrelated with
  * direction (measured at sf0.1: intra-label mean cosine 0.001 vs
  * inter-label -0.001) — so this generator plants per-id clusters only via
  * explicit near-dup rows, not labels.
  *
  * Planted structure (all id-derived, regeneration-stable):
  *  - doc slot 99 of each 100: exact copy of the previous doc's text;
  *  - doc slots 97/98: near-dups of slot 96 (every 10th token → `dup`);
  *  - embedding slot 99 of each 100: tiny-noise copy of the previous
  *    vector (cosine ≈ 0.999) — a guaranteed q47/q52 confirm-path hit.
  *
  * Determinism: every row derives from splitmix64(seed ⊕ id) only — no
  * shared RNG sequence, so the output is identical under any partitioning
  * (the same rule as q49's hash-gated sampling). Each table is written as a
  * SINGLE parquet file named `<table>.parquet` (the driver layout; DuckDB's
  * oracle reads the path as a file, not a directory), and the remaining
  * corpus tables are symlinked from a base sf dir so the FULL gate runs
  * against the new tier unchanged.
  *
  * Usage: runMain graft.GenCorpusXl [outDir nDocs nEmb baseSfDir]
  */
object GenCorpusXl {

  val Vocab: IndexedSeq[String] = Vector(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch")
  val Langs: IndexedSeq[String] = Vector("en", "de", "es", "fr", "zh")

  /** splitmix64: full-avalanche id→stream mixer. */
  def mix(seed: Long, id: Long): Long = {
    var z = seed + id * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[graft] def tokensOf(id: Long): IndexedSeq[String] = {
    val r = new java.util.Random(mix(0x0d0cL, id))
    val n = 10 + r.nextInt(91)
    Vector.fill(n)(Vocab(r.nextInt(Vocab.length)))
  }

  /** Document text with the planted dup structure (slot = id mod 100). */
  def docText(id: Long): String = (id % 100) match {
    case 99 => docText(id - 1)
    case 97 | 98 =>
      val base = tokensOf(id / 100 * 100 + 96)
      base.zipWithIndex
        .map { case (t, i) => if (i % 10 == 9) "dup" else t }.mkString(" ")
    case _ => tokensOf(id).mkString(" ")
  }

  private def gaussians(id: Long, salt: Long, n: Int): Array[Double] = {
    val r = new java.util.Random(mix(salt, id))
    Array.fill(n)(r.nextGaussian())
  }

  private def normalize(v: Array[Double]): Array[Float] = {
    val norm = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / norm).toFloat)
  }

  /** Unit-norm embedding; slot 99 is a near-copy of the previous vector. */
  def embeddingOf(id: Long, dim: Int): Array[Float] =
    if (id % 100 == 99) {
      val base = gaussians(id - 1, 0xe3bL, dim)
      val noise = gaussians(id, 0xa01L, dim)
      normalize(base.zip(noise).map { case (b, n) => b + 0.05 * n })
    } else normalize(gaussians(id, 0xe3bL, dim))

  /** Writes `df.coalesce(1)` as the single file `<dir>/<table>.parquet`. */
  private[graft] def writeSingleFile(df: org.apache.spark.sql.DataFrame,
                                     dir: String, table: String): Unit = {
    val tmp = s"$dir/_tmp_$table"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).head
    Files.move(Paths.get(part), Paths.get(s"$dir/$table.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.delete)
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "testdata_xl"
    val nDocs = if (args.length > 1) args(1).toLong else 25000L
    val nEmb = if (args.length > 2) args(2).toLong else 10000L
    val baseSf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val dim = 64
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._

    val docs = spark.range(0, nDocs, 1, 32).map { id =>
      val text = docText(id)
      (id, text, Langs(((mix(0x1a6L, id) >>> 8) % 5).toInt),
        "src" + ((mix(0x50cL, id) >>> 8) % 20), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    writeSingleFile(docs, outDir, "documents")

    val emb = spark.range(0, nEmb, 1, 32).map { id =>
      (id, embeddingOf(id, dim), ((mix(0x1abL, id) >>> 8) % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
    writeSingleFile(emb, outDir, "embeddings")

    // Symlink the relational/event tables from the base tier so the full
    // gate (all 54 queries + DuckDB oracle views) runs against outDir.
    Tables.names.filterNot(Set("documents", "embeddings")).foreach { t =>
      val link = Paths.get(s"$outDir/$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(s"$baseSf/$t.parquet"))
    }
    println(s"""{"gen":"xl","dir":"$outDir","docs":$nDocs,"embeddings":$nEmb,"base":"$baseSf"}""")
    spark.stop()
  }
}
