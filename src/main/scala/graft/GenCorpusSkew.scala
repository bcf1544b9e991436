package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.{col, timestamp_micros}

/** Deterministic SKEW-tier generator — the adversarial sibling of
  * [[GenCorpusXl]]. The driver tiers and the XL tiers are uniform in the
  * dimensions the pair/dedup family shuffles on; this tier plants the
  * three skews that break naive pair generation at 100 TB, so the q34/
  * q37/q47/q102/q149 gates can be value-checked (and their task-level
  * pair bounds spec-checked) under hostile distribution:
  *
  *  - LANGUAGE skew: ≈90% of documents are `en` (hash-gated, id-stable) —
  *    every per-language aggregate/window has one giant group;
  *  - BOILERPLATE skew: ≈30% of documents carry one fixed 8-token
  *    boilerplate phrase spliced at an id-derived position — one hot
  *    n-gram/shingle family shared by thousands of docs (the shape that
  *    makes unguarded gram joins quadratic and trips df-cap pruning);
  *  - EMBEDDING hot cluster: ≈30% of vectors are tiny-noise copies of
  *    vector 0 (cos ≈ 0.999) — their band keys COLLIDE in every LSH
  *    band, producing a bucket well past SaltedSelfPairs' maxGroup
  *    (1000), so the sub-group-pair salting actually engages (at the
  *    uniform tiers no bucket ever reaches the cap).
  *
  * Same determinism rule as GenCorpusXl: every row derives from
  * splitmix64(seed ⊕ id) only, single-file parquet layout, remaining
  * tables symlinked from the base sf dir so the full gate + DuckDB
  * oracle run against the tier unchanged.
  *
  * Usage: runMain graft.GenCorpusSkew [outDir nDocs nEmb baseSfDir]
  */
object GenCorpusSkew {

  import GenCorpusXl.{mix, tokensOf, Langs}

  val Boilerplate: IndexedSeq[String] = Vector(
    "terms", "privacy", "copyright", "cookies", "subscribe",
    "newsletter", "contact", "sitemap")

  /** ≈90% en, remainder uniform over the other four languages. */
  def langOf(id: Long): String = {
    val g = (mix(0x5e1L, id) >>> 8) % 10
    if (g < 9) "en" else Langs(1 + ((mix(0x5e2L, id) >>> 8) % 4).toInt)
  }

  /** Document text: the XL token stream (with its slot-96..99 dup
    * structure preserved — slot 99 copies the FINAL text of slot 98's
    * predecessor, boilerplate included, so exact-dup pairs survive) plus
    * the boilerplate 8-gram spliced into ≈30% of docs at an id-derived
    * token position. */
  def docText(id: Long): String = (id % 100) match {
    case 99 => docText(id - 1)
    case _ =>
      val base: IndexedSeq[String] = (id % 100) match {
        case 97 | 98 =>
          tokensOf(id / 100 * 100 + 96).zipWithIndex
            .map { case (t, i) => if (i % 10 == 9) "dup" else t }
        case _ => tokensOf(id)
      }
      val toks =
        if ((mix(0xb0bL, id) >>> 8) % 10 < 3) {
          val pos = ((mix(0xb0cL, id) >>> 8) % (base.length + 1)).toInt
          (base.take(pos) ++ Boilerplate ++ base.drop(pos))
        } else base
      toks.mkString(" ")
  }

  /** Epoch micros of 2024-01-01T00:00Z — the base tier's event-time
    * origin. */
  private val EventBaseUs = 1704067200000000L
  private val EventTypes: IndexedSeq[String] =
    Vector("signup", "click", "purchase", "error", "view")

  /** One skewed event row: ≈30% of events belong to USER 0 — the hot
    * state-store key (the streaming analogue of the hot LSH bucket below:
    * one user's session/dedup state partition carries 30% of the whole
    * stream, so the q187/q192 skew-tier runs push a genuinely hot key
    * through the stateful kernels). The remainder spread uniformly over
    * 1499 other users; types uniform over the five base types. Event time
    * is STRICTLY INCREASING in event_id (each id jittered inside its own
    * ~25.9 s slot of the 30-day span) — the base generator's contract,
    * which the sessionization oracles lean on (`min(event_id)` per
    * session IS the time-first event). */
  def eventOf(id: Long): (Long, Long, Long, String, Double) = {
    val hot = (mix(0x40aL, id) >>> 8) % 10 < 3
    val user = if (hot) 0L else 1L + (mix(0x40bL, id) >>> 8) % 1499L
    val slotUs = 25920000L // 30 days / 100k events
    val us = EventBaseUs + id * slotUs + (mix(0x40cL, id) >>> 8) % slotUs
    val etype = EventTypes(((mix(0x40dL, id) >>> 8) % 5).toInt)
    val value = ((mix(0x40eL, id) >>> 8) % 100000L) / 100.0
    (id, us, user, etype, value)
  }

  /** ≈30% of vectors are tiny-noise copies of vector 0 — the hot LSH
    * bucket; the rest are the XL iid unit-norm stream. */
  def embeddingOf(id: Long, dim: Int): Array[Float] =
    if (id > 0 && (mix(0xc0dL, id) >>> 8) % 10 < 3) {
      val r = new java.util.Random(mix(0xe3bL, 0L))
      val base = Array.fill(dim)(r.nextGaussian())
      val rn = new java.util.Random(mix(0xa02L, id))
      val noise = Array.fill(dim)(rn.nextGaussian())
      val v = base.zip(noise).map { case (b, n) => b + 0.05 * n }
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / norm).toFloat)
    } else GenCorpusXl.embeddingOf(id, dim)

  /** Write the three skewed tables (documents, embeddings, events) with an
    * EXISTING session — also the SkewTierSpec arming path, so the
    * salting-bound specs run on every checkout instead of auto-cancelling
    * when the tier is absent. Deterministic: same (nDocs, nEmb, nEvents) →
    * identical files. */
  def write(spark: org.apache.spark.sql.SparkSession, outDir: String,
            nDocs: Long, nEmb: Long, nEvents: Long = 100000L): Unit = {
    val dim = 64
    Files.createDirectories(Paths.get(outDir))
    import spark.implicits._

    val docs = spark.range(0, nDocs, 1, 32).map { id =>
      val text = docText(id)
      (id, text, langOf(id),
        "src" + ((mix(0x50cL, id) >>> 8) % 20), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    GenCorpusXl.writeSingleFile(docs, outDir, "documents")

    val emb = spark.range(0, nEmb, 1, 32).map { id =>
      (id, embeddingOf(id, dim), ((mix(0x1abL, id) >>> 8) % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
    GenCorpusXl.writeSingleFile(emb, outDir, "embeddings")

    val ev = spark.range(0, nEvents, 1, 32).map(id => eventOf(id))
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    GenCorpusXl.writeSingleFile(ev, outDir, "events")
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "testdata_skew"
    val nDocs = if (args.length > 1) args(1).toLong else 10000L
    val nEmb = if (args.length > 2) args(2).toLong else 4000L
    val baseSf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    write(spark, outDir, nDocs, nEmb)

    Tables.names.filterNot(Set("documents", "embeddings", "events")).foreach { t =>
      val link = Paths.get(s"$outDir/$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(s"$baseSf/$t.parquet"))
    }
    println(s"""{"gen":"skew","dir":"$outDir","docs":$nDocs,"embeddings":$nEmb,"base":"$baseSf"}""")
    spark.stop()
  }
}
