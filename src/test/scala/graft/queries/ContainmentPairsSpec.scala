package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** The q83 prefix-filter containment join claims EXACTNESS: every pair
  * with C(A,B) = |A∩B|/min(|A|,|B|) ≥ 0.9 over the distinct word-3-gram
  * shingle sets is found (the prefix-filter lemma), and nothing below the
  * threshold is emitted. The sf gates pin it against the DuckDB oracle on
  * driver data; this spec pins it against a brute-force ALL-PAIRS
  * reference on a fixture engineered around the guarantee's edge cases:
  * exact copies, a short doc fully contained in a long one (high
  * containment, LOW Jaccard — the case Jaccard-LSH misses), a pair just
  * UNDER the threshold, and seeded random docs with partial overlap. */
class ContainmentPairsSpec extends SparkSpec {

  private val T = 0.9

  /** Vocabulary-driven deterministic corpus. Texts are token sequences;
    * doc 1 = doc 0 verbatim (containment 1), doc 3 = doc 2 plus 3x its
    * length of fresh tokens (2 contained in 3, Jaccard ~0.25), docs 4/5
    * share ~half their windows (containment well under 0.9), 6-13 seeded
    * random with light overlap. */
  private def corpus(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    def toks(n: Int, off: Int): Seq[String] =
      (0 until n).map(i => s"w${off + i}")
    val base = toks(24, 0)
    val longDoc = toks(12, 100) ++ toks(36, 200)
    val half = toks(20, 400)
    val docs = Seq[Seq[String]](
      base,                                   // 0
      base,                                   // 1: exact copy of 0
      toks(12, 100),                          // 2: short
      longDoc,                                // 3: contains 2's tokens as a prefix
      half ++ toks(20, 500),                  // 4
      half ++ toks(20, 600),                  // 5: shares only `half` with 4
      toks(30, 700).dropRight(2) ++ toks(2, 990) // 6: near-copy of 7 below threshold
    ) ++ (7 until 14).map { i =>
      Seq.fill(20 + rnd.nextInt(20))(s"r${rnd.nextInt(120)}")
    }
    docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
  }

  private def shingleSet(text: String): Set[String] = {
    val ts = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (ts.length < 3) Set(ts.mkString(" "))
    else ts.sliding(3).map(_.mkString(" ")).toSet
  }

  test("q83 equals brute-force containment pairs on the engineered corpus") {
    val dir = java.nio.file.Files.createTempDirectory("q83spec").toString
    import spark.implicits._
    corpus().toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q83_containment_pairs")(spark, dir)
      .select("doc_a", "doc_b", "n_common")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val sets = corpus().map { case (id, tx) => id -> shingleSet(tx) }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      isz = (sets(a) intersect sets(b)).size
      if isz.toDouble / math.min(sets(a).size, sets(b).size) >= T
    } yield (a, b, isz.toLong)).toSet

    assert(want.exists { case (a, b, _) => (a, b) == (0L, 1L) },
      "fixture must contain the exact-copy pair")
    assert(want.exists { case (a, b, _) => (a, b) == (2L, 3L) },
      "fixture must contain the short-in-long pair")
    val jacc23 = {
      val isz = (sets(2L) intersect sets(3L)).size.toDouble
      isz / (sets(2L).size + sets(3L).size - isz)
    }
    assert(jacc23 < 0.5,
      s"short-in-long pair must sit BELOW the q34 Jaccard threshold (got $jacc23)")
    assert(!want.exists { case (a, b, _) => (a, b) == (4L, 5L) },
      "half-overlap pair must be under the containment threshold")
    assert(got == want,
      s"prefix-filter join must equal brute force: missing ${want -- got}, extra ${got -- want}")
  }
}
