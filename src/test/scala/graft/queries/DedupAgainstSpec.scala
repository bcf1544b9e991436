package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup (dedupAgainstDropped) must reproduce the full-corpus
  * MinHash dedup exactly when corpus ids precede batch ids — the q51 gate
  * pins this at sf0.01 against the DuckDB oracle; this spec pins it on a
  * fixture engineered so near-dup chains CROSS the corpus/batch boundary
  * (the case a corpus-only or batch-only path would get wrong). */
class DedupAgainstSpec extends SparkSpec {

  /** 20 docs: ids 0-5 a chain of near-dups (overlapping shingle windows),
    * 6-11 isolated, 12-19 a second chain that spans the 80%-split point
    * (t = 16) — so batch docs 16-19 have near-dups both in the corpus
    * (12-15) and within the batch. */
  private def shingles(): DataFrame = {
    import spark.implicits._
    // Scramble each shingle id through an injective multiplicative hash:
    // the production pipeline feeds md5-hashed (pseudorandom) shingles to
    // the affine MinHash permutations; consecutive small ints would make
    // every permutation's min the window start and no band ever collide.
    def win(start: Int): Seq[Long] =
      (start until start + 40).map(x => (x * 2654435761L) % 2147483647L)
    (0 until 20).map { i =>
      val hs =
        if (i < 6) win(i * 5)
        else if (i < 12) win(100000 + i * 1000)
        else win(50000 + (i - 12) * 5)
      (i.toLong, hs)
    }.toDF("doc_id", "hs")
  }

  private def droppedSet(df: DataFrame, idCol: String): Set[Long] =
    df.select(col(idCol)).distinct().collect().map(_.getLong(0)).toSet

  test("incremental dedup equals the full-corpus dedup") {
    val sh = shingles()
    val t = 16L // (max_id + 1) * 4 / 5, as the q51 gate derives it
    val corpus = sh.filter(col("doc_id") < t)
    val batch = sh.filter(col("doc_id") >= t)

    val full = droppedSet(TextPipelineQueries.pairsFromShingles(sh), "doc_b")
    val crossAndInner =
      droppedSet(TextPipelineQueries.dedupAgainstDropped(corpus, batch), "doc_id")
    val incremental =
      droppedSet(TextPipelineQueries.pairsFromShingles(corpus), "doc_b") ++ crossAndInner

    assert(full.nonEmpty, "fixture must produce confirmed near-dups")
    assert(crossAndInner.nonEmpty, "batch docs must be dropped via the corpus")
    assert(incremental == full)
    // Isolated docs survive; every batch doc is in the boundary chain and
    // has a lower-id near-dup, so all of 16-19 drop.
    assert((6L to 11L).forall(!full.contains(_)))
    assert((16L to 19L).forall(crossAndInner.contains))
  }
}
