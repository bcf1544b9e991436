package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** The q86 content-defined chunking gate pins values against the DuckDB
  * oracle on driver data; this spec pins the property that makes CDC worth
  * having over q67's fixed stride: RE-SYNCHRONIZATION. A prefix edit
  * (inserted token) may change the chunk it lands in, but every boundary
  * AFTER it is decided by content alone, so the tail chunks of the edited
  * doc are byte-identical to the original's — a fixed-stride chunker
  * re-keys every downstream chunk instead. Verified end-to-end through
  * the gate query: the original and the prefix-edited copy must share all
  * chunks from the first content boundary on, which the query's cross-doc
  * rule surfaces as a high dup fraction for BOTH docs. */
class CdcChunksSpec extends SparkSpec {

  test("prefix edit re-synchronizes: tail chunks shared, both docs mostly dup") {
    val dir = java.nio.file.Files.createTempDirectory("q86spec").toString
    import spark.implicits._
    // 400 deterministic tokens; enough content boundaries that the
    // shared tail dominates both docs' chunk counts.
    val toks = (0 until 400).map(i => s"tok${(i * 7919) % 997}")
    val docs = Seq(
      (0L, toks.mkString(" ")),
      (1L, ("INSERTED" +: toks).mkString(" ")),
      (2L, (500 until 560).map(i => s"other$i").mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q86_cdc_chunks")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap

    val (n0, dup0, frac0) = rows(0L)
    val (n1, dup1, _) = rows(1L)
    val (_, dupOther, _) = rows(2L)
    // Both copies see nearly all their chunks shared: at most the one
    // chunk receiving the inserted token (plus the leading chunk if the
    // insert lands before the first boundary) differs.
    assert(n0 > 10, s"fixture must produce many chunks, got $n0")
    assert(dup0 >= n0 - 1, s"original: $dup0 of $n0 chunks shared")
    assert(dup1 >= n1 - 2, s"edited: $dup1 of $n1 chunks shared")
    assert(frac0 >= 0.9, s"original dup_frac $frac0")
    assert(dupOther == 0L, "unrelated doc must share nothing")
  }
}
