package graft.expressions

import graft.SparkSpec
import graft.queries.TextPipelineQueries
import org.apache.spark.sql.functions._

class BigramStatsParitySpec extends SparkSpec {

  test("graft_bigram_stats equals the explode+groupBy formulation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),           // "a b"×2 + "b a"×2 -> all 4 dup, max 2
      (2L, "x y z"),               // two distinct grams, no dups
      (3L, "w w w w"),             // one gram ×3
      (4L, "solo"),                // degenerate single-token gram
      (5L, ""),                    // degenerate empty gram
      (6L, "  spaced   out  "),    // tokenizer trims/collapses
      (7L, ("ab " * 200).trim)     // long uniform doc: 199 grams, all dup
    ).toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
        call_function("graft_bigram_stats",
          graft.functions.TextFns.tokens(col("text"))).as("st"))
      .select(col("doc_id"), col("st.n_grams"), col("st.max_gram_n"),
        col("st.dup_gram_n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val grouped = TextPipelineQueries.repetitionStatsGrouped(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(native == grouped)
    assert(native(1L) == ((4L, 2L, 4L)))
    assert(native(4L) == ((1L, 1L, 0L)))
    assert(native(5L) == ((1L, 1L, 0L)))
    assert(native(7L) == ((199L, 199L, 199L)))
  }

  test("parity on the sf0.001 corpus and codegen plan") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"),
        call_function("graft_bigram_stats",
          graft.functions.TextFns.tokens(col("text"))).as("st"))
      .select(col("doc_id"), col("st.n_grams"), col("st.max_gram_n"),
        col("st.dup_gram_n"))
    val grouped = TextPipelineQueries.repetitionStatsGrouped(docs)
    assert(native.exceptAll(grouped).isEmpty && grouped.exceptAll(native).isEmpty)
  }
}
