package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** graft_word_hits must equal size(filter(toks, array_contains(...)))
  * — including repeated-token counting (every occurrence, not distinct). */
class WordHitsParitySpec extends SparkSpec {

  private val docs = Seq(
    "the cat and the dog and the bird",   // repeated stopwords count each time
    "no inventory words here",
    "", "the", "and and and")

  test("native hit count equals the HOF filter/contains form") {
    val session = spark
    import session.implicits._
    val inventory = TextFns.stopwords("en")
    val rows = docs.toDF("text")
      .withColumn("toks", TextFns.tokens(col("text")))
      .select(
        TextFns.stopwordHits(col("toks"), inventory).as("native"),
        TextFns.stopwordHitsHof(col("toks"), inventory).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // Repeated occurrences counted each time (doc 0 has 'the' x3, 'and' x2).
    assert(rows(0).getInt(0) >= 5)
    // Non-constant inventory is rejected, not silently mis-evaluated.
    val err = intercept[Exception] {
      docs.toDF("text")
        .withColumn("toks", TextFns.tokens(col("text")))
        .selectExpr("graft_word_hits(toks, toks)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable") ||
      err.getMessage.toLowerCase.contains("constant"))
  }
}
