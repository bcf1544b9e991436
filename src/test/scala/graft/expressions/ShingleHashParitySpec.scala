package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** graft_shingle_hash32 must equal the HOF chain it fused:
  * hash32Array(array_distinct(wordShingles(toks, 3))) — including the
  * empty-doc one-empty-shingle edge and first-occurrence dedup order. */
class ShingleHashParitySpec extends SparkSpec {

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog repeatedly",
    "dup dup dup dup dup dup",            // heavy shingle dedup
    "a", "", "one two",                    // short/empty: single-window edge
    "x y z x y z x y z x y z")             // repeating windows

  test("fused shingle hashing equals the HOF chain element-for-element") {
    val session = spark
    import session.implicits._
    val df = docs.toDF("text").withColumn("toks", TextFns.tokens(col("text")))
    val rows = df.select(
        TextFns.shingleHash32(col("toks"), 3).as("fused"),
        TextFns.hash32Array(
          array_distinct(TextFns.wordShingles(col("toks"), 3))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
    // The empty doc still yields exactly one (empty-string) shingle hash.
    val empty = rows(3)
    assert(empty.getSeq[Long](0).length == 1)
  }
}
