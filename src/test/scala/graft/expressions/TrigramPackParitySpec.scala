package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** graft_trigram_pack must equal the HOF chain it fused:
  * array_distinct(transform(charShingles(text, 3), packTrigram)) — across
  * ASCII, CJK (codepoint `ascii` semantics), accents, and the short/empty
  * clamped-window edge.
  *
  * One deliberate widening, same class as graft_cosine's NaN: packTrigram
  * multiplies the codepoint as an INT (`ascii(c) * 65536`), which under
  * Spark 4's ANSI mode THROWS for codepoints ≥ 32768 (e.g. 近 U+8FD1);
  * the fused kernel packs in Long arithmetic and is defined for all
  * codepoints. The gate corpus never exercises the overflow (q37 is
  * hash-exact at every sf), so oracle parity is unaffected. */
class TrigramPackParitySpec extends SparkSpec {

  private val parityDocs = Seq(
    "the quick brown fox",
    "aaaaaaaa",                         // heavy packed-value dedup
    "ab", "a", "",                      // clamped single-window edges
    "中文文档日月山水田口",                // CJK codepoints < U+8000
    "déjà vu naïve café",               // accented latin
    "mixed 中en文 text")

  test("fused packed trigrams equal the HOF chain element-for-element") {
    val session = spark
    import session.implicits._
    val rows = parityDocs.toDF("text").select(
        call_function("graft_trigram_pack", col("text")).as("fused"),
        array_distinct(transform(TextFns.charShingles(col("text"), 3),
          x => TextFns.packTrigram(x))).as("hof"))
      .collect()
    rows.zip(parityDocs).foreach { case (r, d) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"divergence on text: '$d'")
    }
  }

  test("codepoints >= 32768: fused is defined where the ANSI HOF overflows") {
    val session = spark
    import session.implicits._
    val high = Seq("近似重复").toDF("text") // 近 = U+8FD1 = 36817
    intercept[Exception] {
      high.select(array_distinct(transform(
        TextFns.charShingles(col("text"), 3),
        x => TextFns.packTrigram(x)))).collect()
    }
    val fused = high.select(call_function("graft_trigram_pack", col("text")))
      .collect()(0).getSeq[Long](0)
    assert(fused.nonEmpty && fused.forall(_ > 0))
    // Long packing of the first trigram: 近(36817)·2^16 + 似(20284)·2^8 + 重(37325)
    assert(fused.head == 36817L * 65536 + 20284L * 256 + 37325L)
  }
}
