package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q37 hot-block guard: salting oversized blocks must be result-identical
  * to the plain all-pairs block join while bounding the number of
  * candidate pairs any single join bucket (≈ task) can own. */
class TrigramBlockSpec extends SparkSpec {

  /** 120 docs in ONE hot (lang, source, lb) block — the skew shape where
    * the unsalted join is quadratic in a single task — plus a small block. */
  private def skewedDocs() = {
    import spark.implicits._
    val hot = (0 until 120).map { i =>
      (i.toLong, "en", "web", 0L, (i until i + 10).toList)
    }
    val cold = (200 until 205).map { i =>
      (i.toLong, "de", "web", 1L, (i until i + 10).toList)
    }
    (hot ++ cold).toDF("doc_id", "lang", "source", "lb", "gr")
      .withColumn("ng", size(col("gr")))
  }

  test("salted pair generation is result-identical to the unsalted join") {
    val docs = skewedDocs()
    def run(maxBlock: Int) =
      TextPipelineQueries.blockedJaccardPairs(docs, maxBlock)
        .filter(col("jacc") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
        .collect().map(_.toSeq).toSeq
    val unsalted = run(1000000) // g = 1 everywhere: the plain block join
    val salted = run(10)        // hot block splits into g = 12 sub-groups
    assert(unsalted.nonEmpty, "fixture must produce confirmed pairs")
    assert(salted == unsalted)
  }

  test("sub-splitting bounds per-bucket candidate pair counts under skew") {
    val docs = skewedDocs()
    val maxBlock = 10
    // Recompute the salt assignment exactly as blockedJaccardPairs does and
    // measure the largest (block, sub) group and the largest join bucket
    // (block, sub-pair): the quadratic unit of work after salting.
    val sizes = docs.groupBy(col("lang"), col("source"), col("lb"))
      .agg(count(lit(1)).as("bs"))
    val dd = docs.join(sizes, Seq("lang", "source", "lb"))
      .withColumn("g", ceil(col("bs").cast("double") / maxBlock).cast("int"))
      .withColumn("sub", pmod(hash(col("doc_id")), col("g")).cast("int"))
    val subSizes = dd.groupBy(col("lang"), col("source"), col("lb"), col("sub"))
      .agg(count(lit(1)).as("n")).collect().map(_.getAs[Long]("n"))
    val maxSub = subSizes.max
    // 120 docs hashed over g=12 sub-groups: ~10 = maxBlock docs each with
    // deterministic multinomial wobble inside 2×, so no join bucket
    // compares more than ~(2·maxBlock)² candidate pairs — vs
    // 120*119/2 = 7140 for the unsalted single-task block.
    assert(maxSub <= 2L * maxBlock)
    val unsaltedHotPairs = 120L * 119 / 2
    assert(maxSub * maxSub < unsaltedHotPairs / 10)
  }
}
