package graft.expressions

import graft.SparkSpec
import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** graft_cosine must be EXACTLY (==, not approximately) equal to the HOF
  * formulation it replaced — the oracle SQL mirrors the HOF's index-order
  * IEEE sequence, so any ulp drift would break the vector-family gate
  * hashes. */
class CosineParitySpec extends SparkSpec {

  test("native cosine == HOF cosine bit-for-bit on random float vectors") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("native"),
              Vectors.cosineHof(col("a"), col("b")).as("hof"))
    // Exact equality: both are the same IEEE op sequence.
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("double-typed side (fixed-point centroid means) and null semantics") {
    val session = spark
    import session.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5, -0.25, 2.0)))
      .toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("native"),
              Vectors.cosineHof(col("a"), col("b")).as("hof"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == rows(0).getDouble(1))
    // Length mismatch → null (zip_with padding parity).
    val mm = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("native"),
              Vectors.cosineHof(col("a"), col("b")).as("hof"))
      .collect()(0)
    assert(mm.isNullAt(0) && mm.isNullAt(1))
  }

  test("zero-norm vectors: native is IEEE NaN where the ANSI HOF threw") {
    val session = spark
    import session.implicits._
    val zero = Seq((Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    // The HOF formulation under Spark 4's default ANSI mode raises
    // DIVIDE_BY_ZERO on a zero-norm side — a query-killing edge for a
    // similarity score. The native expression is strictly more defined:
    // plain IEEE arithmetic, so dot/0.0 is NaN and the row survives
    // (filters and top-k drop NaN naturally). Corpus embeddings are never
    // zero vectors, so gate hashes see no divergence.
    assert(zero.select(Vectors.cosine(col("a"), col("b")))
      .collect()(0).getDouble(0).isNaN)
    intercept[Exception] {
      zero.select(Vectors.cosineHof(col("a"), col("b"))).collect()
    }
  }
}
