package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over ArrayType(FloatType) embedding columns, built from
  * higher-order functions so the plan needs no UDF and no row-by-row JVM
  * boundary crossing.
  *
  * Determinism: every reduction folds the array left-to-right in index order
  * (zip_with + aggregate), and elements are cast to double before any
  * arithmetic — the resulting IEEE sequence is identical in any engine that
  * evaluates the same formula, which is what lets cosine scores hash-match
  * an external oracle bit-for-bit.
  */
object Vectors {

  /** Σ a_i·b_i, accumulated in double, index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ a_i², index order. */
  def normSq(a: Column): Column =
    aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity; evaluation order fixed as dot/sqrt(na)/sqrt(nb).
    * Bound to the native fused expression (graft.expressions
    * .CosineSimilarityExpr via call_function): HOFs are CodegenFallback,
    * so the aggregate/zip_with formulation evaluated an interpreted lambda
    * tree per element per candidate pair — the vector family's dominant
    * scoring cost. Bit-identical by construction (same index-order folds,
    * same IEEE combination; CosineParitySpec pins it). */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** The HOF formulation graft_cosine replaces — kept as the parity
    * reference (CosineParitySpec asserts exact equality on random
    * vectors). */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a)) / sqrt(normSq(b))

  /** Dot with a constant double vector (e.g. an LSH hyperplane). */
  def dotConst(a: Column, plane: Seq[Double]): Column =
    aggregate(
      zip_with(a, array(plane.map(lit): _*),
        (x, p) => x.cast("double") * p),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH bucket id from `planes` sign bits. */
  def lshBucket(a: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotConst(a, p) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes, fixed seed — the same literal
    * values are embedded in the oracle SQL, so both engines bucket
    * identically. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
