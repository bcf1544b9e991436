package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two dense vectors,
  * BIT-IDENTICAL to the HOF formulation it replaces
  * (graft.functions.Vectors.cosine = `aggregate(zip_with(a, b, ·*·), 0.0,
  * +)` / sqrt(normSq a) / sqrt(normSq b)).
  *
  * Why a custom Expression (the builder-prompt (b) tier): higher-order
  * functions are CodegenFallback in Spark — every element of every
  * candidate pair evaluates an interpreted lambda tree (boxed doubles,
  * virtual dispatch), and the vector family scores O(candidates·dim)
  * elements per query (q38/q39/q44/q47/q50/q52). This fused loop reads the
  * arrays directly and keeps the three accumulators in registers.
  *
  * Parity contract (what makes the oracle hashes still match): each
  * accumulator folds in INDEX ORDER with per-element widening to double,
  * and the final combination is the same left-to-right
  * `dot / sqrt(na) / sqrt(nb)` IEEE sequence. Null semantics mirror
  * zip_with's: length mismatch or any null element → null (zip_with pads /
  * propagates null into the sum). Verified by CosineParitySpec (HOF vs
  * native on random vectors, exact ==) and the vector-family gate hashes.
  *
  * Registered as SQL function `graft_cosine(a, b)` via GraftExtensions;
  * Vectors.cosine binds to it through call_function, so every consumer
  * picked up the native path with no call-site change.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def floating(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (floating(left.dataType) && floating(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects ARRAY<FLOAT|DOUBLE> on both sides, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarityExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isDouble(left), isDouble(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}$$r = graft.expressions.CosineSimilarityExpr.compute(
         |  $a, $b, ${isDouble(left)}, ${isDouble(right)});
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {

  /** Fused dot + norms in index order; null on length mismatch or null
    * element (zip_with parity). Called from generated code. */
  def compute(a: ArrayData, b: ArrayData,
              aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / math.sqrt(na) / math.sqrt(nb))
  }
}
