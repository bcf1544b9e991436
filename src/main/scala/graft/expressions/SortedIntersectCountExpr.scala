package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |A ∩ B| of two SORTED-ASCENDING distinct
  * ARRAY<BIGINT> columns by linear two-pointer merge.
  *
  * Why a custom Expression (the builder-prompt (b) tier):
  * `size(array_intersect(a, b))` builds a hash set from one side PER CALL —
  * at q37's ~30k candidate pairs per sf0.1 block sweep, that is 30k hash
  * set constructions plus an intersection array that is materialized only
  * to be counted. The pairing sides are set-valued and sorted ONCE per
  * document (array_sort in blockedJaccardPairs, amortized over every pair
  * the doc appears in); the merge then does zero allocation and zero
  * hashing per pair. Result-identical to size(array_intersect) on sorted
  * distinct inputs — parity is property-checked in SortedIntersectSpec and
  * end-to-end by the q37 gate hash.
  *
  * Registered as SQL function `graft_sorted_icount(a, b)` via
  * graft.GraftExtensions. Inputs MUST be sorted ascending and duplicate
  * free — the single call site establishes this with array_sort over
  * array_distinct output.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def integral(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_icount expects ARRAY<BIGINT|INT> on both sides, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_icount"

  private def isLong(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isLong(left), isLong(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedIntersectCountExpr.compute(" +
        s"$a, $b, ${isLong(left)}, ${isLong(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {

  /** Two-pointer merge count over sorted-ascending distinct integral
    * arrays (int32 widened to int64). Called from generated code. */
  def compute(a: ArrayData, b: ArrayData, aLong: Boolean, bLong: Boolean): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = if (aLong) a.getLong(i) else a.getInt(i).toLong
      val y = if (bLong) b.getLong(j) else b.getInt(j).toLong
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
