package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native token-inventory hit count: how many elements of a token array
  * appear in a CONSTANT word inventory (stopword lists — the language-ID
  * and quality-score kernel, q31/q32). Replaces
  * `size(filter(toks, t => array_contains(array(words...), t)))`, which
  * evaluated an interpreted array_contains scan per token per language
  * (5 languages × every token of every doc). The inventory child must be
  * foldable: it is evaluated ONCE into a hash set per expression instance
  * (lazily, so the set also builds exactly once per executor after
  * deserialization), and each token is a single O(1) probe.
  *
  * Count semantics mirror the HOF: every occurrence counts (not
  * distinct), missing tokens contribute nothing. Pinned by
  * WordHitsParitySpec.
  *
  * Registered as `graft_word_hits(toks, words)`; TextFns.stopwordHits
  * binds it.
  */
case class WordHitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_word_hits: the word inventory must be a constant (foldable) array")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_word_hits expects (ARRAY<STRING>, ARRAY<STRING> literal), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_word_hits"

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](ad.numElements() * 2)
    var i = 0
    while (i < ad.numElements()) {
      // clone() copies out of any backing buffer so set membership is
      // stable across row batches.
      s.add(ad.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  /** O(1)-per-token probe; called from generated code. */
  def countHits(arr: ArrayData): Int = {
    val n = arr.numElements()
    var i = 0; var hits = 0
    while (i < n) {
      if (wordSet.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    countHits(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordHitsExpr", this,
      classOf[WordHitsExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.countHits($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordHitsExpr =
    copy(left = newLeft, right = newRight)
}
