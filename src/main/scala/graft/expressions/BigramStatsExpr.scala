package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document bigram repetition stats in ONE pass over the token array:
  * (n_grams, max_gram_n, dup_gram_n) of the word-2-gram multiset — the
  * Gopher-style repetition kernel of q63. The stats are per-row facts, so
  * computing them here removes BOTH shuffles of the explode → (doc, gram)
  * agg → per-doc agg formulation: grams never leave the row, the query
  * becomes a map-only scan at any corpus size.
  *
  * Gram semantics mirror TextFns.wordShingles(toks, 2) exactly (pinned by
  * BigramStatsParitySpec): docs with < 2 tokens yield ONE degenerate gram
  * (the single token, or "" for an empty doc), so every fraction built on
  * n_grams stays total.
  *
  * Registered as `graft_bigram_stats(toks ARRAY<STRING>)`; returns
  * STRUCT<n_grams: BIGINT, max_gram_n: BIGINT, dup_gram_n: BIGINT> where
  * dup_gram_n = Σ count over grams with count > 1.
  */
case class BigramStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_stats expects ARRAY<STRING>, got ${t.simpleString}")
  }

  override def dataType: DataType = BigramStatsExpr.schema
  override def prettyName: String = "graft_bigram_stats"

  /** One pass + one hash map over the row's grams; called from generated
    * code. Tokens are whitespace-split so the " " join is injective. */
  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n < 2) return new GenericInternalRow(Array[Any](1L, 1L, 0L))
    val sep = BigramStatsExpr.Sep
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n - 1) {
      // concatWs allocates a fresh backing array, so keys are stable even
      // if the source ArrayData reuses buffers across elements.
      val g = UTF8String.concatWs(sep, arr.getUTF8String(i),
        arr.getUTF8String(i + 1))
      m.merge(g, Integer.valueOf(1), BigramStatsExpr.SumInts)
      i += 1
    }
    var max = 0L
    var dup = 0L
    val it = m.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      if (c > max) max = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any]((n - 1).toLong, max, dup))
  }

  override def nullSafeEval(a: Any): Any = stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramStatsExpr", this,
      classOf[BigramStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.stats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BigramStatsExpr =
    copy(child = newChild)
}

object BigramStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("max_gram_n", LongType, nullable = false),
    StructField("dup_gram_n", LongType, nullable = false)))

  private val Sep = UTF8String.fromString(" ")

  private val SumInts =
    new java.util.function.BiFunction[Integer, Integer, Integer] {
      override def apply(a: Integer, b: Integer): Integer =
        Integer.valueOf(a.intValue() + b.intValue())
    }
}
