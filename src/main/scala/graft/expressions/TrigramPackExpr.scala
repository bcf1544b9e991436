package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused packed char-trigram extraction: text → distinct
  * `c1·2^16 + c2·2^8 + c3` codepoint-packed 3-grams in one pass —
  * replaces `array_distinct(transform(charShingles(text, 3),
  * packTrigram))`, whose per-shingle substr/ascii tree evaluated
  * interpreted (HOFs are CodegenFallback) and dominated q37's one-time
  * trigram-table build.
  *
  * Parity contract (mirrors the HOF chain AND the DuckDB oracle's
  * `ascii(substr(x, i, 1))` arithmetic): window count is
  * `max(numChars − 2, 1)` (character-based, so an empty/short text yields
  * one clamped window), positions past the end contribute 0 (Spark's
  * `ascii('')`), characters are Unicode CODEPOINTS (`ascii` returns the
  * first codepoint — zh documents exercise this), and dedup keeps the
  * first occurrence of each PACKED VALUE (the HOF array_distinct ran
  * after packing). Pinned by TrigramPackParitySpec incl. CJK/accents and
  * end-to-end by the q37 gate hash.
  *
  * Registered as `graft_trigram_pack`; TextFns.trigramPackArray binds it.
  */
case class TrigramPackExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_pack expects STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_trigram_pack"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TrigramPackExpr.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.TrigramPackExpr.compute($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TrigramPackExpr =
    copy(child = newChild)
}

object TrigramPackExpr {

  /** One pass over the text's codepoints. Called from generated code. */
  def compute(text: UTF8String): Array[Long] = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val m = math.max(n - 2, 1)
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](m)
    var i = 0
    while (i < m) {
      val c1 = if (i < n) cps(i).toLong else 0L
      val c2 = if (i + 1 < n) cps(i + 1).toLong else 0L
      val c3 = if (i + 2 < n) cps(i + 2).toLong else 0L
      val v = c1 * 65536L + c2 * 256L + c3
      if (seen.add(v)) out += v
      i += 1
    }
    out.toArray
  }
}
