package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-shingle hashing: tokens → space-joined word n-grams →
  * FIRST-OCCURRENCE string dedup → md5-prefix 32-bit hash, in one pass.
  * Replaces the chain `hash32Array(array_distinct(wordShingles(toks, n)))`
  * whose shingle-string construction (`transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i, n)))`) still evaluated an interpreted
  * expression tree per shingle — the remaining dominant cost of the
  * one-time shingle-table builds (q34's cold index build).
  *
  * Exact-parity contract: shingle window semantics mirror
  * TextFns.wordShingles (`m = max(#toks − (n−1), 1)` windows, slice
  * clamped at the end — an empty token list yields ONE empty-string
  * shingle), dedup is BY STRING (not by hash: two distinct shingles that
  * hash-collide must both be dropped-as-duplicates exactly when the
  * string-level array_distinct would have kept/dropped them), and the hash
  * is the same md5-prefix arithmetic as [[Hash32ArrayExpr]]. Pinned by
  * ShingleHashParitySpec across empty/short/repetitive docs.
  *
  * Registered as `graft_shingle_hash32(toks, n)`; TextFns.shingleHash32
  * binds it.
  */
case class ShingleHash32Expr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash32 expects ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash32"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHash32Expr.compute(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.ShingleHash32Expr.compute($c, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleHash32Expr =
    copy(child = newChild)
}

object ShingleHash32Expr {

  private val Space = UTF8String.fromString(" ")

  /** One pass: window → concatWs → string-dedup → md5 prefix. Called from
    * generated code. */
  def compute(toks: ArrayData, n: Int): Array[Long] = {
    val size = toks.numElements()
    val m = math.max(size - (n - 1), 1)
    val md = MinHashSignatureExpr.digest()
    val seen = new java.util.HashSet[UTF8String]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + n, size)
      val parts = new Array[UTF8String](math.max(end - i, 0))
      var k = i
      while (k < end) { parts(k - i) = toks.getUTF8String(k); k += 1 }
      val shingle = UTF8String.concatWs(Space, parts: _*)
      if (seen.add(shingle)) {
        md.reset()
        val d = md.digest(shingle.getBytes)
        out += (((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
                ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL))
      }
      i += 1
    }
    out.toArray
  }
}
