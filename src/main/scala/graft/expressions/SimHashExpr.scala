package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vectorized `TextFns.md5Bits16` over a string array (16-bit md5-prefix
  * hash per element, one tight loop) — same motivation as
  * [[Hash32ArrayExpr]]: the HOF form ran an interpreted md5 tree per
  * token. Registered as `graft_hash16_arr`; TextFns.hash16Array binds it. */
case class Hash16ArrayExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash16_arr expects ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash16_arr"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SimHashExpr.computeHash16(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.SimHashExpr.computeHash16($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Hash16ArrayExpr =
    copy(child = newChild)
}

/** Native 16-bit SimHash over pre-hashed token values: one pass maintains
  * all 16 bit-counters (+1 when the hash carries the bit, −1 otherwise)
  * and assembles the fingerprint — the HOF formulation ran SIXTEEN
  * interpreted aggregate folds over the array per row (q36's dominant
  * cost). Pure integer arithmetic, so equality with the HOF form is exact
  * (MinHashExprSpec parity). Registered as `graft_simhash16`. */
case class SimHash16Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 expects ARRAY<BIGINT>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash16"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.computeSimhash16(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHashExpr.computeSimhash16($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash16Expr =
    copy(child = newChild)
}

object SimHashExpr {

  /** First 4 md5 hex chars as a long (== conv(substring(md5(x),1,4),16,10)).
    * Called from generated code. */
  def computeHash16(arr: ArrayData): Array[Long] = {
    val md = MinHashSignatureExpr.digest()
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      out(i) = ((d(0) & 0xFFL) << 8) | (d(1) & 0xFFL)
      i += 1
    }
    out
  }

  /** All 16 bit-counters in one pass; bit i set when its counter > 0 —
    * identical to 16 independent `aggregate(hs, 0, acc ± 1)` folds.
    * Called from generated code. */
  def computeSimhash16(arr: ArrayData): Long = {
    val counts = new Array[Int](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 16) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** First 12 md5 hex chars as a long (== conv(substring(md5(x),1,12),16,10)
    * — the first 6 digest bytes big-endian). Called from generated code. */
  def computeHash48(arr: ArrayData): Array[Long] = {
    val md = MinHashSignatureExpr.digest()
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      out(i) = ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
        ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
        ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
      i += 1
    }
    out
  }

  /** [[computeSimhash16]] widened to 48 counters. Called from generated
    * code. */
  def computeSimhash48(arr: ArrayData): Long = {
    val counts = new Array[Int](48)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 48) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Vectorized 48-bit md5-prefix hash over a string array (first 12 hex
  * chars == conv(substring(md5(x),1,12),16,10)) — the fingerprint width
  * the 48-bit SimHash needs so that a hamming<=3 near-dup join has a
  * vanishing random-collision rate (P ~ 1.8e4/2^48), unlike the 16-bit
  * audit fingerprint. Registered as `graft_hash48_arr`. */
case class Hash48ArrayExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash48_arr expects ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash48_arr"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SimHashExpr.computeHash48(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.SimHashExpr.computeHash48($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Hash48ArrayExpr =
    copy(child = newChild)
}

/** Native 48-bit SimHash over pre-hashed token values — same one-pass
  * counter loop as [[SimHash16Expr]], widened to the near-dup-join
  * fingerprint width. Registered as `graft_simhash48`. */
case class SimHash48Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash48 expects ARRAY<BIGINT>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash48"

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.computeSimhash48(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHashExpr.computeSimhash48($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash48Expr =
    copy(child = newChild)
}
