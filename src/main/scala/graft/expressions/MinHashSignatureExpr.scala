package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression computing a full MinHash signature in ONE
  * fused pass over a shingle array: md5-prefix 32-bit base hash per
  * element, then all `numHashes` affine permutations
  * `(h·(2j+1) + j²+7) mod 2^31-1` with running minima.
  *
  * Why a custom Expression (the builder-prompt (b) tier): the same math as
  * `TextFns.hash32` + `TextFns.minhashSignature`, but the HOF formulation
  * evaluates `numHashes` interpreted lambda passes per row and re-walks
  * the array each time — the dominant cost of the near-dup pipeline.
  * Here codegen emits a single static call per row (no per-element
  * virtual dispatch, no extra array materializations), and eval stays
  * available for interpreted paths. Bit-identical to the HOF formulation
  * and to the DuckDB oracle's strpos-arithmetic (verified by
  * MinHashExprSpec and gate queries q34/q35).
  *
  * Registered as SQL function `graft_minhash(shingles, numHashes)` via
  * graft.GraftExtensions (SparkSessionExtensions).
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignatureExpr.compute(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.MinHashSignatureExpr.compute($c, $numHashes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** Sibling of [[MinHashSignatureExpr]] for PRE-HASHED shingle relations:
  * the standing (doc_id, hs ARRAY<BIGINT>) signature tables the dedup
  * family materializes already paid the md5 per shingle, but the HOF
  * `minhashSignature` then ran `numHashes` interpreted array_min/transform
  * passes per row per consumer (bands() in q34/q35/q51, DocSig banding in
  * q54). One fused pass over the long array, same affine permutations,
  * identical output longs (MinHashExprSpec parity).
  *
  * Registered as SQL function `graft_minhash_hs(hs, numHashes)`;
  * TextFns.minhashSignature binds to it via call_function. */
case class MinHashFromHashesExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_hs expects ARRAY<BIGINT>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_hs"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignatureExpr.computeFromHashes(
        input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.MinHashSignatureExpr.computeFromHashes($c, $numHashes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashesExpr =
    copy(child = newChild)
}

/** Vectorized `TextFns.hash32` over a string array: md5-prefix 32-bit hash
  * per element in one tight loop. The HOF form — `transform(arr, x =>
  * hash32(x))` — evaluates an interpreted conv/substring/md5 expression
  * tree per element (HOFs are CodegenFallback), which dominates the
  * one-time shingle/fingerprint table builds (q34's cold index build,
  * q48's token hashing, the streaming projections). Hash values identical
  * to the HOF form (same md5-prefix arithmetic as [[MinHashSignatureExpr]],
  * whose string parity MinHashExprSpec already pins). Elements must be
  * non-null (split/filter-produced arrays always are).
  *
  * Registered as SQL function `graft_hash32_arr`; TextFns.hash32Array
  * binds it. */
case class Hash32ArrayExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash32_arr expects ARRAY<STRING>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash32_arr"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignatureExpr.computeHash32(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.MinHashSignatureExpr.computeHash32($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Hash32ArrayExpr =
    copy(child = newChild)
}

object MinHashSignatureExpr {

  /** md5-prefix 32-bit hash per element (== conv(substring(md5(x),1,8),
    * 16,10)). Called from generated code. */
  def computeHash32(arr: ArrayData): Array[Long] = {
    val md = digests.get()
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      out(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
               ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    out
  }

  /** Affine-permutation minima over pre-hashed shingles — the tail of
    * [[compute]] without the md5. Called from generated code. */
  def computeFromHashes(arr: ArrayData, num: Int): Array[Long] = {
    val sig = Array.fill(num)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < num) {
        val v = (h * (2L * j + 1) + j.toLong * j + 7L) % 2147483647L
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Thread-local MD5 shared by the sibling hashing expressions. */
  private[expressions] def digest(): MessageDigest = digests.get()

  /** One pass: per element, md5 → first 4 bytes as unsigned 32-bit (==
    * `conv(substring(md5(s),1,8),16,10)`), then running minima of the
    * affine permutations. Called from generated code. */
  def compute(arr: ArrayData, num: Int): Array[Long] = {
    val sig = Array.fill(num)(Long.MaxValue)
    val md = digests.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
              ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      var j = 0
      while (j < num) {
        val v = (h * (2L * j + 1) + j.toLong * j + 7L) % 2147483647L
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }
}
