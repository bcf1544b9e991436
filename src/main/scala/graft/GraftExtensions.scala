package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}
import graft.expressions.{BigramStatsExpr, CosineSimilarityExpr, Hash16ArrayExpr, Hash32ArrayExpr, Hash48ArrayExpr, MinHashFromHashesExpr, MinHashSignatureExpr, ShingleHash32Expr, SimHash16Expr, SimHash48Expr, SortedIntersectCountExpr, TrigramPackExpr, WordHitsExpr}

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions as SQL functions so both the DataFrame surface
  * (`expr("graft_minhash(sh, 8)")`) and plain `spark.sql` can use them.
  * Activated via `spark.sql.extensions=graft.GraftExtensions`
  * (GraftSession sets it). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "graft_minhash"),
      (children: Seq[Expression]) => children match {
        case Seq(arr, IntegerLiteral(num)) => MinHashSignatureExpr(arr, num)
        case _ => throw new IllegalArgumentException(
          "graft_minhash(shingles ARRAY<STRING>, numHashes INT literal)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_icount"),
      new ExpressionInfo(classOf[SortedIntersectCountExpr].getName,
        "graft_sorted_icount"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => SortedIntersectCountExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_sorted_icount(a ARRAY<BIGINT> sorted, b ARRAY<BIGINT> sorted)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash32_arr"),
      new ExpressionInfo(classOf[Hash32ArrayExpr].getName, "graft_hash32_arr"),
      (children: Seq[Expression]) => children match {
        case Seq(arr) => Hash32ArrayExpr(arr)
        case _ => throw new IllegalArgumentException(
          "graft_hash32_arr(arr ARRAY<STRING>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_hs"),
      new ExpressionInfo(classOf[MinHashFromHashesExpr].getName,
        "graft_minhash_hs"),
      (children: Seq[Expression]) => children match {
        case Seq(arr, IntegerLiteral(num)) => MinHashFromHashesExpr(arr, num)
        case _ => throw new IllegalArgumentException(
          "graft_minhash_hs(hs ARRAY<BIGINT>, numHashes INT literal)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_word_hits"),
      new ExpressionInfo(classOf[WordHitsExpr].getName, "graft_word_hits"),
      (children: Seq[Expression]) => children match {
        case Seq(toks, words) => WordHitsExpr(toks, words)
        case _ => throw new IllegalArgumentException(
          "graft_word_hits(toks ARRAY<STRING>, words ARRAY<STRING> literal)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_trigram_pack"),
      new ExpressionInfo(classOf[TrigramPackExpr].getName, "graft_trigram_pack"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => TrigramPackExpr(text)
        case _ => throw new IllegalArgumentException(
          "graft_trigram_pack(text STRING)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hash32"),
      new ExpressionInfo(classOf[ShingleHash32Expr].getName,
        "graft_shingle_hash32"),
      (children: Seq[Expression]) => children match {
        case Seq(arr, IntegerLiteral(n)) => ShingleHash32Expr(arr, n)
        case _ => throw new IllegalArgumentException(
          "graft_shingle_hash32(toks ARRAY<STRING>, n INT literal)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash16_arr"),
      new ExpressionInfo(classOf[Hash16ArrayExpr].getName, "graft_hash16_arr"),
      (children: Seq[Expression]) => children match {
        case Seq(arr) => Hash16ArrayExpr(arr)
        case _ => throw new IllegalArgumentException(
          "graft_hash16_arr(arr ARRAY<STRING>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo(classOf[SimHash16Expr].getName, "graft_simhash16"),
      (children: Seq[Expression]) => children match {
        case Seq(arr) => SimHash16Expr(arr)
        case _ => throw new IllegalArgumentException(
          "graft_simhash16(hs ARRAY<BIGINT>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash48_arr"),
      new ExpressionInfo(classOf[Hash48ArrayExpr].getName, "graft_hash48_arr"),
      (children: Seq[Expression]) => children match {
        case Seq(arr) => Hash48ArrayExpr(arr)
        case _ => throw new IllegalArgumentException(
          "graft_hash48_arr(arr ARRAY<STRING>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash48"),
      new ExpressionInfo(classOf[SimHash48Expr].getName, "graft_simhash48"),
      (children: Seq[Expression]) => children match {
        case Seq(arr) => SimHash48Expr(arr)
        case _ => throw new IllegalArgumentException(
          "graft_simhash48(hs ARRAY<BIGINT>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => CosineSimilarityExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_cosine(a ARRAY<FLOAT|DOUBLE>, b ARRAY<FLOAT|DOUBLE>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bigram_stats"),
      new ExpressionInfo(classOf[BigramStatsExpr].getName, "graft_bigram_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(toks) => BigramStatsExpr(toks)
        case _ => throw new IllegalArgumentException(
          "graft_bigram_stats(toks ARRAY<STRING>)")
      }))
  }
}
