package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-key top-k.
  *
  * The naive `row_number over (partition by key order by s)` sorts ALL rows
  * of a key in one task — with few keys (e.g. 5 query vectors against a
  * billion-row corpus) that is a single-task external sort. This helper
  * selects the same rows in two bounded levels:
  *
  *   1. top-k within (key, salt) buckets — each task sorts ~n/salt rows;
  *   2. top-k over the ≤ k·salt level-1 survivors per key — a tiny sort.
  *
  * The final top-k is invariant to the salting because every true top-k row
  * wins its own bucket. `sortCols` must define a total order (include a
  * unique tiebreak column) for a deterministic result.
  */
object TopK {

  /** Adds a `rank` column (1..k) per key group. `saltExpr` is any
    * deterministic expression spreading rows across buckets (e.g. a row id
    * modulo is fine; it need not be uniform, only high-cardinality). */
  def perKey(df: DataFrame, keyCols: Seq[String], sortCols: Seq[Column],
             k: Int, saltExpr: Column, salt: Int = 32): DataFrame = {
    val w1 = Window
      .partitionBy(keyCols.map(col) :+ pmod(saltExpr, lit(salt)): _*)
      .orderBy(sortCols: _*)
    val survivors = df
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k)
      .drop("__rn1")
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(sortCols: _*)
    survivors
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
  }
}
