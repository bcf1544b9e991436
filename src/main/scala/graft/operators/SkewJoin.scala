package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * A shuffle join sends every row of a key to ONE reducer; a hot key
  * (celebrity user, default value, null surrogate) turns into one
  * straggler task. Salting splits the hot key's rows across `salt`
  * sub-partitions: the fact side gets a deterministic salt from a
  * high-cardinality column, the dimension side is replicated `salt` ways,
  * and the join key becomes (key, salt). Result set is IDENTICAL to the
  * unsalted join; only the partitioning changes.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; explicit
  * salting still matters for aggregate-like patterns, non-SMJ paths, and
  * when the skew is known ahead of time — and it is the portable answer
  * when AQE is off.
  */
object SkewJoin {

  /** Inner equi-join of `facts` (skewed) with `dim` (small, replicated).
    * `saltSource` must be deterministic per fact row (e.g. a row id);
    * `dim` grows by a factor of `salt` — keep salt modest (8-64). */
  def saltedInner(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                  saltSource: Column, salt: Int = 16): DataFrame = {
    val saltedFacts = facts.withColumn("__salt", pmod(saltSource, lit(salt)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i)): _*)))
    saltedFacts.join(saltedDim, keys :+ "__salt").drop("__salt")
  }
}
