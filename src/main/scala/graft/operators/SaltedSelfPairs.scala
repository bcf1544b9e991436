package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed self-join pair generation with an oversized-group salting guard —
  * the generic form of the q37 hot-block split (see
  * graft.queries.TextPipelineQueries.blockedJaccardPairs), reused by the
  * embedding near-dup dedup (q47).
  *
  * A plain keyed self-join (`x.key = y.key && x.id < y.id`) puts a whole
  * key group into one join bucket: a group of size m generates m²/2
  * candidate pairs in a single task, which under skew (one hot key) is the
  * classic quadratic scale-killer. Here a group of size m > maxGroup is
  * split into g = ceil(m/maxGroup) sub-groups (deterministic `id % g`) and
  * the join runs over the TRIANGLE of sub-group pairs: the x side explodes
  * each row to every sub-group index ≥ its own, the y side keys on its own
  * sub-group, so each unordered pair is produced exactly once (same-sub
  * pairs by the id order, cross-sub pairs by the sub order) while no join
  * bucket ever holds more than ~maxGroup² candidate pairs.
  * Result-identical to the unsalted join at any maxGroup.
  */
object SaltedSelfPairs {

  /** All unordered id pairs of rows sharing `keyCols`, as
    * (id_a, id_b) with id_a < id_b. `df` must have a numeric unique
    * `idCol`. Extra per-row payload is NOT carried — join ids back to the
    * source relation (the scale-friendly move: the pair stream stays
    * narrow). */
  def pairs(df: DataFrame, keyCols: Seq[String], idCol: String,
            maxGroup: Int): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val sizes = df.groupBy(keys: _*).agg(count(lit(1)).as("__gs"))
    val dd = df.join(sizes, keyCols)
      .withColumn("__g", ceil(col("__gs").cast("double") / maxGroup).cast("int"))
      .withColumn("__sub", pmod(col(idCol), col("__g")).cast("int"))
    val x = dd.withColumn("__j", explode(sequence(col("__sub"), col("__g") - 1)))
    val cond = keyCols.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col("x.__j") === col("y.__sub") &&
      (col("x.__sub") =!= col("y.__sub") ||
        col(s"x.$idCol") < col(s"y.$idCol"))
    x.as("x").join(dd.as("y"), cond)
      .select(
        least(col(s"x.$idCol"), col(s"y.$idCol")).as("id_a"),
        greatest(col(s"x.$idCol"), col(s"y.$idCol")).as("id_b"))
  }
}
