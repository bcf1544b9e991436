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
  * split into g = ceil(m/maxGroup) sub-groups (deterministic
  * `hash(id) % g` — hashing, not `id % g`, because structured id layouts
  * collapse plain modulo onto few residues whenever gcd(id-stride, g) > 1,
  * recreating the very skew the split exists to remove) and
  * the join runs over the TRIANGLE of sub-group pairs, keyed on the PAIR
  * (i, j): the x side explodes each row of sub-group i to every target
  * index j ≥ i, the y side explodes each row of sub-group j to every
  * source index i ≤ j, and the join matches x.__sub = y.__i AND
  * x.__j = y.__sub — so each unordered pair is produced exactly once
  * (same-sub pairs by the id order, cross-sub pairs by the (i,j)
  * triangle) and each join bucket holds ONE (i, j) sub-group pair:
  * ~(m/g)² ≈ maxGroup² candidate pairs, even for j = g-1. (Keying only on
  * j — one-sided explode — would put ALL x-rows with __sub ≤ j into
  * bucket j, an O(m·maxGroup) straggler on exactly the hot
  * near-duplicate clusters this operator exists for.)
  * Result-identical to the unsalted join at any maxGroup; explode cost is
  * ~g/2 copies per row on each side, i.e. linear in m·(m/maxGroup)/m = the
  * sub-group count, not in the pair count.
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
      .withColumn("__sub", pmod(hash(col(idCol)), col("__g")).cast("int"))
    val x = dd.withColumn("__j", explode(sequence(col("__sub"), col("__g") - 1)))
    val y = dd.withColumn("__i", explode(sequence(lit(0), col("__sub"))))
    val cond = keyCols.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col("x.__j") === col("y.__sub") &&
      col("x.__sub") === col("y.__i") &&
      (col("x.__sub") =!= col("y.__sub") ||
        col(s"x.$idCol") < col(s"y.$idCol"))
    x.as("x").join(y.as("y"), cond)
      .select(
        least(col(s"x.$idCol"), col(s"y.$idCol")).as("id_a"),
        greatest(col(s"x.$idCol"), col(s"y.$idCol")).as("id_b"))
  }

  /** All CROSS pairs (one row from `left` × one from `right`) sharing
    * `keyCols`, as (id_a = left id, id_b = right id) — the two-relation
    * sibling of [[pairs]] for incremental pipelines (standing corpus ×
    * arriving batch). Same guard, rectangle form: each side is sub-split
    * into ceil(m/maxGroup) hash groups and the join is keyed on the
    * (left-sub, right-sub) CELL — the left row replicates across the
    * right's sub indices and vice versa, so every join bucket holds one
    * ~maxGroup × maxGroup cell even when BOTH sides hash the same hot key
    * (an unsalted key join would put the whole |L|·|R| block of a hot key
    * into one task). Keys present on only one side produce nothing and
    * are dropped by the size joins. Result-identical to the plain keyed
    * join at any maxGroup. */
  def crossPairs(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 idCol: String, maxGroup: Int): DataFrame = {
    val lsz = left.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__ls"))
    val rsz = right.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__rs"))
    def grouped(df: DataFrame) = df.join(lsz, keyCols).join(rsz, keyCols)
      .withColumn("__gl", ceil(col("__ls").cast("double") / maxGroup).cast("int"))
      .withColumn("__gr", ceil(col("__rs").cast("double") / maxGroup).cast("int"))
    val l = grouped(left)
      .withColumn("__sub", pmod(hash(col(idCol)), col("__gl")).cast("int"))
      .withColumn("__j", explode(sequence(lit(0), col("__gr") - 1)))
    val r = grouped(right)
      .withColumn("__sub", pmod(hash(col(idCol)), col("__gr")).cast("int"))
      .withColumn("__i", explode(sequence(lit(0), col("__gl") - 1)))
    val cond = keyCols.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
      col("l.__sub") === col("r.__i") && col("l.__j") === col("r.__sub")
    l.as("l").join(r.as("r"), cond)
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
  }
}
