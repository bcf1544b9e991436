package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The oversized-group salting guard behind q47's embedding dedup: pair
  * generation must be result-identical to the plain keyed self-join at any
  * maxGroup, and the sub-group-PAIR join keying must bound the number of
  * candidate pairs any single join bucket (≈ task) can own — including the
  * highest sub-group index, where a one-sided explode would still pile up
  * O(m·maxGroup) candidates (the round-5 advisor finding). */
class SaltedSelfPairsSpec extends SparkSpec {

  /** One hot key owning 500 rows (the near-duplicate-cluster skew shape),
    * one medium key, and a singleton. Ids are deliberately NON-contiguous
    * (stride 6) — the layout where a plain id % g sub-grouping collapses
    * onto gcd-shared residues while hash(id) % g stays uniform. */
  private def skewed() = {
    import spark.implicits._
    val hot = (0 until 500).map(i => (6L * i, 7L, 0L))
    val mid = (0 until 30).map(i => (10000L + i, 8L, 1L))
    val one = Seq((20000L, 9L, 2L))
    (hot ++ mid ++ one).toDF("vec_id", "band", "key")
  }

  private def collectPairs(maxGroup: Int): Seq[(Long, Long)] =
    SaltedSelfPairs.pairs(skewed(), Seq("band", "key"), "vec_id", maxGroup)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("salted pairs are exactly the unsalted self-join's pairs") {
    // Ground truth computed directly: all unordered id pairs per key.
    val hotIds = (0 until 500).map(6L * _)
    val midIds = (0 until 30).map(10000L + _)
    def tri(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val expected = (tri(hotIds) ++ tri(midIds)).sorted
    assert(expected.size == 500 * 499 / 2 + 30 * 29 / 2)
    assert(collectPairs(1000000) == expected, "g = 1 (unsalted) baseline")
    assert(collectPairs(50) == expected, "hot key splits into g = 10")
    assert(collectPairs(7) == expected,
      "g = 72 for the hot key, g = 5 for the mid key")
  }

  test("every (key, i, j) join bucket is bounded by ~maxGroup² pairs") {
    val maxGroup = 25
    val df = skewed()
    // Recompute the salt assignment exactly as pairs() does; the join
    // bucket for sub-pair (i, j) holds |sub i| × |sub j| candidates.
    val sizes = df.groupBy(col("band"), col("key")).agg(count(lit(1)).as("__gs"))
    val dd = df.join(sizes, Seq("band", "key"))
      .withColumn("__g", ceil(col("__gs").cast("double") / maxGroup).cast("int"))
      .withColumn("__sub", pmod(hash(col("vec_id")), col("__g")).cast("int"))
    val subSizes = dd.groupBy(col("band"), col("key"), col("__sub"))
      .agg(count(lit(1)).as("n")).collect().map(_.getAs[Long]("n"))
    val maxSub = subSizes.max
    // 500 rows hashed over g = 20 classes: ~25 each, multinomial wobble
    // stays well inside 2× (and is deterministic — murmur3 is fixed).
    assert(maxSub <= 2L * maxGroup)
    // The quadratic unit of work after salting vs the unsalted hot task
    // (500·499/2 ≈ 125k candidate pairs in ONE task without the split).
    val unsaltedHotPairs = 500L * 499 / 2
    assert(maxSub * maxSub < unsaltedHotPairs / 10)
  }

  test("crossPairs are exactly the plain keyed cross join's pairs, at any maxGroup") {
    import spark.implicits._
    // Both sides share the hot key 7 (300 × 200 rows — the shape where an
    // unsalted key join puts a 60k-pair block into one task), plus a key
    // present on only one side (must yield nothing).
    val left = ((0 until 300).map(i => (6L * i, 7L)) ++
      (0 until 10).map(i => (5000L + i, 8L)) ++ Seq((7000L, 5L)))
      .toDF("vec_id", "key")
    val right = ((0 until 200).map(i => (100000L + 3L * i, 7L)) ++
      (0 until 4).map(i => (200000L + i, 8L)) ++ Seq((300000L, 6L)))
      .toDF("vec_id", "key")
    val expected = (for (a <- 0 until 300; b <- 0 until 200)
        yield (6L * a, 100000L + 3L * b)) ++
      (for (a <- 0 until 10; b <- 0 until 4)
        yield (5000L + a, 200000L + b))
    def got(maxGroup: Int) = SaltedSelfPairs
      .crossPairs(left, right, Seq("key"), "vec_id", maxGroup)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got(1000000) == expected.sorted, "unsalted baseline")
    assert(got(50) == expected.sorted, "hot key: 6 × 4 sub-cells")
    assert(got(3) == expected.sorted, "aggressive split")
  }

  test("crossPairs: every (key, i, j) cell is bounded even when BOTH sides are hot") {
    import spark.implicits._
    val maxGroup = 25
    val left = (0 until 300).map(i => (6L * i, 7L)).toDF("vec_id", "key")
    val right = (0 until 200).map(i => (100000L + 3L * i, 7L)).toDF("vec_id", "key")
    // Recompute the cell assignment exactly as crossPairs does.
    def subSizes(df: org.apache.spark.sql.DataFrame, g: Int) =
      df.withColumn("__sub", pmod(hash(col("vec_id")), lit(g)))
        .groupBy(col("__sub")).agg(count(lit(1)).as("n"))
        .collect().map(_.getAs[Long]("n"))
    val gl = math.ceil(300.0 / maxGroup).toInt
    val gr = math.ceil(200.0 / maxGroup).toInt
    val maxL = subSizes(left, gl).max
    val maxR = subSizes(right, gr).max
    assert(maxL <= 2L * maxGroup && maxR <= 2L * maxGroup)
    // One cell owns ≤ maxL·maxR pairs vs the whole 60k block unsalted.
    assert(maxL * maxR < 300L * 200 / 10)
  }
}
