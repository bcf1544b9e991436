package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  /** Naive bit-by-bit reference interleave. */
  private def refZ(a: Long, b: Long): Long = {
    val x = ((a % 65536) + 65536) % 65536
    val y = ((b % 65536) + 65536) % 65536
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
    }
  }

  test("zkey matches the bit-by-bit reference on edges and a value sweep") {
    import spark.implicits._
    val edge = Seq(0L, 1L, 2L, 255L, 256L, 32767L, 32768L, 65535L, 65536L, 70000L)
    val sweep = (0 until 500).map(i => (i * 131L + 17) % 90000)
    val cases = (for { a <- edge; b <- edge } yield (a, b)) ++
      sweep.zip(sweep.reverse)
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zkey(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == refZ(a, b), s"zkey($a, $b)")
    }
  }

  test("zkey range-prunes both dimensions: fixing one dim bounds the key") {
    // Every key with a == const lies in ranges derivable from the spread of
    // a alone: z & evenMask is constant. This is the property that makes
    // footer min/max stats useful after a z-order rewrite.
    import spark.implicits._
    val df = (0 until 256).map(b => (42L, b.toLong)).toDF("a", "b")
      .select(ZOrder.zkey(col("a"), col("b")).as("z"))
    val evens = df.collect().map(_.getLong(0) & 0x55555555L).distinct
    assert(evens.length == 1 && evens.head == refZ(42, 0))
  }
}
