package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** graft_hash16_arr + graft_simhash16 must equal the HOF formulation they
  * replaced in q36 — retained here as the parity reference. */
class SimHashParitySpec extends SparkSpec {

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "spark structured streaming state store",
    "a", "", "one two three four five six seven eight nine ten",
    "dup dup dup dup dup")

  private def hofSimhash(hs: org.apache.spark.sql.Column) = {
    val folds = (0 until 16).map { i =>
      aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L)
                           .otherwise(-1L))
    }
    (0 until 16).map { i =>
      when(folds(i) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("native hash16 + simhash16 equal the HOF md5Bits16 + 16-fold form") {
    val session = spark
    import session.implicits._
    val df = docs.toDF("text").withColumn("toks", TextFns.tokens(col("text")))
    val rows = df.select(
        TextFns.hash16Array(col("toks")).as("nh"),
        transform(col("toks"), t => TextFns.md5Bits16(t)).as("hh"),
        call_function("graft_simhash16",
          TextFns.hash16Array(col("toks"))).as("nsim"),
        hofSimhash(transform(col("toks"), t => TextFns.md5Bits16(t))).as("hsim"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  private def hofSimhash48(hs: org.apache.spark.sql.Column) = {
    val folds = (0 until 48).map { i =>
      aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L)
                           .otherwise(-1L))
    }
    (0 until 48).map { i =>
      when(folds(i) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("native hash48 + simhash48 equal the HOF conv-prefix + 48-fold form") {
    val session = spark
    import session.implicits._
    val df = docs.toDF("text").withColumn("toks", TextFns.tokens(col("text")))
    val rows = df.select(
        TextFns.hash48Array(col("toks")).as("nh"),
        transform(col("toks"), t => TextFns.hash48(t)).as("hh"),
        TextFns.simhash48(TextFns.hash48Array(col("toks"))).as("nsim"),
        hofSimhash48(transform(col("toks"), t => TextFns.hash48(t))).as("hsim"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }
}
