package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

class MinHashExprSpec extends SparkSpec {

  private def sampleDocs = Seq(
    "key agg row scan slow fast table value",
    "batch window spark order data column agg join",
    "a", "", "one two", "x y z x y z x y z")

  test("native graft_minhash is bit-identical to the HOF formulation") {
    val session = spark
    import session.implicits._
    val df = sampleDocs.toDF("text")
      .withColumn("sh", array_distinct(
        TextFns.wordShingles(TextFns.tokens(col("text")), 3)))
    val hof = df.select(
      TextFns.minhashSignatureHof(
        transform(col("sh"), x => TextFns.hash32(x)), 8).as("mh"))
      .collect().map(_.getSeq[Long](0))
    val native = df.select(expr("graft_minhash(sh, 8)").as("mh"))
      .collect().map(_.getSeq[Long](0))
    assert(native.toSeq == hof.toSeq)
  }

  test("graft_minhash_hs (pre-hashed path) is bit-identical to the HOF formulation") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 100).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(80))(rnd.nextLong().abs % 4294967296L))
    }
    val df = rows.toDF("id", "hs")
    val hof = df.select(TextFns.minhashSignatureHof(col("hs"), 8).as("mh"))
      .collect().map(_.getSeq[Long](0))
    val native = df.select(TextFns.minhashSignature(col("hs"), 8).as("mh"))
      .collect().map(_.getSeq[Long](0))
    assert(native.toSeq == hof.toSeq)
  }

  test("graft_hash32_arr is bit-identical to transform(arr, hash32)") {
    val session = spark
    import session.implicits._
    val df = sampleDocs.toDF("text")
      .withColumn("toks", TextFns.tokens(col("text")))
    val hof = df.select(
        transform(col("toks"), x => TextFns.hash32(x)).as("hs"))
      .collect().map(_.getSeq[Long](0))
    val native = df.select(TextFns.hash32Array(col("toks")).as("hs"))
      .collect().map(_.getSeq[Long](0))
    assert(native.toSeq == hof.toSeq)
  }

  test("registered through extensions: callable from plain SQL") {
    val session = spark
    import session.implicits._
    sampleDocs.toDF("text").createOrReplaceTempView("minhash_docs")
    val n = session.sql(
      """SELECT graft_minhash(
           filter(split(trim(text), '\\s+'), t -> t != ''), 4) AS mh
         FROM minhash_docs""").collect()
    assert(n.forall(_.getSeq[Long](0).length == 4))
  }

  test("type check rejects non-string arrays") {
    val session = spark
    import session.implicits._
    val err = intercept[Exception] {
      Seq(Seq(1, 2, 3)).toDF("a").selectExpr("graft_minhash(a, 4)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_minhash") ||
           err.getMessage.toLowerCase.contains("array<string>"))
  }
}
