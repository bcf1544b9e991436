package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.Tables

/** Scratch profiler for the MinHash pipeline stages at a given SF dir. */
object Q34Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = Tables.documents(spark, d).select(
      col("doc_id"),
      array_distinct(TextFns.wordShingles(TextFns.tokens(col("text")), 3)).as("sh"))
    time("shingles count")(sh.count())
    val sig = sh.select(col("doc_id"), TextFns.minhashSignature(col("sh"), 8).as("mh"))
    time("signatures count")(sig.count())
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map(b => TextFns.lshBand(col("mh"), b, 2)): _*)).as(Seq("b", "key")))
    time("bands count")(bands.count())
    val bp = bands.persist()
    time("bands persist count")(bp.count())
    val cand = bp.as("x").join(bp.as("y"),
        col("x.key") === col("y.key") && col("x.b") === col("y.b") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("candidates count")(cand.count())
    time("full q34 count")(SparkEntry.queries("q34_minhash_pairs")(spark, d).count())
    spark.stop()
  }
}
