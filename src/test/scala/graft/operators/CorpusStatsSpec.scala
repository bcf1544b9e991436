package graft.operators

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** CorpusStats contract: both scalars from one job, and that job runs once
  * per (dir, table, fingerprint) per JVM — repeat lookups launch NO Spark
  * job (the round-6 finding: every vector/text gate query was re-running
  * count()/max() jobs for a per-corpus constant). */
class CorpusStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("values match a direct aggregation") {
    val stats = CorpusStats.of(spark, sf, "embeddings", "vec_id")
    val r = spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(count(lit(1)), max(col("vec_id"))).head()
    assert(stats.n == r.getLong(0))
    assert(stats.maxId == r.getLong(1))
    assert(CorpusStats.count(spark, sf, "embeddings", "vec_id") == stats.n)
    assert(CorpusStats.maxId(spark, sf, "embeddings", "vec_id") == stats.maxId)
  }

  test("memoized: a repeat lookup launches zero Spark jobs") {
    CorpusStats.of(spark, sf, "documents", "doc_id") // ensure computed
    val before = CorpusStats.computes
    val sentinelJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val otherJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val group = "cstats-sentinel"
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g = Option(j.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == group) sentinelJobs.incrementAndGet()
        else otherJobs.incrementAndGet()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val again = CorpusStats.of(spark, sf, "documents", "doc_id")
      assert(again.n > 0)
      assert(CorpusStats.computes == before, "repeat lookup re-computed")
      // The listener bus is async: prove "zero jobs above" by running one
      // TAGGED sentinel job, waiting for the SENTINEL's own start event
      // (matching on its job group — an untagged wait would be satisfied
      // by a regressed lookup's job arriving first), then asserting no
      // untagged job started. RDD count, not Dataset count: AQE splits a
      // Dataset count's shuffle into two jobs.
      spark.sparkContext.setJobGroup(group, "CorpusStatsSpec sentinel")
      try spark.sparkContext.range(0, 10).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (sentinelJobs.get() < 1 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(sentinelJobs.get() == 1, "sentinel job start never observed")
      assert(otherJobs.get() == 0,
        s"repeat lookup launched ${otherJobs.get()} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("distinct corpora and a regenerated corpus get fresh stats") {
    val a = CorpusStats.of(spark, sf, "embeddings", "vec_id")
    val b = CorpusStats.of(spark, "/root/testdata/sf0.1", "embeddings", "vec_id")
    assert(b.n > a.n) // sf0.1 embeddings is the only scaled corpus
    // Regeneration: same path, new fingerprint → recomputed.
    val dir = java.nio.file.Files.createTempDirectory("cstats_").toString
    spark.range(5).selectExpr("id AS vec_id")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(CorpusStats.of(spark, dir, "t", "vec_id") == CorpusStats.Stats(5, 4))
    spark.range(7).selectExpr("id AS vec_id")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(CorpusStats.of(spark, dir, "t", "vec_id") == CorpusStats.Stats(7, 6))
  }
}
