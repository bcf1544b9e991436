package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * Each loader is a plain parquet scan: Catalyst handles column pruning and
  * predicate pushdown, so callers should select/filter directly on the result
  * and let the optimizer reach the scan. At cluster scale the same paths work
  * against partitioned directories; nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as a raw long (legacy conf) and truncate to
    * microseconds with integer division — the same ns→µs truncation DuckDB
    * applies internally, so both engines see identical timestamps. The
    * division stays in long space: ns-since-epoch (~1.7e18) exceeds double's
    * 53-bit mantissa, so a float path would corrupt timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // The read path needs the legacy conf (see GraftSession, which sets it
    // at session build). Set-if-absent here keeps standalone callers working
    // without clobbering an explicit caller choice; the conf only affects
    // TIMESTAMP(NANOS) parquet columns, which no other corpus table has.
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` surfaces the corpus.
    * `events` goes through its dedicated loader so the view carries proper
    * microsecond timestamps (a bare load() would either throw on
    * TIMESTAMP(NANOS) or expose raw nanos longs). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
