package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table surface: the co-located-join story at 100 TB. A table
  * written with `bucketBy(n, key)` + `sortBy(key)` persists its hash
  * partitioning in the catalog, so a join (or aggregation) on the bucket
  * key needs NO shuffle — EnsureRequirements sees both sides already
  * hash-partitioned the same way and plans a sort-merge join straight
  * over the scans. For fact tables re-joined on the same key across many
  * queries (lineitem⋈orders, corpus⋈signatures), this converts the
  * dominant per-query shuffle into a one-time write-side cost.
  *
  * Bucket-count rule of thumb at scale: `total size / bucket` should land
  * near the target task size (128-256 MB); both sides of a co-located
  * join must agree on (key, count) — Spark joins tables with DIFFERENT
  * bucket counts by shuffling the smaller-bucketed side unless one count
  * divides the other.
  */
object BucketedTables {

  /** Writes `df` as a managed parquet table bucketed AND sorted by `key`:
    * sorted buckets additionally skip the sort phase of downstream
    * sort-merge joins on the key. Overwrites any existing table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
