package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of gate queries plus their DuckDB oracle SQL.
  *
  * Contract (driver correctness gate): for every key in `queries` there is
  * either a matching `oracles` entry whose ANSI SQL produces the same rows,
  * schema, and values over the same parquet tables, or no entry (rows-only
  * check). Column names must match exactly between the Spark result and the
  * SQL aliases; every result is explicitly ordered by a deterministic key so
  * row order can never differ between engines.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
