package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-round oracle gate for the `graft-zip` DSv2 source (q195): before
  * this pack, all declared queries read parquet, so the zip scan surface —
  * central-directory parse, positioned reads, predicate-gated inflation,
  * SmartCsv over `content` — sat outside the tier-refresh hash discipline
  * (ZipEntrySourceSpec is strong, but specs don't re-run per corpus tier).
  *
  * The gate is a ROUND TRIP anchored in the corpus itself, so no committed
  * binary fixture and no oracle-side zip support is needed: a bounded,
  * deterministic slice of the `orders` table (o_orderkey <= KeyCap —
  * ~4000 rows at EVERY tier, since the generator's key space is dense from
  * 0) is serialized to CSV entries inside real ZIP archives (JDK
  * ZipOutputStream, deflate), then read back through
  * `spark.read.format("graft-zip")` + SmartCsv and aggregated; the oracle
  * is plain DuckDB SQL over the ORIGINAL parquet rows. Any fault anywhere
  * in the zip/CSV path — a mis-parsed central directory, a clipped
  * positioned read, a dropped row in SmartCsv — hash-fails the gate.
  *
  * Fixture-vs-engine split: building the archives collects the bounded
  * slice to the driver (fixture CONSTRUCTION, once per corpus fingerprint,
  * ≤ ~4001 rows by the KeyCap bound at any tier — never O(corpus)); the
  * GATED path — zip scan, entry-predicate pushdown, inflation, CSV parse,
  * aggregation — is all distributed Spark. Money stays in exact integer
  * cents until the final presentation division, the house fixed-point
  * rule.
  */
object ZipGateQueries extends QueryPack {

  /** Key bound of the fixture slice: orderkeys are dense from 0 at every
    * tier, so this selects the SAME ~4000 logical rows at sf0.01 and XL2
    * alike — bounded driver-side construction, tier-stable gate volume. */
  private val KeyCap = 4000L

  /** CSV entries per archive set — rows partition by o_orderkey mod this,
    * spread over two archives, so the scan exercises multi-archive
    * planning (one InputPartition each) and multi-entry directories. */
  private val NumCsvEntries = 4

  /** Built fixture dirs by (corpus dir, source fingerprint) — one build
    * per corpus per JVM; roots are removed by a shutdown hook (the
    * MaterializeOnce lifecycle). */
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val hookArmed = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteTree(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(dir))
      scala.util.Using.resource(java.nio.file.Files.walk(dir)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
  }

  /** The fixture archive dir for a corpus: two ZIPs holding four CSV
    * entries (rows split by o_orderkey mod 4, each entry internally
    * o_orderkey-ordered) plus one non-CSV entry per archive that the
    * query's entry predicate must exclude. */
  private[queries] def fixtureDir(s: SparkSession, d: String): String = {
    val key = s"$d|${graft.operators.MaterializeOnce.fingerprint(d, "orders.parquet")}"
    built.computeIfAbsent(key, _ => buildFixture(s, d))
  }

  private def buildFixture(s: SparkSession, d: String): String = {
    import java.nio.file.{Files, Paths}
    if (hookArmed.compareAndSet(false, true))
      sys.addShutdownHook {
        built.values.forEach(p => deleteTree(Paths.get(p)))
      }
    val rows = Tables.orders(s, d)
      .filter(col("o_orderkey") <= KeyCap)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .orderBy(col("o_orderkey"))
      .collect()
    val dir = Files.createTempDirectory(
      Paths.get(System.getProperty("java.io.tmpdir")), "graft_zipgate_")
    val header = "o_orderkey,o_custkey,o_orderstatus,cents"
    val csvs = (0 until NumCsvEntries).map { m =>
      val body = rows.iterator
        .filter(r => r.getLong(0) % NumCsvEntries == m)
        .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getString(2)},${r.getLong(3)}")
        .mkString("\n")
      s"orders_$m.csv" -> s"$header\n$body\n".getBytes("UTF-8")
    }
    csvs.grouped(NumCsvEntries / 2).zipWithIndex.foreach { case (entries, a) =>
      val zos = new java.util.zip.ZipOutputStream(
        Files.newOutputStream(dir.resolve(s"orders_part$a.zip")))
      try {
        (entries :+ (s"readme_$a.txt" ->
          "not a data entry; the gate's entry predicate must drop me".getBytes("UTF-8")))
          .foreach { case (name, bytes) =>
            zos.putNextEntry(new java.util.zip.ZipEntry(name))
            zos.write(bytes)
            zos.closeEntry()
          }
      } finally zos.close()
    }
    dir.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // graft-zip end-to-end under the per-round hash discipline: archives →
    // DSv2 scan (entry predicate pushed to central-directory metadata, so
    // the readme entries are never inflated) → SmartCsv per entry
    // (typed flatMap — the same parse kernel the audit ETL runs, no UDF) →
    // keyed aggregation. Oracle: the original parquet rows in DuckDB.
    "q195_zip_csv_roundtrip" -> ((s, d) => {
      import s.implicits._
      val entries = s.read.format("graft-zip").load(fixtureDir(s, d))
        .filter(col("entry").endsWith(".csv"))
        .select(col("content"))
      val parsed = entries.as[Array[Byte]].flatMap { bytes =>
        graft.etl.SmartCsv.parse(bytes).map { m =>
          (m("o_orderkey").toLong, m("o_custkey").toLong,
            m("o_orderstatus"), m("cents").toLong)
        }
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "cents")
      parsed.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (sum(col("cents")).cast("double") / 100.0).as("sum_price"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Cents rounding mirrors the fixture's round(x*100) exactly (prices
    // are positive, so HALF_UP and half-away-from-zero agree).
    "q195_zip_csv_roundtrip" -> s"""
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price,
             COUNT(DISTINCT o_custkey) AS n_cust
      FROM orders
      WHERE o_orderkey <= $KeyCap
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""
  )
}
