package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Memoized per-corpus scalar statistics (row count, max id).
  *
  * The ANN/dedup queries derive their index geometry from the corpus row
  * count (planes per band, centroid count, sample gate) and split
  * incremental-dedup corpora at a fraction of the id space — both need a
  * scalar that is CONSTANT per corpus. Before this cache each gate query
  * re-ran a Spark job (`emb.count()`, `agg(max(id)).head`) for that
  * constant on every invocation: bounded scalar actions, not a collect
  * anti-pattern, but 1-2 pure-overhead jobs per query (a measurable chunk
  * of the small-corpus warm time, and at 100 TB a full-corpus scan each).
  *
  * Both statistics come from ONE aggregation job and are memoized under the
  * same key discipline as [[MaterializeOnce]]: the key embeds the source
  * fingerprint, so a corpus regenerated at the same path within one JVM is
  * re-counted rather than served stale. The map stores memoized FUTURES —
  * the aggregation job runs OUTSIDE the map lock (running it inside
  * `computeIfAbsent` held the hash-bin lock for the job's full duration, so
  * concurrent first lookups of unrelated corpora hashing to the same bin
  * serialized behind it — the same hazard MaterializeOnce's future form
  * exists for).
  */
object CorpusStats {

  /** (rowCount, maxId). */
  final case class Stats(n: Long, maxId: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CompletableFuture[Stats]]()

  /** Number of stat jobs run so far this JVM (spec hook: asserts the
    * memoization actually eliminates repeat jobs). Atomic — a plain
    * volatile += is a lost-update race under concurrent first
    * computations of distinct keys. */
  private val computeCount = new java.util.concurrent.atomic.AtomicInteger(0)
  def computes: Int = computeCount.get()

  /** Row count and max of `idCol` for `$dir/$table.parquet`, computed in a
    * single Spark job per (dir, table, source fingerprint) per JVM. */
  def of(s: SparkSession, dir: String, table: String, idCol: String): Stats = {
    val key = s"$dir|$table|$idCol|${MaterializeOnce.fingerprint(dir, s"$table.parquet")}"
    val fut = new java.util.concurrent.CompletableFuture[Stats]()
    val prior = cache.putIfAbsent(key, fut)
    if (prior != null) {
      try prior.join()
      catch { case e: java.util.concurrent.CompletionException =>
        throw Option(e.getCause).getOrElse(e)
      }
    } else
      try {
        computeCount.incrementAndGet()
        val r = s.read.parquet(s"$dir/$table.parquet")
          .agg(org.apache.spark.sql.functions.count(lit(1)),
               max(col(idCol).cast("long"))).head()
        val stats = Stats(r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
        fut.complete(stats)
        stats
      } catch { case e: Throwable =>
        fut.completeExceptionally(e)
        cache.remove(key, fut)
        throw e
      }
  }

  def count(s: SparkSession, dir: String, table: String, idCol: String): Long =
    of(s, dir, table, idCol).n

  def maxId(s: SparkSession, dir: String, table: String, idCol: String): Long =
    of(s, dir, table, idCol).maxId
}
