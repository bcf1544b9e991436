package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the clustering
  * stage of a large-scale dedup pipeline: near-dup PAIRS (q34) are not
  * deletion decisions until transitive groups are resolved (A~B, B~C must
  * put A,B,C in ONE cluster even when A~C was never emitted as a pair).
  *
  * Algorithm: min-label propagation with pointer jumping (the path-doubling
  * step of Shiloach-Vishkin). Each round does
  *   1. propagate: comp'(u) = min(comp(u), min over neighbors v of comp(v))
  *   2. jump:      comp''(u) = comp(comp'(u))
  * Every comp value is itself a vertex id, so step 2 is a self-join of the
  * label table — it halves the distance to the component minimum, giving
  * O(log diameter) rounds where plain propagation needs O(diameter). Both
  * steps are keyed equi-joins + one agg: at cluster scale each round is two
  * hash shuffles of the label table (|V| rows, 2 longs) plus one of the
  * edge list — no all-pairs, no driver-side row data. The driver loop runs
  * over per-round SCALAR actions only (the convergence check), the same
  * shape as IVF's Lloyd iterations.
  *
  * Convergence: labels only ever decrease, so Σ comp strictly decreases
  * until the fixpoint — one decimal-sum action per round (overflow-safe at
  * any vertex count), no second join against the previous labels.
  *
  * Memory contract: the undirected edge list is reused every round, so it
  * is persisted DISK_ONLY (the on-disk-table pattern, nothing pinned in
  * executor memory) and unpersisted before returning. Per-round label
  * tables MUST be lineage-truncated, not merely persisted: the jump step
  * self-joins the round's plan, so without truncation the logical plan
  * doubles every round and planning itself blows up exponentially
  * (observed as a stack overflow printing the tree at ~10 rounds). Each
  * round is therefore an eager localCheckpoint — label tables are |V|
  * rows × 2 longs, a vanishing fraction of corpus size; on a cluster with
  * lossy executors point this at reliable checkpoint storage instead
  * (the standard Pregel discipline — GraphX does exactly this). Old
  * round blocks are dropped by the ContextCleaner as references die.
  */
object ConnectedComponents {

  /** Labels every vertex appearing in `edges`: returns (id, component)
    * where component = the minimum vertex id in the connected component.
    * Vertices with no edges are absent (callers union them back as
    * singletons if needed). Throws if maxIter rounds do not converge —
    * 2^maxIter exceeds any real component diameter long before 30.
    */
  def apply(edges: DataFrame, src: String, dst: String, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
    val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(StorageLevel.DISK_ONLY)
    try {
      var cur = und.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("component"))
        .localCheckpoint(true)
      var curSum = checksum(cur)
      var round = 0
      var converged = false
      while (!converged) {
        require(round < maxIter, s"connected components did not converge in $maxIter rounds")
        val nbrMin = und
          .join(cur.select(col("id").as("v"), col("component").as("vc")), Seq("v"))
          .groupBy(col("u")).agg(min(col("vc")).as("nmin"))
        val prop = cur
          .join(nbrMin, cur("id") === nbrMin("u"), "left")
          .select(cur("id"), least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        // comp values are vertex ids, so prop maps them too: jump one hop.
        val next = prop.as("a")
          .join(prop.as("b"), col("a.component") === col("b.id"), "left")
          .select(col("a.id").as("id"),
            least(col("a.component"), coalesce(col("b.component"), col("a.component"))).as("component"))
          .localCheckpoint(true)
        val nextSum = checksum(next)
        cur = next
        converged = nextSum == curSum
        curSum = nextSum
        round += 1
      }
      cur
    } finally und.unpersist(blocking = false)
  }

  /** Σ comp as decimal(38,0) — exact at any scale; equal sums ⇒ fixpoint
    * because labels are componentwise non-increasing across rounds. */
  private def checksum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
      .head.getDecimal(0)
}
