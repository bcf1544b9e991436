package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed [[Aggregator]] (SURVEY §2.9
  * surface): at most `k` (token, counter) pairs whose counters satisfy, for
  * every token x with true frequency f(x) over a stream of n items,
  *
  *   f(x) - n/(k+1)  <=  est(x)  <=  f(x)        (absent => est = 0)
  *
  * so every token with f(x) > n/(k+1) is GUARANTEED present, and no token
  * is ever overcounted. Both properties survive arbitrary partitioning and
  * merge order (Agarwal et al., "Mergeable Summaries", PODS 2012): `reduce`
  * is the classic streaming update, `merge` sums counters then subtracts
  * the (k+1)-th largest and drops the non-positive — each subtraction is
  * bounded by the merged weight over k+1, which telescopes to n/(k+1).
  *
  * This is the engine's bounded-memory frequent-items path: a full groupBy
  * is exact but shuffles the whole keyset; an MG summary is O(k) per
  * partition and one O(k·partitions) merge — at 100 TB the sketch costs a
  * map-side pass plus a constant-size final reduce, and the bound above is
  * what the q66 gate enforces against exact counts.
  *
  * The sketch CONTENT (which sub-threshold tokens happen to survive, and
  * the exact counter values) is merge-order dependent, hence
  * run-to-run nondeterministic under parallelism — consumers must gate on
  * the guarantees, never on raw counter equality (q66 emits booleans).
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "MisraGries needs at least one counter")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)            => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // Full and x unseen: decrement every counter by 1 (x's own count
        // is absorbed by the same decrement), dropping zeros.
        b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // (k+1)-th largest counter; subtracting it and dropping <= 0 leaves
      // at most k survivors (ties at the cut all drop).
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  def finish(r: Map[String, Long]): Map[String, Long] = r
  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
