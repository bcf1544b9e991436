package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic keep-gate family shared by the mixture-building
  * queries (q49 stratified, q75 weighted, q80 quota balance, q101
  * temperature resample): every sampling decision is a pure function of a
  * salted 32-bit hash of the row id — no RNG, so every engine, every run,
  * and every partitioning draws the SAME sample, and the DuckDB oracle can
  * mirror the gate verbatim.
  *
  * Exact-arithmetic discipline for the scaled gate `h · a < b · 2^32`
  * (keep with probability ≈ b·2^32 / (a·2^32) clamped to [0,1], since
  * h is uniform on [0, 2^32)): an int64 product `h·a` wraps SILENTLY in
  * non-ANSI Spark once `a` reaches 2^31 — e.g. a language whose Σ n_chars
  * passes ~2 GB of text, exactly the scale this pipeline targets — while
  * DuckDB promotes to HUGEINT and stays exact, a silent cross-engine
  * divergence. So both sides of the inequality are evaluated in Spark
  * decimal with TIGHT operand precisions, never a blanket decimal(38,0)
  * (Spark caps multiply precision at 38; oversized operands would make it
  * round, losing exactness):
  *
  *   h:(10,0) · a:(19,0)            → (30,0)  exact
  *   b:(19,0) · 2^32:(10,0)         → (30,0)  exact
  *   k:(2,0) · b:(19,0) · 2^32:(10,0) → (33,0) exact
  *
  * All products stay under precision 38, so every comparison is exact for
  * any int64 `a`/`b` — the same headroom as the oracle's HUGEINT.
  */
object KeepGate {

  /** The family's per-row draw: hash32("prefix|" + id), uniform on
    * [0, 2^32). The prefix salts the stream so independent gates over the
    * same ids (sampling vs splitting vs mixing) decorrelate. */
  def draw(prefix: String, id: Column): Column =
    TextFns.hash32(concat(lit(prefix + "|"), id.cast("string")))

  /** Exact scaled gate: keep iff h · a < b · 2^32 (expected keep
    * probability min(1, b/a); the inequality absorbs the clamp for free
    * since h < 2^32). `a` and `b` are int64 columns of any magnitude. */
  def ltScaled(h: Column, a: Column, b: Column): Column =
    expr_ltScaled(h, a, b, kLit = None)

  /** [[ltScaled]] with a small constant multiplier on the keep side:
    * keep iff h · a < k · b · 2^32, k in [0, 99] so the (2,0) factor
    * keeps the right-hand product at (33,0) — still exact. */
  def ltScaledK(h: Column, a: Column, k: Int, b: Column): Column = {
    require(k >= 0 && k <= 99, s"k=$k outside the (2,0) operand budget")
    expr_ltScaled(h, a, b, kLit = Some(k))
  }

  private def expr_ltScaled(h: Column, a: Column, b: Column,
                            kLit: Option[Int]): Column = {
    val lhs = h.cast("decimal(10,0)") * a.cast("decimal(19,0)")
    val scale = lit(1L << 32).cast("decimal(10,0)")
    val rhs0 = b.cast("decimal(19,0)") * scale
    val rhs = kLit.fold(rhs0)(k => lit(k).cast("decimal(2,0)") * rhs0)
    lhs < rhs
  }

  /** Percent gate: keep iff h mod 100 < rate (rate in [0,100]) — the
    * coarse-but-cheap member used when rates are whole percents (q49). */
  def pct(h: Column, rate: Column): Column =
    pmod(h, lit(100)) < rate

  /** Threshold gate against a precomputed [0, 2^32] threshold column
    * (q101's temperature thresholds): keep iff h < t. */
  def belowThreshold(h: Column, t: Column): Column =
    h < t
}
