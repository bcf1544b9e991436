package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the query surface.
  *
  * Determinism note: summing doubles is order-dependent, and a distributed
  * engine must not promise a summation order. Every aggregate that feeds the
  * correctness gate therefore sums fixed-point integers (`round(x * 10^k)` as
  * LONG) and divides back at the end — bit-identical regardless of partial
  * aggregation order, and identical to the same formula evaluated by any other
  * engine on the same input doubles.
  */
object Num {

  /** Lenient numeric cast mirroring the reference's `toNum`
    * (/root/reference/src/etl.js:75-79): strip everything except
    * `[0-9.\-]`, then cast; malformed → NULL (callers filter NULLs, which
    * matches the reference's filter-non-finite idiom).
    */
  def toNum(c: Column): Column = {
    // JS `String(v ?? '')` maps null/undefined to '' first, so a NULL input
    // behaves exactly like an empty string below.
    val stripped = regexp_replace(coalesce(c.cast("string"), lit("")), "[^0-9.\\-]", "")
    // Guarded cast: Spark 4 runs ANSI mode by default, where a malformed
    // cast throws instead of yielding NULL. JS `Number('')` is 0 (finite),
    // so a digit-free input yields 0.0 — not NULL. The regex admits exactly
    // the strings JS `Number()` accepts post-strip ("5.", "-.5", "007");
    // what it NaNs ("1-2", "1.2.3", "-", ".") becomes NULL here, matching
    // the reference's filter-non-finite idiom.
    when(stripped === "", lit(0.0))
      .when(stripped.rlike("^-?(\\d+\\.?\\d*|\\.\\d+)$"), stripped.cast("double"))
  }

  /** Exact fixed-point sum: sum(round(x*10^dp) as long) / 10^dp, as double. */
  def fixedSum(c: Column, dp: Int): Column = {
    val scale = math.pow(10, dp)
    (sum(round(c * scale).cast("long")) / scale).cast("double")
  }

  /** Exact fixed-point mean (sum in integer space, divide by count). */
  def fixedAvg(c: Column, dp: Int): Column = {
    val scale = math.pow(10, dp)
    (sum(round(c * scale).cast("long")) / count(c) / scale).cast("double")
  }

  /** clamp01 as used by the reference scorecard (/root/reference/src/scoring.js:31-32). */
  def clamp01(c: Column): Column = greatest(lit(0.0), least(lit(1.0), c))
}
