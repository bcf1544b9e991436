package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) layout key: interleave the bits of two dimensions into
  * one sort key so that a single range-partitioned sort co-locates rows
  * that are close in BOTH dimensions — the standard multi-dimensional
  * clustering key for 100 TB scan locality (a filter on either dimension
  * prunes contiguous zkey ranges, so min/max footer stats keep working
  * after the rewrite; a plain two-column sort only prunes the leading
  * column).
  *
  * The spread is the classic magic-mask bit dance: 4 shift-or-mask steps
  * move bit i of a 16-bit value to bit 2i. Pure long arithmetic on
  * codegen'd built-ins (shiftleft / bitwise and-or) — identical operator
  * set exists in ANSI SQL, so the oracle runs the same arithmetic.
  *
  * Usage for layout: `df.repartitionByRange(n, zkey(a, b))
  * .sortWithinPartitions(zkey(a, b))` before the write — each output file
  * then covers one compact z-range rectangle of the key space.
  */
object ZOrder {

  /** (shift, mask) steps shared with the SQL-oracle generator — one
    * definition so the two engines cannot drift. */
  private[graft] val spreadMasks: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of x so that bit i lands at position 2i;
    * values are first wrapped into [0, 2^16). */
  def spread16(x: Column): Column =
    spreadMasks.foldLeft(pmod(x.cast("long"), lit(65536L))) {
      case (c, (s, m)) => c.bitwiseOR(shiftleft(c, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of (a, b): a's bits at even positions, b's at odd. */
  def zkey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
}
