package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional file pruning.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet/ORC footers carry per-file (and per-row-group) min/max for
  * every column, and the scan planner prunes files whose range can't
  * match the predicate. Sorting by a single column makes THAT column's
  * ranges tight but leaves every other column's ranges full-width; a
  * space-filling-curve key interleaves the bits of several columns so
  * that sorting by the one key keeps EVERY interleaved column's
  * min/max narrow within each file — multi-dimensional pruning from a
  * one-dimensional sort (the Z-ordering used by modern lakehouse
  * table formats; cf. Morton, 1966).
  *
  * The key is pure integer bit arithmetic (shifts, masks, adds) —
  * codegen'd, no UDF, engine-exact — so it can double as a verifiable
  * clustering transform: bucket rows by `zkey >> s` and the per-bucket
  * min/max of each dimension SHOWS the pruning width a file of that
  * bucket would have. */
object Layout {

  /** Morton/Z-order interleave of two dimension columns, `bits` bits
    * each (dimensions must already be scaled into [0, 2^bits));
    * dimension `a` occupies even bit positions, `b` odd. Disjoint
    * bit positions make the combine a plain sum. */
  def zOrder2(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, "need 1 <= bits <= 31")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}
