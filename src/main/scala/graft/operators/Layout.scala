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
  def zOrder2(a: Column, b: Column, bits: Int = 8): Column =
    zOrderN(Seq(a -> bits, b -> bits))

  /** N-dimensional Z-order key with PER-DIMENSION bit budgets —
    * the practical 100 TB layout wants unequal precision, e.g.
    * (date: 11 bits, id: 8, source: 3). Bit assignment walks bit
    * levels from 0 upward; at each level every dimension that still
    * has bits left contributes its level-`i` bit, in argument order.
    * Exhausted dimensions drop out, so low-budget dims pack into the
    * LOW key bits and the shared high levels own the top — sorting by
    * the key narrows every dimension's per-file range, most strongly
    * the ones with the largest budgets (equal budgets reduce exactly
    * to the classic cyclic Morton interleave of [[zOrder2]]).
    * Total bits must fit a signed long. Pure integer shifts/masks/
    * adds on disjoint bit positions — codegen'd, engine-exact. */
  def zOrderN(dims: Seq[(Column, Int)]): Column = {
    require(dims.nonEmpty, "need at least one dimension")
    dims.foreach { case (_, b) =>
      require(b >= 1 && b <= 31, s"need 1 <= bits <= 31 per dim, got $b") }
    require(dims.map(_._2).sum <= 62, "total interleaved bits must fit a long")
    val maxBits = dims.map(_._2).max
    var pos = 0
    val terms = for {
      level <- 0 until maxBits
      (c, b) <- dims if level < b
    } yield {
      val t = shiftleft(
        shiftright(c.cast("long"), level).bitwiseAND(lit(1L)), pos)
      pos += 1
      t
    }
    terms.reduce(_ + _)
  }

  /** The same bit assignment as [[zOrderN]], rendered as an ANSI SQL
    * integer expression over the given column names — the cross-engine
    * (oracle) twin, kept next to the Column form so the two walk the
    * same (level, dim) order by construction. */
  def zOrderNSql(dims: Seq[(String, Int)]): String = {
    val maxBits = dims.map(_._2).max
    var pos = 0
    val terms = for {
      level <- 0 until maxBits
      (d, b) <- dims if level < b
    } yield {
      val t = s"((($d >> $level) & 1) << $pos)"
      pos += 1
      t
    }
    terms.mkString(" + ")
  }
}
