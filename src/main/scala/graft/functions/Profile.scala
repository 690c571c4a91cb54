package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass table profiling (the ANALYZE-TABLE shape): per-column
  * row/non-null/distinct counts and min/max, computed in ONE scan and
  * returned as one row per column.
  *
  * Scale posture: all columns' aggregates live in a single aggregate
  * node, so the table is read once no matter how many columns are
  * profiled (the naive per-column loop reads it N times). Exact
  * multi-column COUNT(DISTINCT) makes Catalyst expand the input
  * (one replica per distinct aggregate — still a single scan, but
  * shuffle volume scales with the column count); at 100 TB profile
  * with `exact = false`, which swaps in `approx_count_distinct`
  * (HLL++, no Expand, one ordinary partial-agg shuffle) — the
  * standard stats-collection trade-off. Min/max aggregate on the
  * NATIVE type (so numeric/date ordering is semantic, not
  * lexicographic) and cast to string only for display. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    def ndv(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    val stats = cols.map { c =>
      struct(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        ndv(col(c)).as("ndv"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
    }
    df.agg(array(stats: _*).as("s"))
      .select(explode(col("s")).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nonnull"),
        col("p.ndv"), col("p.min_s"), col("p.max_s"))
  }
}
