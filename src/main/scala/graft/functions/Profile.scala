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
    // Exact mode SPLITS the distinct counts from the plain stats
    // (r17 optimization; guide §1.2 step 1): mixing count_distinct
    // with min/max(string) in ONE aggregate forces the whole Expand
    // (x cols+1 replicas) through SortAggregate — string-buffered
    // aggregates are not hash-supported, so every expanded row pays
    // two full sorts on the 6-part dedup key. Split, the ndv branch's
    // dedup/count aggregates hash (long buffers only; string GROUP
    // keys are fine) and the min/max branch runs with no Expand and
    // no sort keys at all. Costs one extra column-pruned scan of the
    // input and a 1-row broadcast cross-join; saves the 6x-expanded
    // double sort (measured 2.3s -> 1.5s warm at sf0.1 on 5 columns
    // of orders). Approx mode keeps the true single-scan shape (HLL
    // sketches hash-aggregate fine in one node — the 100 TB path).
    val plainStats = cols.map { c =>
      struct(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
    }
    if (exact) {
      val ndvs = df.agg(
        ndv(col(cols.head)).as("ndv0"),
        cols.tail.zipWithIndex.map { case (c, i) =>
          ndv(col(c)).as(s"ndv${i + 1}") }: _*)
      df.agg(array(plainStats: _*).as("s"))
        .crossJoin(org.apache.spark.sql.functions.broadcast(ndvs))
        .select(col("*"), posexplode(col("s")).as(Seq("i", "p")))
        .select(col("p.column"), col("p.n_rows"), col("p.n_nonnull"),
          element_at(array(cols.indices.map(i => col(s"ndv$i")): _*),
            col("i").cast("int") + 1).as("ndv"),
          col("p.min_s"), col("p.max_s"))
    } else {
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
}
