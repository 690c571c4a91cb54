package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * with the same key and time <= the left row's time (the attribution
  * / snapshot-alignment join — "which view led to this purchase",
  * "which config revision was live for this hit").
  *
  * Spark's DataFrame API has no as-of join. Per the escalation ladder
  * (SURVEY.md §7.3) this COMPOSES built-ins instead of dropping to a
  * custom SparkPlan, because the semantics are exactly expressible:
  * union both sides tagged, one window pass per key ordered by
  * (time, side), and `last(_, ignoreNulls = true)` carries the latest
  * right payload forward into each left row.
  *
  * Scale posture: ONE shuffle (the window partition by key) — the
  * same shuffle a sort-merge as-of implementation would pay; no
  * range-condition nested-loop join (the naive left.join(right,
  * lt >= rt) + max() formulation is quadratic per key). Right rows
  * are pre-deduped to one per (key, time) so the pick is
  * deterministic in any engine (ties at the same time resolve to the
  * MAX payload id, matching e.g. DuckDB's ASOF against a deduped
  * build side).
  *
  * Inputs: `left(key, ltime, lid)`, `right(key, rtime, rid)` — all
  * numeric/long columns. Output: (key, lid, ltime, rid, rtime) with
  * null rid/rtime when no right row precedes the left row.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
      ltime: String, lid: String, rtime: String, rid: String): DataFrame = {
    // one right row per (key, time): deterministic pick on time ties
    val r1 = right.groupBy(col(key), col(rtime).as("__t"))
      .agg(max(col(rid)).as("__rid"))
      .select(col(key), col("__t"), lit(0).as("__side"),
        col("__rid"), lit(null).cast("long").as("__lid"))
    val l1 = left.select(col(key), col(ltime).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__rid"),
      col(lid).as("__lid"))
    // at equal time the right row sorts first (__side 0 < 1), so a
    // right row AT the left row's time is visible to it (<= semantics)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r1.unionByName(l1)
      .withColumn("__last_rid", last(col("__rid"), ignoreNulls = true).over(w))
      .withColumn("__last_rt",
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(key), col("__lid").as(lid), col("__t").as(ltime),
        col("__last_rid").as(rid), col("__last_rt").as(rtime))
  }

  /** Same semantics and output shape as [[leftAsOf]], executed by the
    * whole-operator Catalyst stack ([[graft.plans.AsOfJoinPlan]] →
    * [[graft.plans.AsOfJoinExec]], planned via the injected
    * [[graft.plans.AsOfJoinStrategy]]). Each side shuffles
    * independently on its own key (no unioned superset-schema
    * exchange) and the merge is a one-pass zip of the sorted
    * partitions. Right rows are pre-deduped to one per (key, time)
    * with MAX(id), identical to [[leftAsOf]], so ties are
    * deterministic. Both sides are re-aliased to fresh attributes
    * before the node is built (self-join safety: the custom node is
    * invisible to DeduplicateRelations).
    */
  def leftAsOfNative(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, ltime: String, lid: String, rtime: String, rid: String): DataFrame = {
    val l = left.select(col(key).as("__lk"), col(ltime).as("__lt"),
      col(lid).as("__lid"))
    val r = right.groupBy(col(key).as("__rk"), col(rtime).as("__rt"))
      .agg(max(col(rid)).as("__rid"))
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"missing column $n"))
    val lp = GraftBridge.analyzed(l)
    val rp = GraftBridge.analyzed(r)
    // AsOfJoinExec merges with orderings built from the LEFT side's
    // types — a long/int mismatch would compare garbage, so fail fast.
    require(attr(lp, "__lk").dataType == attr(rp, "__rk").dataType,
      s"as-of key types differ: ${attr(lp, "__lk").dataType} vs ${attr(rp, "__rk").dataType}")
    require(attr(lp, "__lt").dataType == attr(rp, "__rt").dataType,
      s"as-of time types differ: ${attr(lp, "__lt").dataType} vs ${attr(rp, "__rt").dataType}")
    val plan = graft.plans.AsOfJoinPlan(lp, rp,
      Seq(attr(lp, "__lk")), Seq(attr(rp, "__rk")),
      attr(lp, "__lt"), attr(rp, "__rt"))
    GraftBridge.ofRows(spark, plan)
      .select(col("__lk").as(key), col("__lid").as(lid),
        col("__lt").as(ltime), col("__rid").as(rid), col("__rt").as(rtime))
  }
}
