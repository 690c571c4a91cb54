package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar KPI metrics (SURVEY.md §2.4 A4; ref
  * `View/KeyFigures.pm:13-61,141-167`): named metrics are context
  * rewrites over the fact table; ratio metrics are
  * `round(100 * m1 / m2)`.
  *
  * Scale posture: the reference issues one query per metric; here ALL
  * metrics are conditional aggregates in a SINGLE scan of the fact
  * table — one pass, one partial+final aggregate, however many KPIs
  * the dashboard wants.
  */
object KeyFigures {

  /** A named metric: a filter over the fact table, summing `count`. */
  final case class Metric(name: String, predicate: Column)

  /** Compute all metrics in one pass: returns a 1-row DataFrame with
    * one column per metric. */
  def compute(fact: DataFrame, metrics: Seq[Metric]): DataFrame =
    fact.agg(
      metrics.head.toAgg,
      metrics.tail.map(_.toAgg): _*)

  implicit private class MetricOps(m: Metric) {
    def toAgg: Column =
      coalesce(sum(when(m.predicate, col("count"))), lit(0L)).as(m.name)
  }

  /** Ratio metric: round(100 * a / b), integer percent
    * (ref `KeyFigures.pm:141-167`). Appends a column to a computed
    * metrics row. */
  def withRatio(computed: DataFrame, name: String, a: String, b: String): DataFrame =
    computed.withColumn(name,
      when(col(b) =!= 0,
        round(col(a).cast("double") * 100 / col(b).cast("double"), 0).cast("long"))
        .otherwise(lit(null).cast("long")))
}
