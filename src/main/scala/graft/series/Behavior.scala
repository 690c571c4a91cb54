package graft.series

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream — the two classic
  * shapes one step beyond the reference's per-item time series
  * (SURVEY §2.7): ordered conversion funnels and cohort retention.
  * Both are plain multi-stage aggregations, declared so Catalyst
  * plans every stage as hash aggregates / shuffle joins on the user
  * key.
  *
  * Scale posture: every stage groups or joins on the SAME user key,
  * so consecutive exchanges hash-partition identically and AQE reuses
  * the layout; nothing is collected driver-side and no window spans
  * more than one user's rows.
  */
object Behavior {

  /** Ordered funnel: for each step i, the users whose step-i event
    * happens at-or-after their step-(i-1) entry time. Returns one row
    * per step: (step, name, users). `events` needs (user, type, sec)
    * columns named by the params.
    *
    * Single-scan, single-shuffle: each step's entry time is a
    * whole-partition window MIN whose condition references the
    * previous step's window result — every window shares the one
    * partitioning by user, so N steps cost one Exchange total (the
    * naive per-step join-and-reaggregate form scans the events once
    * PER STEP and shuffles each time). The per-user groupBy after the
    * windows reuses the same hash layout, and only the final
    * three-counter row crosses to the driver. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      secCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    val withTimes = steps.zipWithIndex.foldLeft(events) {
      case (df, (step, i)) =>
        val ordered =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(secCol) >= col(s"__t${i - 1}")
        df.withColumn(s"__t$i", min(when(ordered, col(secCol))).over(w))
    }
    // window results are constant per user; max() just picks them
    val perUser = withTimes.groupBy(col(userCol))
      .agg(max(col("__t0")).as("t0"),
        steps.indices.drop(1).map(i => max(col(s"__t$i")).as(s"t$i")): _*)
    val counters = perUser.agg(count(col("t0")).as("c0"),
      steps.indices.drop(1).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    counters.select(explode(array(steps.zipWithIndex.map {
      case (name, i) => struct(lit(i + 1).as("step"), lit(name).as("name"),
        col(s"c$i").as("users"))
    }: _*)).as("r")).select("r.step", "r.name", "r.users").orderBy("step")
  }

  /** Multi-touch LINEAR attribution: each conversion's unit of credit
    * is split equally across that user's touch events inside the
    * lookback window (touch at-or-before the conversion, strictly
    * within `lookbackSec`). Credit is integer thousandths —
    * floor(1000/n_touches) per touch — so the rollup stays engine-
    * exact; conversions with zero in-window touches simply attribute
    * nothing (the inner join drops them), matching the classic
    * last/linear-touch model's "organic" bucket.
    *
    * Shape: one equi-join on the user key with a residual time-range
    * predicate (users are high-cardinality, so the shuffle is even),
    * then a per-conversion window COUNT to size each split — the
    * window key is the conversion id, so no partition exceeds one
    * conversion's touch set — then a hash aggregate on the touch day.
    *
    * Returns (date, touches, credit_x1000) — the per-day share of
    * conversion credit earned by that day's touches. */
  def linearAttribution(events: DataFrame, userCol: String,
      typeCol: String, touchType: String, convType: String,
      tsCol: String = "ts", idCol: String = "event_id",
      lookbackSec: Long = 7L * 86400): DataFrame = {
    val e = events.filter(col(userCol).isNotNull)
      .withColumn("__sec", unix_timestamp(col(tsCol)))
    val conv = e.filter(col(typeCol) === convType)
      .select(col(userCol), col("__sec").as("__csec"), col(idCol).as("__cid"))
    val touch = e.filter(col(typeCol) === touchType)
      .select(col(userCol).as("__tu"), col("__sec").as("__tsec"),
        to_date(col(tsCol)).as("date"))
    val joined = touch.join(conv,
      col("__tu") === col(userCol) &&
        col("__tsec") <= col("__csec") &&
        col("__tsec") > col("__csec") - lookbackSec)
    val w = Window.partitionBy("__cid")
    joined
      .withColumn("__credit",
        floor(lit(1000.0) / count(lit(1)).over(w)).cast("long"))
      .groupBy("date")
      .agg(count(lit(1)).as("touches"), sum("__credit").as("credit_x1000"))
      .orderBy("date")
  }

  /** Weekly cohort retention: users bucketed by the Monday of their
    * first-seen week; for each (cohort, week-offset) the count of
    * distinct users active that many whole weeks after their own
    * first day. `events` needs (user, date) columns. */
  def cohortRetention(events: DataFrame, userCol: String,
      dateCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(col(dateCol)).as("d0"))
    events.join(first, userCol)
      .select(col(userCol),
        date_trunc("week", col("d0")).cast("date").as("cohort"),
        expr(s"datediff($dateCol, d0) div 7").cast("int").as("wk"))
      .groupBy("cohort", "wk")
      .agg(count_distinct(col(userCol)).as("active"))
      .orderBy("cohort", "wk")
  }
}
