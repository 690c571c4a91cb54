package graft.series

import org.apache.spark.sql.DataFrame
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
    * columns named by the params. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      secCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)
    // fold: frame of (user, entryTime) survivors after each step
    val survivors = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = events.filter(col(typeCol) === step)
        val eligible = prev match {
          case None => hits
          case Some(p) => hits.join(p, userCol)
            .filter(col(secCol) >= col("entry"))
        }
        Some(eligible.groupBy(u).agg(min(col(secCol)).as("t"))
          .select(u, col("t").as("entry")))
    }.flatten
    survivors.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(name).as("name"), col("users"))
    }.reduce(_.unionByName(_)).orderBy("step")
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
