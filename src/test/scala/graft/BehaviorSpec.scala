package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.series.Behavior

/** Funnel step-ordering and cohort week-bucketing semantics. */
class BehaviorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("behavior-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("funnel honors step order per user") {
    val s = spark; import s.implicits._
    val events = Seq(
      // A: full ordered funnel
      ("A", "view", 10L), ("A", "click", 20L), ("A", "purchase", 30L),
      // B: click BEFORE first view — must not reach step 2
      ("B", "click", 5L), ("B", "view", 10L),
      // C: view only
      ("C", "view", 50L),
      // D: purchase with no view at all — reaches nothing
      ("D", "purchase", 99L))
      .toDF("user_id", "event_type", "sec")
    val out = Behavior.funnel(events, "user_id", "event_type", "sec",
      Seq("view", "click", "purchase")).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel equal timestamps count (at-or-after semantics)") {
    val s = spark; import s.implicits._
    val events = Seq(("U", "view", 7L), ("U", "click", 7L))
      .toDF("user_id", "event_type", "sec")
    val out = Behavior.funnel(events, "user_id", "event_type", "sec",
      Seq("view", "click")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("cohort retention buckets by the user's own first week") {
    val s = spark; import s.implicits._
    def d(x: String) = java.sql.Date.valueOf(x)
    // 2024-01-01 is a Monday
    val events = Seq(
      ("A", d("2024-01-02")), ("A", d("2024-01-10")), // wk 0, wk 1
      ("B", d("2024-01-03")), ("B", d("2024-01-09")), // wk 0 twice (6 days)
      ("C", d("2024-01-09")))                         // later cohort, wk 0
      .toDF("user_id", "d")
    val out = Behavior.cohortRetention(events, "user_id", "d")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L), // A+B active in their first week
      ("2024-01-01", 1, 1L), // only A comes back a whole week later
      ("2024-01-08", 0, 1L)))
  }
}
