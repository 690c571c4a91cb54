package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.operators.AsOfJoin

/** The whole-operator as-of join (AsOfJoinPlan/Strategy/Exec) must be
  * result-identical to the composed union+window form, and its
  * physical plan must actually be the custom operator with two
  * independent child exchanges (no unioned superset-schema shuffle).
  */
class AsOfNativeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .appName("asof-native-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach(body)
    }

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 80)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 5L)
      t <- Gen.choose(0L, 10000L)
    } yield (k, t))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }

  test("native as-of join matches the composed union+window form") {
    forAllSeeded(eventsGen, n = 8) { rows =>
      val s = spark; import s.implicits._
      val (l, r) = rows.partition(_._3 % 2 == 0)
      if (l.nonEmpty && r.nonEmpty) {
        val left = l.toDF("k", "lt", "lid")
        val right = r.toDF("k", "rt", "rid")
        def key(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
            if (x.isNullAt(3)) -1L else x.getLong(3),
            if (x.isNullAt(4)) -1L else x.getLong(4))).sorted.toList
        val composed = key(AsOfJoin.leftAsOf(left, right, "k", "lt", "lid", "rt", "rid"))
        val native = key(AsOfJoin.leftAsOfNative(s, left, right, "k", "lt", "lid", "rt", "rid"))
        assert(native == composed)
      }
    }
  }

  test("left rows with no preceding right row keep null payloads") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 10L, 1L), (2L, 5L, 2L)).toDF("k", "lt", "lid")
    val right = Seq((1L, 3L, 7L), (2L, 6L, 8L)).toDF("k", "rt", "rid")
    val out = AsOfJoin.leftAsOfNative(s, left, right, "k", "lt", "lid", "rt", "rid")
      .orderBy("lid").collect()
    assert(out(0).getLong(3) == 7L)   // k=1: rt 3 <= lt 10
    assert(out(1).isNullAt(3))        // k=2: rt 6 > lt 5 -> no match
  }

  test("physical plan is AsOfJoinExec with per-side exchanges, no union") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 10L, 1L)).toDF("k", "lt", "lid")
    val right = Seq((1L, 3L, 7L)).toDF("k", "rt", "rid")
    val df = AsOfJoin.leftAsOfNative(s, left, right, "k", "lt", "lid", "rt", "rid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.toLowerCase.contains("union"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
  }
}
