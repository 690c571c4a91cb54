package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.series.Series
import graft.store.Bucketing

/** Scale-lever specs: bucketed shuffle-free joins, salted skew joins,
  * bounded densification. */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .appName("scale-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join without a shuffle exchange") {
    val s = spark; import s.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"v$i", i.toLong))
      .toDF("id", "value", "count")
    val dims = (0L until 50L).map(i => (i, s"set${i % 5}")).toDF("id", "set_value")
    Bucketing.writeBucketed(facts, "b_facts", "id", buckets = 8)
    Bucketing.writeBucketed(dims, "b_dims", "id", buckets = 8)
    // Force the sort-merge path: broadcast would win on this tiny dim
    // and hide the bucketing effect under a BroadcastExchange.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join splits a hot key and preserves results") {
    val s = spark; import s.implicits._
    // 90% of rows hit key 1 (the hot item)
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i.toLong))
      .toDF("key", "payload")
    val small = (0L until 10L).map(i => (i, s"dim$i")).toDF("key", "name")
    val plain = big.join(small, "key")
    val salted = Bucketing.saltedJoin(big, small, "key",
      saltFactor = 4, saltSource = "payload")
    assert(salted.count() == plain.count())
    assert(salted.columns.toSet == plain.columns.toSet)
    assert(salted.agg(sum("payload")).head().getLong(0) ==
      plain.agg(sum("payload")).head().getLong(0))
  }

  test("fingerprints plan pays exactly one shuffle (window; agg reuses it)") {
    val s = spark; import s.implicits._
    val docs = (1L to 50L).map(i => (i, s"w$i x$i y$i z$i q$i"))
      .toDF("doc_id", "text")
    val plan = graft.dedup.Dedup.fingerprints(docs)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
  }

  test("densify honors an explicit requested range") {
    val s = spark; import s.implicits._
    val series = Seq((java.sql.Date.valueOf("2024-03-10"), 5L))
      .toDF("d", "cnt")
    val out = Series.densify(series,
      from = Some(java.time.LocalDate.of(2024, 3, 8)),
      to = Some(java.time.LocalDate.of(2024, 3, 12)))
      .orderBy("d").collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 0L, 5L, 0L, 0L))
  }
}
