package graft

import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Etl
import graft.classify.Geo
import graft.processors.AccessProcessors._

/** Full process_stats-equivalent run: TSV day files -> filters ->
  * processor fan-out -> partitioned fact tables -> checkpoint. */
class EtlEndToEndSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("etl-e2e")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeDay(dir: java.io.File, day: String, lines: Seq[String]): Unit = {
    val f = new java.io.File(dir, s"${day.take(4)}/$day.log.gz")
    f.getParentFile.mkdirs()
    val out = new GZIPOutputStream(new java.io.FileOutputStream(f))
    out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
  }

  test("full ETL run: ingest, filter, fan out, write facts, checkpoint") {
    val logs = Files.createTempDirectory("etl-logs").toFile
    val facts = Files.createTempDirectory("etl-facts").toString
    val ckpt = Files.createTempDirectory("etl-ckpt").toString

    writeDay(logs, "2024-03-01", Seq(
      // download from google with search terms, IP in geo range 1.x low
      "2024-03-01T10:00:00Z\t1.5.0.1\tMozilla/5.0 Chrome/99\thttps://www.google.com/search?q=dark+matter\tsvc\t12\t7",
      // double-click 10 min later (same ip/item/doc, within 1h) -> dropped
      "2024-03-01T10:10:00Z\t1.5.0.1\tMozilla/5.0 Chrome/99\thttps://www.google.com/search?q=dark+matter\tsvc\t12\t7",
      // abstract view (no docid), Firefox, direct
      "2024-03-01T11:00:00Z\t2.5.0.1\tMozilla/5.0 Firefox/115\t\tsvc\t12\t",
      // robot -> dropped
      "2024-03-01T12:00:00Z\t5.6.7.8\tGooglebot/2.1\thttps://x.com\tsvc\t12\t7"))
    writeDay(logs, "2024-03-02", Seq(
      "2024-03-02T09:00:00Z\t1.5.0.1\tOpera/9.80\t123\tsvc\t99\t8"))

    val cfg = Etl.Config(
      logGlob = logs.getAbsolutePath + "/*/*.log.gz",
      factRoot = facts, checkpointDir = ckpt,
      processors = Seq(DownloadsViews, DocDownloads,
        Countries(Geo.demoRanges(spark)), Browsers,
        Referrer("myrepo.org"), SearchTerms),
      today = java.time.LocalDate.of(2024, 3, 4))

    val written = Etl.run(spark, cfg)
    assert(written("downloads") > 0)

    // downloads and views land in SEPARATE fact tables (the reference
    // stores them as separate datasets): 1 download day1 (dup dropped),
    // 1 download day2; 1 view day1
    val dl = spark.read.parquet(s"$facts/downloads")
      .collect().map(r => (r.getAs[java.sql.Date]("date").toString,
        r.getAs[String]("value"), r.getAs[Long]("count"))).toSet
    assert(dl == Set(
      ("2024-03-01", "downloads", 1L),
      ("2024-03-02", "downloads", 1L)))
    val vw = spark.read.parquet(s"$facts/views")
      .collect().map(r => (r.getAs[java.sql.Date]("date").toString,
        r.getAs[String]("value"), r.getAs[Long]("count"))).toSet
    assert(vw == Set(("2024-03-01", "views", 1L)))

    // countries: both downloads from 1.x.0.1 -> US (octet 1)
    val cc = spark.read.parquet(s"$facts/countries")
      .collect().map(r => (r.getAs[String]("value"), r.getAs[Long]("count"))).toList
    assert(cc.forall(_._1 == "US") && cc.map(_._2).sum == 2)

    // search terms from the one kept google hit
    val terms = spark.read.parquet(s"$facts/search_terms")
      .collect().map(_.getAs[String]("value")).toSet
    assert(terms == Set("dark", "matter"))

    // browsers include Chrome, Firefox, Opera; no robot UA
    val browsers = spark.read.parquet(s"$facts/browsers")
      .collect().map(_.getAs[String]("value")).toSet
    assert(browsers == Set("Chrome", "Firefox", "Opera"))

    // checkpoint recorded the newest day
    assert(graft.store.FactStore.loadCheckpoint(ckpt, "access")
      .contains("2024-03-02"))

    // incremental rerun with a new day file only processes the new day;
    // a file dated `today` is still live and must be SKIPPED (St1)
    writeDay(logs, "2024-03-03", Seq(
      "2024-03-03T09:00:00Z\t3.5.0.1\tMozilla/5.0 Chrome/99\t\tsvc\t12\t9"))
    writeDay(logs, "2024-03-04", Seq(
      "2024-03-04T09:00:00Z\t3.5.0.1\tMozilla/5.0 Chrome/99\t\tsvc\t12\t9"))
    val written2 = Etl.run(spark, cfg)
    assert(written2("downloads") == 1L) // only the new CLOSED day's rows
    val dv2 = spark.read.parquet(s"$facts/downloads")
    assert(dv2.count() == 3) // days 1-2 intact + day 3; day 4 skipped
    assert(graft.store.FactStore.loadCheckpoint(ckpt, "access")
      .contains("2024-03-03")) // checkpoint NOT advanced past the live day

    // backfill whose recount goes to ZERO for a previously-populated
    // day: rerun 03-02 onward with Opera classified as a robot — the
    // only 03-02 download drops out, so its stale partition must be
    // CLEARED (dynamic overwrite alone would leave it); 03-01 is
    // outside the window and must survive
    val written3 = Etl.run(spark, cfg.copy(
      fromDate = Some(java.time.LocalDate.of(2024, 3, 2)),
      uaPatterns = graft.filters.Robots.defaultUaPatterns :+ "opera"))
    assert(written3("downloads") == 1L) // just day 3's download
    val dv3 = spark.read.parquet(s"$facts/downloads")
      .collect().map(_.getAs[java.sql.Date]("date").toString).toSet
    assert(dv3 == Set("2024-03-01", "2024-03-03"))

    // A5 cache maintenance ran on every phase: the lifetime view must
    // equal a full recompute even though the LAST run was a backfill
    // that REWROTE days already merged into it (full-rebuild path —
    // a delta merge here would have double-counted day 2's history)
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("value")),
        r.getLong(r.fieldIndex("count")))).toSet
    val mv = graft.store.LifetimeMv.read(spark, s"$facts/_mv/downloads").get
    val full = spark.read.parquet(s"$facts/downloads")
      .groupBy("id", "value")
      .agg(org.apache.spark.sql.functions.sum("count").as("count"))
    assert(totals(mv) == totals(full))
  }
}
