package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filters.{Repeat, Robots}
import graft.ingest.AccessLog
import graft.processors.MetricProcessor
import graft.store.FactStore

/** Batch ETL orchestration — the `process_stats` entry point
  * (SURVEY.md §3 entry 3; ref `bin/stats/process_stats:24-159`):
  * scan day files → dedup → filter chain (robots, repeat) → metric
  * processor fan-out → per-datatype fact tables → checkpoint.
  *
  * Scale posture:
  *  - the raw events are read ONCE and persisted post-filter; every
  *    processor aggregates from that shared pass (the reference's
  *    single-pass fan-out, `Access.pm:259-351`);
  *  - each datatype writes its own date-partitioned parquet table via
  *    dynamic partition overwrite, so reruns of a window are
  *    idempotent (`--from-date` semantics, St3);
  *  - the checkpoint records the newest fully-ingested day file;
  *    the next run prunes older files at listing time.
  */
object Etl {

  final case class Config(
      logGlob: String,
      factRoot: String,
      checkpointDir: String,
      processors: Seq[MetricProcessor],
      repeatTimeoutSec: Long = 3600L,
      uaPatterns: Seq[String] = Robots.defaultUaPatterns,
      ipPrefixes: Seq[String] = Robots.defaultIpPrefixes,
      fromDate: Option[java.time.LocalDate] = None,
      /** Day files with this date or newer are considered still live
        * and skipped (St1 — the reference never ingests today's file,
        * `Access.pm:166-171`). Overridable for tests / backfills. */
      today: java.time.LocalDate = java.time.LocalDate.now())

  /** One batch run; returns (datatype -> rows written). */
  def run(spark: SparkSession, cfg: Config): Map[String, Long] = {
    val from = cfg.fromDate.orElse(
      FactStore.loadCheckpoint(cfg.checkpointDir, "access")
        .flatMap(graft.model.DateUtils.parseDate)
        .map(_.plusDays(1)))

    val raw = AccessLog.dedupLines(AccessLog.read(spark, cfg.logGlob, from))
      // St1 day watermark: a file dated today may still be growing —
      // skipping it (not checkpointing past it) is what makes the
      // checkpoint safe to advance.
      .filter(col("file_date") < lit(java.sql.Date.valueOf(cfg.today)))
      // Partition-safety clamp: facts are partitioned by EVENT date but
      // pruning is by FILE date; a late event spilling into a day
      // before `from` would otherwise make dynamic partition overwrite
      // replace that complete partition with just the spillover rows.
      .filter(from.map(d => to_date(col("ts")) >= lit(java.sql.Date.valueOf(d)))
        .getOrElse(lit(true)))
    val filtered = Repeat.sequential(
      Robots.filterRobots(raw, uaPatterns = cfg.uaPatterns,
          ipPrefixes = cfg.ipPrefixes)
        .withColumn("sec", unix_timestamp(col("ts")))
        .withColumn("key_doc", coalesce(col("referent_docid"), lit(-1)))
        .withColumn("tie", monotonically_increasing_id()),
      keyCols = Seq("requester_id", "referent_id", "key_doc"),
      secCol = "sec", timeout = cfg.repeatTimeoutSec, tieBreakCol = "tie")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val written = cfg.processors.flatMap { p =>
      val fact = p.process(filtered)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = fact.count()
      // provides.head names the fact table; multi-datatype processors
      // encode the datatype in `value` (downloads/views)
      FactStore.overwritePartitions(fact, s"${cfg.factRoot}/${p.provides.head}")
      fact.unpersist()
      Seq(p.provides.head -> n)
    }.toMap

    // Checkpoint the newest fully-ingested FILE day (live days were
    // excluded above, so advancing to this point cannot skip data).
    val maxDay = filtered.agg(max(col("file_date"))).head().getDate(0)
    if (maxDay != null)
      FactStore.saveCheckpoint(cfg.checkpointDir, "access", maxDay.toString)
    filtered.unpersist()
    written
  }
}
