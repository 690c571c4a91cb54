package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.{Report, ReportCache}
import graft.model.Context
import graft.query.QueryCompiler.Catalog

/** The front-page scalar trio (ref `cgi/stats/fp_stats:17-39`):
  * full-text item count, all-time downloads, last-year downloads —
  * packaged as a [[Report.Spec]] so the standard cache-warm path
  * (nightly [[ReportCache.warm]]) serves the homepage with zero Spark
  * jobs on the request path.
  *
  * Scale posture: the all-time counter is a dateless downloads
  * context, so the compiler answers it from the A5 lifetime MV (a
  * set-cardinality table) instead of scanning every fact partition;
  * the 1y counter prunes to ~365 date partitions; the full-text count
  * is a metadata-table aggregate over two pushed-down status values.
  */
object FrontPage {

  /** Phrase keys, mirroring the reference's
    * `cgi/stats/fp_stats:{full_texts_all,full_text_downloads_all,
    * full_text_downloads_year}`. */
  val FullTextsAll = "full_texts_all"
  val DownloadsAll = "full_text_downloads_all"
  val DownloadsYear = "full_text_downloads_year"

  /** The two download counters as a report: all-time (dateless "
    * forever" context → lifetime-MV substitution) and trailing-1y. */
  def spec(datatype: String = "downloads"): Report.Spec =
    Report.Spec("fp_stats", Context(datatype = datatype),
      Seq(
        Report.Item(DownloadsAll),
        Report.Item(DownloadsYear, _.copy(range = Some("1y")))))

  /** The archive full-text count (ref `fp_stats:17-24`: dataset
    * search on `full_text_status` ∈ {public, restricted}). */
  def fullTextCount(metadata: DataFrame,
      statusCol: String = "full_text_status",
      statuses: Seq[String] = Seq("public", "restricted")): Long =
    metadata.filter(col(statusCol).isin(statuses: _*)).count()

  /** C10 human display for driver-side scalars — same rendering as
    * [[graft.export.Export.humanNumber]] (ref `Utils.pm:340-369`). */
  def human(n: Long): String =
    java.text.NumberFormat.getIntegerInstance(java.util.Locale.US).format(n)

  /** Evaluate the trio end-to-end: warm the report cache for the two
    * counters (when `cacheDir` is given) and return phrase-key →
    * human-formatted count. The counters' payloads land in the cache
    * under the same keys a later request-path `lookup` probes. */
  def stats(metadata: DataFrame, cat: Catalog,
      today: java.time.LocalDate, datatype: String = "downloads",
      cacheDir: Option[String] = None): Map[String, String] = {
    val s = spec(datatype)
    cacheDir.foreach(dir => ReportCache.warm(dir, s, cat, today): Unit)
    val counters = Report.compile(s, cat, today).toMap.map {
      case (view, df) =>
        val total = df.agg(coalesce(sum("count"), lit(0L)).cast("long"))
          .head().getLong(0)
        view -> human(total)
    }
    counters + (FullTextsAll -> human(fullTextCount(metadata)))
  }
}
