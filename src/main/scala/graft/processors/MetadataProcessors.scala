package graft.processors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metadata-driven metric processors (SURVEY.md §1.3; ref
  * `Processor/EPrint/Deposits.pm`, `DocumentAccess.pm`,
  * `DocumentFormat.pm`, `History/Actions.pm`): unlike the access
  * processors these scan the repository's METADATA tables — one fact
  * row per (deposit day, item, status/format/action).
  *
  * Shape note: these are all the same aggregation with different
  * (date, id, value) projections, so each is a thin adapter over
  * [[Processors.dailyFact]]; the reference's per-record callback
  * machinery dissolves into column selection.
  *
  * INPUT CONTRACT: `process` takes the repository METADATA table these
  * processors name columns of — they are run as their own pass over
  * that table (as the reference does, `process_stats` step 4's
  * eprint/history datasets), NOT through [[graft.api.Etl.run]], whose
  * processor list receives access events. */
object MetadataProcessors {

  /** deposits: items deposited per day, valued by status
    * (ref `Deposits.pm:17` + the 'archive' datafilter F7). */
  final case class Deposits(dateCol: String, idCol: String, statusCol: String)
      extends MetricProcessor {
    val provides = Seq("deposits")
    def process(meta: DataFrame): DataFrame =
      Processors.dailyFact(meta, tsCol = dateCol, idCol = idCol,
        valueCol = statusCol)
  }

  /** doc_format: document counts per day by format/MIME
    * (ref `DocumentFormat.pm:19`). */
  final case class DocFormat(dateCol: String, idCol: String, formatCol: String)
      extends MetricProcessor {
    val provides = Seq("doc_format")
    def process(meta: DataFrame): DataFrame =
      Processors.dailyFact(meta, tsCol = dateCol, idCol = idCol,
        valueCol = formatCol)
  }

  /** doc_access: full-text / open-access status per day per item
    * (ref `Processor/EPrint/DocumentAccess.pm:20-75`). For each item
    * in `archive` status the reference emits TWO fact rows — a
    * full-text status (`full_text` iff any document is attached, else
    * `no_full_text`) and an open-access status (`open_access` iff any
    * attached document is public, else `no_open_access`). The
    * KeyFigures metrics `total_fulltext`/`total_openaccess` and the
    * ratio metrics are datafilter rewrites onto this datatype
    * (`View/KeyFigures.pm:33-44,59-61`).
    *
    * Shape: the reference loops item-by-item calling
    * `get_all_documents` per record; here the documents table is
    * pre-aggregated to one (id, has_public) row per item in a single
    * map-side-combined aggregate, then joined to the items scan —
    * both sides keyed on the item id, so at 100 TB this is one
    * co-partitioned shuffle join (AQE will broadcast the doc side
    * when the corpus is small). The two status rows per item come
    * from one codegen'd `explode(array(...))`, not a self-union, so
    * the joined intermediate is read once.
    *
    * @param docs      the documents table (one row per attached doc)
    * @param docIdCol  column of `docs` holding the owning item id
    * @param publicPred predicate over `docs` rows marking a PUBLIC
    *                   document (the reference's `$doc->is_public`)
    * @param fallbackDateCol optional second date column used when
    *                   `dateCol` is null — the reference reads
    *                   `datestamp` and falls back to `lastmod`
    *                   (`DocumentAccess.pm:42`); without a fallback,
    *                   null-dated items would silently aggregate into
    *                   a null-date bucket
    */
  final case class DocumentAccess(dateCol: String, idCol: String,
      statusCol: String, archiveValue: String,
      docs: DataFrame, docIdCol: String, publicPred: Column,
      fallbackDateCol: Option[String] = None)
      extends MetricProcessor {
    val provides = Seq("doc_access")
    def process(meta: DataFrame): DataFrame = {
      val docAgg = docs.groupBy(col(docIdCol).as("__docid"))
        .agg(max(when(publicPred, 1).otherwise(0)).as("__pub"))
      val eventDate = fallbackDateCol
        .map(f => coalesce(to_date(col(dateCol)), to_date(col(f))))
        .getOrElse(to_date(col(dateCol)))
      meta.filter(col(statusCol) === archiveValue)
        .join(docAgg, col(idCol) === col("__docid"), "left")
        .select(
          eventDate.as("date"),
          col(idCol).cast("long").as("id"),
          explode(array(
            when(col("__docid").isNotNull, "full_text")
              .otherwise("no_full_text"),
            when(col("__pub") === 1, "open_access")
              .otherwise("no_open_access"))).as("value"))
        .groupBy("date", "id", "value")
        .agg(count(lit(1)).as("count"))
    }
  }

  /** history: repository actions per day by action type
    * (ref `History/Actions.pm:29`). */
  final case class HistoryActions(dateCol: String, idCol: String, actionCol: String)
      extends MetricProcessor {
    val provides = Seq("history")
    def process(meta: DataFrame): DataFrame =
      Processors.dailyFact(meta, tsCol = dateCol, idCol = idCol,
        valueCol = actionCol)
  }
}
