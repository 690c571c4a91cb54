package graft.processors

import org.apache.spark.sql.DataFrame
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
