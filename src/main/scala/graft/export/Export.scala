package graft.export

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Result serializers (ref `Export.pm:14-44` and the View JSON/CSV/XML
  * endpoints): a collected result set -> JSON / CSV / XML strings with
  * the export-context envelope.
  *
  * These run on the DRIVER over final (bounded: top-N / series-length)
  * results — the distributed side ends at the aggregated DataFrame.
  * For unbounded exports use `df.write.json/csv` instead (distributed
  * file sink, one file per partition). */
object Export {

  private def cell(v: Any): String = v match {
    case null => ""
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toString
    case x => x.toString
  }

  /** Default driver-side row cap for the string serializers. */
  val defaultMaxRows: Int = 100000

  /** Enforced driver-side boundary (in the spirit of
    * `Similarity.cosineNearDup`'s execution-time cap): the string
    * serializers exist for bounded, post-LIMIT result sets — exactly
    * where the reference fetches rows — and nothing used to stop a
    * caller handing them an unlimited DataFrame. `take(cap+1)` fetches
    * incrementally (no extra count job, no full materialization of a
    * runaway input) and fails loudly past the cap. */
  private def boundedCollect(df: DataFrame, maxRows: Int): Array[Row] = {
    val rows = df.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"export serializer got more than $maxRows rows — these build a " +
        "single driver-side string for bounded (post-LIMIT) results; " +
        "use df.write.csv/json (distributed file sink) for unbounded " +
        "exports, or LIMIT the result / raise maxRows deliberately")
    rows
  }

  /** CSV with header; RFC-ish quoting of commas/quotes/newlines. */
  def toCsv(df: DataFrame, maxRows: Int = defaultMaxRows): String = {
    val cols = df.columns
    def q(s: String): String =
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val rows = boundedCollect(df, maxRows).map(r =>
      cols.indices.map(i => q(cell(r.get(i)))).mkString(","))
    (cols.map(q).mkString(",") +: rows).mkString("\n")
  }

  /** JSON envelope: {"context": {...}, "data": [{col: val}...]} —
    * mirrors the reference's AJAX payload shape. */
  def toJson(df: DataFrame, context: Map[String, String] = Map.empty,
      maxRows: Int = defaultMaxRows): String = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jval(v: Any): String = v match {
      case null => "null"
      case n: Number => n.toString
      case b: Boolean => b.toString
      case x => jstr(cell(x))
    }
    val cols = df.columns
    val data = boundedCollect(df, maxRows).map(r =>
      cols.indices.map(i => s"${jstr(cols(i))}: ${jval(r.get(i))}").mkString("{", ", ", "}"))
      .mkString("[", ", ", "]")
    val ctx = context.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ", ", "}")
    s"""{"context": $ctx, "data": $data}"""
  }

  /** XML rows: <rows><row><col>val</col>...</row></rows>. */
  def toXml(df: DataFrame, rootTag: String = "rows", rowTag: String = "row",
      maxRows: Int = defaultMaxRows): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val cols = df.columns
    val rows = boundedCollect(df, maxRows).map { r =>
      cols.indices.map(i => s"<${cols(i)}>${esc(cell(r.get(i)))}</${cols(i)}>")
        .mkString(s"<$rowTag>", "", s"</$rowTag>")
    }
    rows.mkString(s"<$rootTag>", "", s"</$rootTag>")
  }

  /** C10 human number rendering: 1234567 -> "1,234,567"
    * (ref `Utils.pm:340-369`); for display columns in exports. */
  def humanNumber(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    format_number(c, 0)

  import org.apache.spark.sql.Column

  /** W3 localized month labels (ref `Utils.pm:459-476`
    * `get_month_labels` — the phrase table `lib/utils:month_short_NN`
    * / `lib/utils:month_NN` per install language). Localization comes
    * from the JDK's CLDR data instead of phrase files; English yields
    * the reference's exact "Jan".."Dec" / "January".."December". */
  def monthLabels(locale: java.util.Locale = java.util.Locale.ENGLISH,
      short: Boolean = true): Seq[String] = {
    val style =
      if (short) java.time.format.TextStyle.SHORT
      else java.time.format.TextStyle.FULL
    (1 to 12).map(m => java.time.Month.of(m).getDisplayName(style, locale))
  }

  /** W3 graph datapoint label (ref `Graph.pm:131-150`): datestamp ->
    * description, by date resolution —
    *   day:   "20120101" -> "01 Jan 2012"  (`"$3 ".$month." $1"`)
    *   month: "201201"   -> "Jan 2012"
    *   year:  "2012"     -> "2012" (passthrough)
    * Column-typed so the label renders distributed in the export
    * projection (array-literal lookup, whole-stage codegen) rather
    * than per-row on the driver. */
  def dateLabel(datestamp: Column, dateRes: String,
      months: Seq[String] = monthLabels()): Column = {
    require(months.size == 12, s"need 12 month labels, got ${months.size}")
    val m = array(months.map(lit): _*)
    val month = element_at(m, substring(datestamp, 5, 2).cast("int"))
    dateRes match {
      case "day" =>
        concat(substring(datestamp, 7, 2), lit(" "), month, lit(" "),
          substring(datestamp, 1, 4))
      case "month" =>
        concat(month, lit(" "), substring(datestamp, 1, 4))
      case _ => datestamp
    }
  }

  /** Graph export records (ref `Graph.pm:120-152`): appends the
    * rendered `description` label to a (datestamp, count) series —
    * the payload the reference hands to its client-side renderer.
    *
    * W4 (`nullOutAllZero`, ref `Graph.pm:163-171`): when the series
    * total is zero, every count is replaced with NULL so the client
    * chart renders EMPTY rather than a flat zero line. The total is a
    * 1-row aggregate broadcast into the payload projection (the
    * kf_metrics shape) — no window over a single partition, and a
    * non-empty series pays one cheap aggregate of an already-computed
    * frame. Default off: the flag is a presentation-layer choice the
    * reference applies only on its graph view. */
  def graphPayload(series: DataFrame, dateRes: String,
      datestampCol: String = "datestamp",
      months: Seq[String] = monthLabels(),
      countCol: String = "count",
      nullOutAllZero: Boolean = false): DataFrame = {
    val labeled = series.withColumn("description",
      dateLabel(col(datestampCol), dateRes, months))
    if (!nullOutAllZero) labeled
    else {
      val tot = series.agg(
        coalesce(sum(col(countCol)), lit(0L)).as("__tot"))
      labeled.crossJoin(broadcast(tot))
        .withColumn(countCol,
          when(col("__tot") === 0,
            lit(null).cast(series.schema(countCol).dataType))
            .otherwise(col(countCol)))
        .drop("__tot")
    }
  }
}
