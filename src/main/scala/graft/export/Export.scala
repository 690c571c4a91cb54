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

  /** CSV with header; RFC-ish quoting of commas/quotes/newlines. */
  def toCsv(df: DataFrame): String = {
    val cols = df.columns
    def q(s: String): String =
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val rows = df.collect().map(r =>
      cols.indices.map(i => q(cell(r.get(i)))).mkString(","))
    (cols.map(q).mkString(",") +: rows).mkString("\n")
  }

  /** JSON envelope: {"context": {...}, "data": [{col: val}...]} —
    * mirrors the reference's AJAX payload shape. */
  def toJson(df: DataFrame, context: Map[String, String] = Map.empty): String = {
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
    val data = df.collect().map(r =>
      cols.indices.map(i => s"${jstr(cols(i))}: ${jval(r.get(i))}").mkString("{", ", ", "}"))
      .mkString("[", ", ", "]")
    val ctx = context.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ", ", "}")
    s"""{"context": $ctx, "data": $data}"""
  }

  /** XML rows: <rows><row><col>val</col>...</row></rows>. */
  def toXml(df: DataFrame, rootTag: String = "rows", rowTag: String = "row"): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val cols = df.columns
    val rows = df.collect().map { r =>
      cols.indices.map(i => s"<${cols(i)}>${esc(cell(r.get(i)))}</${cols(i)}>")
        .mkString(s"<$rowTag>", "", s"</$rowTag>")
    }
    rows.mkString(s"<$rootTag>", "", s"</$rootTag>")
  }

  /** C10 human number rendering: 1234567 -> "1,234,567"
    * (ref `Utils.pm:340-369`); for display columns in exports. */
  def humanNumber(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    format_number(c, 0)
}
