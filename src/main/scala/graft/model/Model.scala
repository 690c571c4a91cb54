package graft.model

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Mirrors the reference's abstractions (see SURVEY.md §1):
  *  - the raw access event (reference: one TSV line per hit,
  *    `plugins/EPrints/Plugin/Stats/Logger.pm:42-48`, parsed by
  *    `Processor/Access.pm:16-43`);
  *  - the daily pre-aggregated fact row, grain (day, id, value)
  *    (`Handler.pm:147-199`);
  *  - the query context (`Context.pm:14-25`).
  */
final case class AccessEvent(
    datestamp: java.sql.Timestamp,
    requester_id: String,
    requester_user_agent: String,
    referring_entity_id: String,
    service_type_id: String,
    referent_id: java.lang.Integer,
    referent_docid: java.lang.Integer)

object AccessEvent {
  /** Schema for the TSV access log (FIXTURES.md §1; ref `Access.pm:16-43`). */
  val schema: StructType = StructType(Seq(
    StructField("datestamp", StringType),
    StructField("requester_id", StringType),
    StructField("requester_user_agent", StringType),
    StructField("referring_entity_id", StringType),
    StructField("service_type_id", StringType),
    StructField("referent_id", IntegerType),
    StructField("referent_docid", IntegerType)))
}

/** One row of a fact table: daily pre-aggregated count.
  * Reference schema `(uid, eprintid, datestamp int, value, count)`
  * (`Handler.pm:147-199`); we drop the synthetic `uid` and keep a real
  * DateType (partition-prunable) instead of int YYYYMMDD. */
final case class FactRow(date: java.sql.Date, id: Long, value: String, count: Long)

object FactRow {
  val schema: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("id", LongType),
    StructField("value", StringType),
    StructField("count", LongType)))
}

/** Query context — the reference's 10-field query descriptor
  * (`Context.pm:14-25`). `from`/`to` are resolved canonical dates
  * (after range normalization, `Utils.pm:242-331`). */
final case class Context(
    datatype: String,
    datafilter: Option[String] = None,
    setName: Option[String] = None,
    setValue: Option[String] = None,
    grouping: Option[String] = None,
    from: Option[java.time.LocalDate] = None,
    to: Option[java.time.LocalDate] = None,
    range: Option[String] = None,
    fields: Seq[String] = Seq.empty,
    orderBy: Option[String] = None,
    orderDesc: Boolean = true,
    limit: Option[Int] = None,
    offset: Option[Int] = None) {

  /** Resolve `range`/`from`/`to` into concrete bounds relative to `today`.
    * Reference semantics (`Utils.pm:242-331`, SURVEY §7.4 item 4):
    * range has priority over from/to; `to` defaults to yesterday;
    * `_ALL_` clears both bounds; ranges are capped at 20 years. */
  def resolved(today: java.time.LocalDate): Context =
    range match {
      case None => this
      case Some(r) =>
        val (f, t) = DateUtils.resolveRange(r, today)
        copy(from = f, to = t)
    }
}

object Context {
  /** Build a validated Context from request parameters — the analog
    * of the reference's `Context::from_request` (`Context.pm:44-128`):
    * context fields are parsed/validated per type; everything else is
    * the caller's concern (validated via `DateUtils.sanitizeParam`).
    * Unknown datatype etc. surface at compile time, not here. */
  def fromParams(params: Map[String, String]): Context = {
    def clean(k: String): Option[String] =
      params.get(k).map(DateUtils.sanitizeParam).filter(_.nonEmpty)
    Context(
      datatype = clean("datatype").getOrElse("downloads"),
      datafilter = clean("datafilter"),
      setName = clean("set_name"),
      setValue = clean("set_value"),
      grouping = clean("grouping"),
      from = params.get("from").flatMap(DateUtils.parseDate),
      to = params.get("to").flatMap(DateUtils.parseDate),
      range = clean("range").filter(r =>
        // bounded digit counts: anything longer would overflow the
        // numeric parse downstream (and is capped at 20y anyway)
        r == "_ALL_" || r.matches("\\d{1,6}[dmy]") || r.matches("\\d{4}")),
      fields = clean("fields").map(_.split(",").toSeq.map(_.trim)).getOrElse(Seq.empty),
      orderBy = clean("order_by"),
      orderDesc = !params.get("order_desc").contains("0"),
      limit = params.get("limit").filter(_.matches("\\d{1,9}")).map(_.toInt),
      offset = params.get("offset").filter(_.matches("\\d{1,9}")).map(_.toInt))
  }
}

object DateUtils {
  import java.time.LocalDate

  /** F12 multi-format date parsing (ref `Utils.pm:52-110`,
    * `Context.pm:438-554`): YYYYMMDD, YYYY-MM-DD, YYYY/MM/DD, or a
    * bare YYYY (meaning Jan 1). Invalid -> None. */
  def parseDate(s: String): Option[LocalDate] = {
    val Compact = """(\d{4})(\d{2})(\d{2})""".r
    val Dashed = """(\d{4})-(\d{2})-(\d{2})""".r
    val Slashed = """(\d{4})/(\d{2})/(\d{2})""".r
    val YearOnly = """(\d{4})""".r
    try s.trim match {
      case Compact(y, m, d) => Some(LocalDate.of(y.toInt, m.toInt, d.toInt))
      case Dashed(y, m, d) => Some(LocalDate.of(y.toInt, m.toInt, d.toInt))
      case Slashed(y, m, d) => Some(LocalDate.of(y.toInt, m.toInt, d.toInt))
      case YearOnly(y) => Some(LocalDate.of(y.toInt, 1, 1))
      case _ => None
    } catch { case _: java.time.DateTimeException => None }
  }

  /** F12 param sanitization (ref `Utils.pm:52-110`): strip the
    * characters the reference rejects in non-context params. */
  def sanitizeParam(s: String): String =
    s.replaceAll("[<>/\\\\;=&?%']", "").replaceAll("[\\p{Cntrl}]", "")

  /** `'Nd'|'Nm'|'Ny'` offsets, a literal year `'YYYY'`, or `'_ALL_'`.
    * Ref `Utils.pm:217-331`: to = yesterday; from = to - offset + 1 unit;
    * cap 20 years ("no stats before the invention of the web"). */
  def resolveRange(range: String, today: LocalDate)
      : (Option[LocalDate], Option[LocalDate]) = {
    val yesterday = today.minusDays(1)
    // bounded digits: the 20-year cap makes longer counts meaningless,
    // and an unbounded \d+ would overflow toLong on adversarial input
    val NumUnit = """(\d{1,6})([dmy])""".r
    val Year = """(\d{4})""".r
    range match {
      case "_ALL_" => (None, None)
      case Year(y) =>
        val yr = y.toInt
        (Some(LocalDate.of(yr, 1, 1)), Some(LocalDate.of(yr, 12, 31)))
      case NumUnit(n, u) =>
        val amount = math.min(n.toLong, u match {
          case "d" => 20L * 366; case "m" => 240L; case _ => 20L
        })
        val from = u match {
          case "d" => yesterday.minusDays(amount - 1)
          case "m" => yesterday.minusMonths(amount).plusDays(1)
          case _   => yesterday.minusYears(amount).plusDays(1)
        }
        (Some(from), Some(yesterday))
      case _ => (None, Some(yesterday))
    }
  }
}
