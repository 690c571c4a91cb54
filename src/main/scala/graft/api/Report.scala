package graft.api

import org.apache.spark.sql.DataFrame
import graft.model.Context
import graft.query.QueryCompiler
import graft.query.QueryCompiler.Catalog

/** Report evaluation (SURVEY.md §3 entry point 2; ref
  * `Screen/IRStats2/Report.pm:56-173`, config `z_irstats2.pl:319-577`):
  * a report is a named list of view items, each = a view kind plus
  * context OVERRIDES applied to the report's base context. The
  * reference fans these out as independent AJAX queries; here each
  * item compiles to a DataFrame and all of them share the session
  * (and therefore Spark's cached scans) — evaluation is lazy, the
  * caller actions them as needed, possibly concurrently. */
object Report {

  /** One view item: view kind (graph/table/counter/...) + overrides. */
  final case class Item(
      view: String,
      overrides: Context => Context = identity)

  final case class Spec(name: String, base: Context, items: Seq[Item])

  /** Compile every item of the report against the catalog.
    * Pure: contexts are copied per item (the reference mutates a
    * shared context — behavior kept, structure fixed, SURVEY §7.4.6). */
  def compile(spec: Spec, cat: Catalog,
      today: java.time.LocalDate): Seq[(String, DataFrame)] =
    spec.items.map { item =>
      val ctx = item.overrides(spec.base).resolved(today)
      item.view -> QueryCompiler.compile(ctx, cat)
    }

  /** Pre-render every item to its JSON payload — the equivalent of
    * the reference's nightly report-cache warm-up
    * (`process_stats:144-159` executes each report view server-side
    * and caches the AJAX payload). The result map IS the cache. */
  def renderJson(spec: Spec, cat: Catalog,
      today: java.time.LocalDate): Map[String, String] =
    compile(spec, cat, today).map { case (view, df) =>
      view -> graft.export.Export.toJson(df,
        context = Map("report" -> spec.name, "view" -> view,
          "datatype" -> spec.base.datatype))
    }.toMap
}
