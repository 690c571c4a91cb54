package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over `SparkEntry.oracleSql` for the bug class that made
  * `o15_compaction_plan` the board's only red cell in round 7: DuckDB widens
  * `SUM(BIGINT)` to HUGEINT, so an un-cast SUM (or arithmetic over an un-cast
  * window-SUM alias) that reaches the FINAL select list emits an int128
  * column and breaks the driver's typed hash even when values match.
  *
  * The authoritative gate is the DuckDB type audit in `tools/check.py`
  * (flags HUGEINT output columns at sf0.01); this spec is the in-repo,
  * no-DuckDB approximation that runs in `sbt test`:
  *
  *  1. every FINAL-select output expression containing `SUM(` must also
  *     contain `CAST(` (so the widened value is narrowed before output);
  *  2. every FINAL-select output expression referencing an alias that was
  *     defined by an un-cast window `SUM(...) OVER` must contain `CAST(`
  *     unless the alias is only compared (>, <, =) rather than emitted.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Split `s` on commas at paren depth 0. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }

  /** The select list of the LAST depth-0 SELECT (the statement's output). */
  private def finalSelectList(sql: String): String = {
    val u = sql.toUpperCase
    var depth = 0; var lastSel = -1
    var i = 0
    while (i < u.length) {
      u.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && u.startsWith("SELECT", i) &&
              (i == 0 || !u.charAt(i - 1).isLetterOrDigit)) lastSel = i
      }
      i += 1
    }
    assert(lastSel >= 0, s"no top-level SELECT in:\n$sql")
    // select list ends at the first depth-0 FROM after lastSel
    depth = 0; i = lastSel + 6; var end = u.length
    var found = false
    while (i < u.length && !found) {
      u.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && u.startsWith("FROM", i) &&
              !u.charAt(i - 1).isLetterOrDigit &&
              (i + 4 >= u.length || !u.charAt(i + 4).isLetterOrDigit)) {
            end = i; found = true
          }
      }
      i += 1
    }
    sql.substring(lastSel + 6, end)
  }

  /** Aliases defined by a window SUM that is NOT wrapped in a CAST. */
  private def uncastWindowSumAliases(sql: String): Set[String] = {
    val winSum = """(?is)(CAST\s*\(\s*)?SUM\s*\(""".r
    val aliases = Set.newBuilder[String]
    for (m <- winSum.findAllMatchIn(sql) if m.group(1) == null) {
      // walk to the matching close paren of SUM(
      var i = m.end; var depth = 1
      while (i < sql.length && depth > 0) {
        sql.charAt(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => }
        i += 1
      }
      val rest = sql.substring(i)
      val overAs = """(?is)\A\s*OVER\s*(\([^)]*\)|\w+)\s*(\)\s*)*AS\s+(\w+)""".r
      overAs.findFirstMatchIn(rest).foreach { om =>
        // a trailing close paren means the window expr sits inside some outer
        // call — conservatively treat CAST(...) wrappers as narrowed
        val wrapped = om.group(2) != null &&
          sql.substring(math.max(0, m.start - 40), m.start).toUpperCase.contains("CAST")
        if (!wrapped) aliases += om.group(3)
      }
    }
    aliases.result()
  }

  test("lint flags the round-7 o15 bug shape (un-cast window-SUM alias in output)") {
    val preFixO15 =
      """WITH files AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS size_rows
        |  FROM events GROUP BY 1),
        |packed AS (
        |  SELECT day, size_rows,
        |         SUM(size_rows) OVER (PARTITION BY day ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM files)
        |SELECT day, (cum - size_rows) // 500 AS out_group
        |FROM packed GROUP BY 1, 2""".stripMargin
    val aliases = uncastWindowSumAliases(preFixO15)
    assert(aliases == Set("cum"))
    val exprs = splitTop(finalSelectList(preFixO15)).map(_.trim)
    val flagged = exprs.exists { e =>
      val hasCast = e.toUpperCase.contains("CAST")
      aliases.exists(a => s"""(?i)\\b$a\\b""".r.findFirstIn(e).isDefined) && !hasCast
    }
    assert(flagged, "lint must flag arithmetic over an un-cast window-SUM alias")
  }

  test("no oracle emits an un-cast SUM (or un-cast window-SUM alias) in its final select") {
    val offenders = Seq.newBuilder[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val winAliases = uncastWindowSumAliases(sql)
      for (rawExpr <- splitTop(finalSelectList(sql))) {
        val expr = rawExpr.trim
        val up = expr.toUpperCase
        val hasCast = up.contains("CAST")
        val hasSum = """(?i)\bSUM\s*\(""".r.findFirstIn(expr).isDefined
        if (hasSum && !hasCast)
          offenders += s"$name: bare SUM in output expr: ${expr.take(90)}"
        val refsWinAlias = winAliases.exists(a =>
          s"""(?i)\\b$a\\b""".r.findFirstIn(expr).isDefined)
        val onlyCompared = "[<>=]".r.findFirstIn(expr).isDefined
        if (refsWinAlias && !hasCast && !onlyCompared && !hasSum)
          offenders += s"$name: un-cast window-SUM alias in output expr: ${expr.take(90)}"
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty, s"oracle SQL widening lint failed:\n${bad.mkString("\n")}")
  }
}
