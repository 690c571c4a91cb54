package graft.classify

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Name casing for display values (ref `Sets.pm:487-577`, which ports
  * Lingua::EN::NameCase). Own implementation of the documented rules:
  * capitalize word-initials; Mc/Mac prefixes re-capitalize the stem
  * (with the standard exception list of names where "Mac" is part of
  * the word); lowercase particles (van, von, de, della, ...); Roman
  * numerals fully uppercased.
  *
  * Used only during set materialization (ETL, small dimension data),
  * so a Scala UDF is acceptable here — it never sits in the 100 TB
  * event path. */
object NameCase {

  private val particles = Set(
    "al", "ap", "ben", "da", "dai", "dal", "de", "del", "della", "dei",
    "der", "di", "du", "la", "le", "lo", "van", "von", "und", "the")

  /** Names where "Mac" is lexical, not a patronymic prefix — the stem
    * must NOT be re-capitalized. */
  private val macExceptions = Set(
    "macedo", "macevicius", "machado", "machar", "machin", "machlin",
    "macias", "maciulis", "mackie", "macklin", "mackmin", "macquarie",
    "macomber", "macin", "macintosh", "macarthur")

  /** Restricted to the I/V/X/L alphabet like the reference's rule
    * (Lingua::EN::NameCase port, `Sets.pm:487-577`): including m/c/d
    * would capture particles and short words like "di", "md", "mi". */
  private val roman = "^(?i)(xl|l?x{0,3})(ix|iv|v?i{0,3})$".r

  private def caseWord(word: String, isFirst: Boolean): String = {
    val lower = word.toLowerCase
    if (lower.isEmpty) return word
    // Particles win over numerals: "di" in "Maria di Lauro" must stay
    // a lowercase particle, never an uppercased numeral.
    if (!isFirst && particles.contains(lower)) return lower
    if (roman.pattern.matcher(lower).matches() && lower.exists(_.isLetter)
        && lower.length > 1) return lower.toUpperCase
    val capped = s"${lower.head.toUpper}${lower.tail}"
    if (lower.startsWith("mac") && lower.length > 5 && !macExceptions.contains(lower))
      "Mac" + lower.drop(3).head.toUpper + lower.drop(4)
    else if (lower.startsWith("mc") && lower.length > 2)
      "Mc" + lower.drop(2).head.toUpper + lower.drop(3)
    else capped
  }

  /** Case one full name; hyphen/apostrophe sub-parts are cased too. */
  def nameCase(name: String): String = {
    if (name == null) return null
    val words = name.split(" ", -1)
    words.zipWithIndex.map { case (w, i) =>
      w.split("-", -1).map { part =>
        part.split("'", -1) match {
          case Array(single) => caseWord(single, i == 0)
          case parts => parts.zipWithIndex.map { case (p, j) =>
            // O'Brien: capitalize both sides of the apostrophe
            if (j == 0 && p.length <= 1) p.toUpperCase else caseWord(p, i == 0 || j > 0)
          }.mkString("'")
        }
      }.mkString("-")
    }.mkString(" ")
  }

  val nameCaseUdf = udf(nameCase _)

  def apply(c: Column): Column = nameCaseUdf(c)

  /** "family, given" display form (ref `Sets.pm:487-500`
    * `normalise_name`): both parts whitespace-trimmed, the comma
    * dropped entirely when `given` is empty/null (the reference
    * renders bare "family", never "family, "), and NameCase applied
    * to the combined string as the reference's `nc(...)` does. */
  def displayName(family: Column, given: Column): Column = {
    import org.apache.spark.sql.functions._
    val f = trim(coalesce(family, lit("")))
    val g = trim(coalesce(given, lit("")))
    val combined = when(g === "", f).otherwise(concat(f, lit(", "), g))
    nameCaseUdf(combined)
  }
}
