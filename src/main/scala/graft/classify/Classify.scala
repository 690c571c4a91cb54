package graft.classify

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-row classification functions for access-log enrichment
  * (SURVEY.md §2.3): browser family, URL parsing, referrer labeling,
  * search-term extraction. All are Catalyst Column expressions
  * (codegen'd `when`-cascades and regexes — no UDFs), so they inline
  * into the ingest scan's whole-stage codegen.
  *
  * Semantics follow the reference's observable behavior:
  *  - browser: ordered first-match over substring signatures
  *    (ref `Processor/Access/Browsers.pm:12-25,44-72` iterates
  *    signatures in sorted key order — order is part of the contract);
  *  - referrer: a fixed cascade from most-specific to least
  *    (ref `Processor/Access/Referrer.pm:39-116`);
  *  - search terms: engine-specific query-param extraction, split,
  *    normalize, stopword/length filter
  *    (ref `Processor/Access/SearchTerms.pm:14-198`).
  */
object Classify {

  /** Ordered browser signatures: first match wins. Iteration order is
    * the sorted key order the reference uses (deterministic output).
    * (ref `Browsers.pm:12-25`: 12 substring signatures.) */
  val browserSignatures: Seq[(String, String)] = Seq(
    "Chrome" -> "chrome/",
    "Edge" -> "edg",
    "Firefox" -> "firefox/",
    "IE" -> "msie",
    "Konqueror" -> "konqueror",
    "Mozilla" -> "mozilla/5",
    "Netscape" -> "mozilla/4",
    "Opera" -> "opera",
    "Safari" -> "safari",
    "Wget" -> "wget").sortBy(_._1)

  /** UA string -> browser family, ordered first-match, else "Other". */
  def browser(ua: Column): Column = {
    val lua = lower(ua)
    browserSignatures.foldRight(lit("Other"): Column) {
      case ((name, sig), elseCol) =>
        when(lua.contains(sig), lit(name)).otherwise(elseCol)
    }
  }

  /** URL -> (protocol, host, path) struct.
    * Quirks kept from the reference (`Utils.pm:489-509`): a purely
    * numeric referrer means an internal abstract page
    * (-> `http://localhost/<n>`); a protocol-less string is forced
    * to `http://`. */
  def parseUrl(url: Column): Column = {
    val fixed = when(url.rlike("^[0-9]+$"), concat(lit("http://localhost/"), url))
      .when(!url.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), concat(lit("http://"), url))
      .otherwise(url)
    struct(
      regexp_extract(fixed, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1).as("protocol"),
      regexp_extract(fixed, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1).as("host"),
      regexp_extract(fixed, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1).as("path"))
  }

  /** %XX percent-decoding (ref `Referrer.pm:50`). */
  def percentDecode(c: Column): Column = url_decode(c)

  /** URL canonicalization — the dedup key for web-crawl pipelines
    * (beyond the reference, which only parses referrers): drop the
    * fragment, lowercase scheme+authority, strip `www.`, strip
    * default ports (:80/:443), remove tracking params (utm_*,
    * fbclid, gclid) with separator repair, and strip one trailing
    * path slash. Pure regexp/string chain — codegen'd, no UDF — and
    * every step has an exact DuckDB mirror (RE2-compatible patterns:
    * no lookaround, explicit delimiter alternation instead). */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*$", "")
    // lowercase only scheme://authority; path/query keep their case
    val prefixPat = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
    val prefix = regexp_extract(noFrag, prefixPat, 1)
    val lowered = concat(lower(prefix),
      noFrag.substr(length(prefix) + 1, length(noFrag)))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/?#]*):443([/?#].*)?$", "$1$2"),
      "^(http://[^/?#]*):80([/?#].*)?$", "$1$2")
    val noTrack = regexp_replace(noPort,
      "[?&](utm_[a-z0-9_]+|fbclid|gclid)=[^&#]*", "")
    // if the removed param was first, the next separator must become '?'
    val fixSep = regexp_replace(noTrack, "^([^?&]*)&", "$1?")
    val noDangle = regexp_replace(fixSep, "[?&]$", "")
    // strip the path's trailing slash. Two ANCHORED replaces (slash
    // before the first '?', then slash at end-of-string) instead of one
    // global "/(\?|$)": anchors make each pattern match at most once in
    // any engine, so the DuckDB oracle (first-match-only without the
    // 'g' flag) agrees by construction even for URLs carrying both a
    // slash-before-'?' and a trailing slash.
    val noPathSlash = regexp_replace(noDangle, "^([^?]*)/\\?", "$1?")
    regexp_replace(noPathSlash, "/$", "")
  }

  /** Referrer classification cascade (ref `Referrer.pm:39-116`).
    * `localHost` is the repository's own hostname. `localDomains` is
    * the deployment's label → hostname-regex map (ref
    * `Referrer.pm:26,109-113` reads `irstats2.local_domains` from
    * config and consults it after the built-in engines, before the
    * raw-hostname fallback). An ordered Seq, not a Map: the reference
    * iterates its hash with Perl `each`, so overlapping patterns
    * resolve in nondeterministic order there — first-match-wins over
    * a caller-ordered list is the deterministic refinement.
    *
    * Documented divergence (default mode): the reference DROPS
    * records whose referrer is empty/undefined (`Referrer.pm:46-47`
    * returns before classification); here they are labeled `Direct`
    * so direct traffic stays countable. STRICT PARITY is opt-in:
    * `dropEmptyReferrer = true` labels empty/null referrers NULL
    * instead, so a caller's `label IS NOT NULL` filter reproduces the
    * reference's drop byte-for-byte — the last behavioral delta for
    * users migrating reference dashboards. */
  def referrer(url: Column, localHost: String,
      localDomains: Seq[(String, String)] = Nil,
      dropEmptyReferrer: Boolean = false): Column = {
    val u = parseUrl(url)
    val host = lower(u.getField("host"))
    val path = u.getField("path")
    val emptyLabel =
      if (dropEmptyReferrer) lit(null).cast("string") else lit("Direct")
    val builtins = when(url.isNull || url === "", emptyLabel)
      .when(url.rlike("^[0-9]+$") || host === "localhost", lit("Internal (Abstract page)"))
      .when(url.startsWith("info:oai"), lit("Internal (OAI-PMH)"))
      .when(host === localHost && path.rlike("^/[0-9]+"), lit("Internal (Abstract page)"))
      .when(host === localHost && path.startsWith("/cgi/search"), lit("Internal (Search)"))
      .when(host === localHost && path.startsWith("/view/"), lit("Internal (Browse view)"))
      .when(host === localHost && path.startsWith("/cgi/latest"), lit("Internal (Latest Additions)"))
      .when(host === localHost && path.startsWith("/profile/"), lit("Internal (MePrints Profile Page)"))
      .when(host === localHost, lit("Internal"))
      .when(host.rlike("(^|\\.)google\\."), lit("Google"))
      .when(host.rlike("(^|\\.)yahoo\\."), lit("Yahoo"))
      .when(host.rlike("(^|\\.)(msn|bing)\\."), lit("MSN/Bing"))
      .when(host.rlike("(^|\\.)facebook\\."), lit("Facebook"))
    localDomains.foldLeft(builtins) { case (c, (label, hostRegex)) =>
      c.when(host.rlike(hostRegex), lit(label))
    }.otherwise(host)
  }

  /** Extract the raw search query from a referrer URL: `q=` for
    * internal/google/bing, `p=` for yahoo (ref `SearchTerms.pm:41-90`). */
  def searchQuery(url: Column): Column = {
    val u = parseUrl(url)
    val host = lower(u.getField("host"))
    val q = try_parse_url(when(url.rlike("^[a-zA-Z]+://"), url)
      .otherwise(concat(lit("http://"), url)), lit("QUERY"), lit("q"))
    val p = try_parse_url(when(url.rlike("^[a-zA-Z]+://"), url)
      .otherwise(concat(lit("http://"), url)), lit("QUERY"), lit("p"))
    when(host.rlike("(^|\\.)yahoo\\."), p).otherwise(q)
  }

  /** Search-term explosion: decode, split on `+` and whitespace,
    * strip quotes/punctuation, lowercase, drop stopwords and short
    * words (ref `SearchTerms.pm:91-198`; builtin stopword list). */
  def searchTerms(rawQuery: Column, minLen: Int = 2): Column = {
    val words = split(lower(percentDecode(rawQuery)), "[+\\s]+")
    val cleaned = transform(words, w => regexp_replace(w, "[\"'.,;:!?()\\[\\]]", ""))
    filter(cleaned, w =>
      length(w) >= minLen &&
        !w.isin(graft.functions.Text.stopwords.map(lit(_)): _*))
  }

  /** MD5 anonymization of a set value (ref `Sets.pm:341-360`). */
  def anonymize(c: Column): Column = md5(c.cast("string"))
}
