package graft.filters

import java.nio.file.{Files, Path, Paths}
import java.time.{Duration, Instant}
import scala.util.control.NonFatal

/** Robot-list refresh semantics (ref `Filter/Robots.pm:13-90`).
  *
  * The reference keeps a cached `robots_ua.txt` / `robots_ip.txt`
  * beside the install and, on each ETL run:
  *
  *  1. if the cache file is missing OR older than 7 days, re-downloads
  *     it from the public list URL (`Robots.pm:26-33`);
  *  2. applies a size sanity floor to whatever is now on disk —
  *     5,000 bytes for the UA list, 2,000 for the IP list
  *     (`Robots.pm:35-41,62-69`): a truncated/empty download (captive
  *     portal, 404 body, half-written file) must never silently turn
  *     the robot filter off;
  *  3. below the floor, reverts to the bundled default list shipped
  *     with the code.
  *
  * This loader reproduces that decision procedure with the network
  * step injected: production supplies an HTTP fetch as `refresh`;
  * this environment (and the spec) supplies a local-file copy or a
  * failing stub. A refresher failure is treated exactly like the
  * reference's failed `getstore` — whatever is on disk (possibly
  * nothing) proceeds to the size check and falls back if undersized.
  *
  * Scale note: this runs ONCE on the driver per ETL run; the loaded
  * patterns compile into the single codegen'd predicate in [[Robots]]
  * and ship to executors inside the task closure — the list is a few
  * KB, far below broadcast-worthy size.
  */
object RobotList {

  /** Where a loaded list actually came from. */
  sealed trait Source
  /** The on-disk cache (fresh or refreshed) passed the size floor. */
  case object FromCache extends Source
  /** The cache was missing/undersized — bundled defaults used. */
  case object FromFallback extends Source

  final case class Loaded(patterns: Seq[String], source: Source,
      refreshAttempted: Boolean)

  /** @param cachePath        the writable cached list location
    * @param fallbackResource classpath resource with the bundled list
    * @param minBytes         size sanity floor (ref: 5000 UA, 2000 IP)
    * @param maxAge           staleness horizon (ref: 7 days)
    */
  final case class Config(cachePath: String, fallbackResource: String,
      minBytes: Long, maxAge: Duration = Duration.ofDays(7))

  /** The shipped UA-list config — the reference's own 5,000-byte
    * sanity floor (`Robots.pm:35-41`); the bundled fallback list
    * (~450 patterns, 5.7 KB) clears it, so reverting to the bundle
    * is never a coverage downgrade below the floor. */
  def uaConfig(cachePath: String): Config =
    Config(cachePath, "graft/robots_ua.txt", minBytes = 5000L)

  /** The shipped IP-list config — the reference's 2,000-byte floor
    * (`Robots.pm:62-69`); bundled list ~230 prefixes, 3.2 KB. */
  def ipConfig(cachePath: String): Config =
    Config(cachePath, "graft/robots_ip.txt", minBytes = 2000L)

  /** True iff the cache must be re-fetched: missing, or last modified
    * more than `maxAge` ago (ref `-C $file < 7`, `Robots.pm:26`). */
  def isStale(cachePath: Path, maxAge: Duration,
      now: Instant = Instant.now()): Boolean =
    !Files.exists(cachePath) ||
      Files.getLastModifiedTime(cachePath).toInstant
        .plus(maxAge).isBefore(now)

  /** Run the full decision procedure and load the list.
    *
    * @param refresh production: download the public list to the given
    *                path; tests: copy a local fixture or fail. Only
    *                invoked when the cache is stale/missing. Failures
    *                are swallowed (the size floor catches the damage).
    * @param now     injectable clock for staleness tests
    */
  def load(cfg: Config, refresh: Path => Unit,
      now: Instant = Instant.now()): Loaded = {
    val cache = Paths.get(cfg.cachePath)
    val attempted = isStale(cache, cfg.maxAge, now)
    if (attempted) {
      try refresh(cache)
      catch { case NonFatal(_) => () } // failed download ≡ ref getstore fail
    }
    val size = if (Files.exists(cache)) Files.size(cache) else 0L
    if (size >= cfg.minBytes)
      Loaded(Robots.loadPatterns(cfg.cachePath), FromCache, attempted)
    else
      Loaded(Robots.loadResourcePatterns(cfg.fallbackResource),
        FromFallback, attempted)
  }
}
