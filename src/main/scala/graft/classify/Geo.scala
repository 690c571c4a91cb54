package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GeoIP country classification (SURVEY.md §2.3 C1; ref
  * `Processor/Access/Country.pm:18-105` uses a MaxMind-style DB).
  *
  * No IP database ships in this environment, so the lookup is modeled
  * the way it scales on Spark anyway: an IP-RANGE DIMENSION TABLE
  * (lo, hi, country) — the relational form of a GeoIP DB — joined to
  * events. The join strategy is the part that matters at 100 TB:
  *
  *  - a naive `BETWEEN` theta-join compiles to BroadcastNestedLoop —
  *    O(events x ranges) comparisons;
  *  - instead, ranges are pre-split at ETL so no range crosses a /8
  *    boundary (standard GeoIP practice), making the first octet an
  *    EQUI-join key: broadcast hash join on octet + residual range
  *    filter — O(events x ranges-per-octet), codegen'd.
  */
object Geo {

  /** Dotted-quad string -> numeric ip (as long). */
  def ipToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    p.getItem(0).cast("long") * 16777216L + p.getItem(1).cast("long") * 65536L +
      p.getItem(2).cast("long") * 256L + p.getItem(3).cast("long")
  }

  def firstOctet(ip: Column): Column = split(ip, "\\.").getItem(0).cast("int")

  /** Classify events by IP against a range dim (octet, lo, hi,
    * country): broadcast equi-join on the octet, residual range
    * predicate. Rows with no matching range get country null. */
  def classify(events: DataFrame, ranges: DataFrame,
      ipCol: String = "requester_id"): DataFrame = {
    val e = events
      .withColumn("__octet", firstOctet(col(ipCol)))
      .withColumn("__ipl", ipToLong(col(ipCol)))
    e.join(broadcast(ranges),
        e("__octet") === ranges("octet") &&
          e("__ipl") >= ranges("lo") && e("__ipl") <= ranges("hi"),
        "left")
      .drop("__octet", "__ipl", "octet", "lo", "hi")
  }

  /** Deterministic built-in demo range table: one range per /8 block
    * covering x.0.0.0 - x.127.255.255 for octets 1..223, cycling
    * through a fixed country list (test stand-in for a real GeoIP
    * dim; the production table is loaded from a DB dump at ETL). */
  val demoCountries: Seq[String] = Seq("US", "DE", "GB", "FR", "JP", "CN", "BR", "IN")

  def demoRanges(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 223).map { o =>
      (o, o.toLong * 16777216L, o.toLong * 16777216L + 8388607L,
        demoCountries((o - 1) % demoCountries.length))
    }.toDF("octet", "lo", "hi", "country")
  }
}
