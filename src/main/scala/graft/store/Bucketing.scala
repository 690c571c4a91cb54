package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-elimination utilities for the 100 TB posture.
  *
  * Two standard levers the reference's RDBMS indexes map onto:
  *  - BUCKETING: co-locate both sides of a recurring join key at
  *    write time (`bucketBy`), so the join compiles with NO Exchange
  *    on either side — the per-query shuffle of fact⋈fact or
  *    fact⋈big-dim joins is paid once at ETL instead of per query;
  *  - SALTING: when one join key is pathologically hot (one item
  *    getting most traffic), append a salt to split the hot key's
  *    rows across `saltFactor` sub-keys and replicate the small side
  *    per salt — turning one straggler task into `saltFactor` even
  *    ones. AQE's skew-join handles moderate skew automatically; the
  *    salt is for the extreme tail.
  */
object Bucketing {

  /** Write `df` bucketed by `key` as a catalog table (parquet).
    * Subsequent equi-joins between tables bucketed the same way on
    * the same key produce no Exchange. `path` makes the table
    * EXTERNAL at that location (so callers control the storage dir —
    * the default managed location is the session warehouse); bucketed
    * writes must go through `saveAsTable` either way, because bucket
    * metadata lives in the catalog, not the files. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Salted inner equi-join of a skewed `big` side with a `small`
    * side on `key`: big rows get a deterministic salt from a sibling
    * column's hash; small rows are replicated once per salt value. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, saltSource: String): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(col(saltSource)), lit(saltFactor)))
    val salts = small.sparkSession.range(saltFactor)
      .select(col("id").cast("int").as("__salt"))
    val replicated = small.crossJoin(broadcast(salts))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
