package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for AGGREGATION hot keys (the join-side salting
  * lives in [[graft.store.Bucketing.saltedJoin]]).
  *
  * AQE's skew handling splits oversized sort-merge-join partitions at
  * runtime, but a hot GROUP BY key still lands every post-combine row
  * on one reducer. Salting fixes that statically, and is the pattern
  * every large pipeline reaches for when one key holds 10% of a
  * 100 TB table (the null key, the "unknown" country, the default
  * referrer — the reference's data model has all three: its fact
  * aggregation `Handler.pm:313-371` groups by low-cardinality columns
  * where a hot value is the norm).
  *
  * The operator is RESULT-IDENTICAL to its unsalted form — the salt
  * only changes the shuffle layout, never the semantics — so the
  * driver oracles it against the plain SQL GROUP BY.
  */
object Skew {

  /** Two-stage salted SUM aggregation.
    *
    * Stage 1 groups by (keys, salt) — a hot key's rows spread over
    * `nSalts` reducers, each producing one partial sum; stage 2 groups
    * the `nSalts` partials per key. For EXACT sum types (integral,
    * decimal) the result is identical to the direct
    * `groupBy(keys).sum` under any partitioning and salt assignment;
    * floating-point sums are order-dependent in ANY distributed
    * aggregation (salted or not), so cast doubles to decimal first if
    * bit-reproducibility matters (the engine-wide moneySum rule).
    *
    * The salt hashes the whole row (all columns), not a rowid: it is
    * deterministic for a given row, needs no shuffle-unsafe id
    * generator, and distributes duplicates of the hot key uniformly.
    *
    * Cost note: on UNSKEWED data this adds one extra (tiny) shuffle of
    * `keys x nSalts` partial rows — use it where a hot key is known or
    * measured (see [[skewRatio]]), not as the default; map-side
    * combine already absorbs mild skew, the pathology is ONE reducer
    * receiving a significant fraction of all post-combine rows.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      sumName: String, nSalts: Int = 16): DataFrame = {
    require(!df.columns.contains("_salt") && !df.columns.contains("_partial"),
      "saltedSum reserves the _salt/_partial column names")
    val salt = pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(nSalts))
    val ks = keyCols.map(col)
    df.withColumn("_salt", salt)
      .groupBy((ks :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(ks: _*)
      .agg(sum(col("_partial")).as(sumName))
  }

  /** Measured skew ratio of a key column: max group size over mean
    * group size — the decision input for reaching for the salted
    * forms (rule of thumb: ratio >> number of executor cores means
    * one reducer is the straggler). Driver-side scalar, one pass. */
  def skewRatio(df: DataFrame, keyCol: String): Double = {
    val g = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .agg(max("c").cast("double").as("mx"), avg("c").as("mean"))
      .head()
    // empty input: no groups, NULL aggregates — report NaN (no skew
    // evidence) instead of NPE-ing on the null unbox
    if (g.isNullAt(0) || g.isNullAt(1)) Double.NaN
    else g.getDouble(0) / g.getDouble(1)
  }
}
