package graft.series

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact series statistics one step beyond the reference's
  * view-layer smoothing (SURVEY §2.7 W-family): seasonality detection
  * via lagged autocovariance and exponentially-weighted smoothing.
  * Both stay in LONG arithmetic end-to-end so the results hash-match
  * any engine — floats never enter the dataflow.
  *
  * Scale posture: both operate on the already-aggregated daily series
  * (one row per key × day — bounded by calendar length, not corpus
  * size), so every join/group here moves series-sized data. The 100 TB
  * cost lives in the upstream daily aggregation, which is the shared
  * map-side-combined fact scan.
  */
object Stats {

  /** Lag-k autocovariance components per series key. For the pairs
    * (x_t, y = x_{t+lag}) — calendar lag, so gaps don't slide the
    * window — emits the integer-exact pieces of the Pearson
    * correlation: n, cov_num = n·Σxy − Σx·Σy, var_x = n·Σxx − (Σx)²,
    * var_y = n·Σyy − (Σy)². The caller (or a UI) does the one float
    * op, corr = cov_num/√(var_x·var_y); keeping the engine output
    * integral makes it engine-exact.
    *
    * The self-join is an equi-join on (key, date+lag) over the daily
    * series — broadcastable at any realistic calendar span.
    *
    * Arithmetic bound (documented, not silently wrapped): the long
    * products are exact while n·x·y < 2⁶³, i.e. daily per-key counts
    * up to ~3×10⁸ across a 20-year calendar (n ≤ 7300) — an order of
    * magnitude above any observed per-metric daily volume at the
    * 100 TB design point. Beyond that DuckDB raises on the multiply
    * while Spark wraps, so the oracle would fail LOUDLY rather than
    * hash-match a wrapped value.
    */
  def autocorrComponents(daily: DataFrame, lag: Int,
      keyCol: String = "value", dateCol: String = "date",
      cntCol: String = "cnt"): DataFrame = {
    val a = daily.select(col(keyCol), col(dateCol), col(cntCol).as("x"))
    val b = daily.select(col(keyCol).as("__bk"), col(dateCol).as("__bd"),
      col(cntCol).as("y"))
    a.join(b, col(keyCol) === col("__bk") &&
        col("__bd") === date_add(col(dateCol), lag))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        sum(col("x") * col("y")).as("__sxy"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__sxx"),
        sum(col("y") * col("y")).as("__syy"))
      .select(col(keyCol), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("cov_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("var_x"),
        (col("n") * col("__syy") - col("__sy") * col("__sy")).as("var_y"))
  }

  /** Exponentially-weighted moving sum with power-of-two decay over a
    * bounded lookback: for each present (key, date),
    * ewma_num = Σ_{k=0..h} x_{t−k}·2^(h−k) and ewma_den = the matching
    * Σ 2^(h−k) over the days that EXIST in the series — so
    * ewma_num/ewma_den is the gap-aware weighted mean and both sides
    * are exact longs (weights are powers of two, never fractions).
    *
    * Shape: NO range join. Each daily row fans out to the ≤ h+1 future
    * dates it contributes to (map-side explode of a constant-length
    * sequence), then one hash aggregate on (key, date) and an
    * equi-join back to the series to keep only real dates. The naive
    * form — a `BETWEEN` self-join — plans as a sort-merge join with a
    * residual range filter whose matched-row count is the same h+1
    * per row but whose join keys (key only) skew on low-cardinality
    * series; the explode form ships identical data volume through a
    * pure equi-shuffle instead.
    */
  def ewma(daily: DataFrame, halfWindow: Int = 7,
      keyCol: String = "value", dateCol: String = "date",
      cntCol: String = "cnt"): DataFrame = {
    val h = halfWindow
    val contrib = daily
      .select(col(keyCol), col(dateCol), col(cntCol),
        explode(sequence(lit(0), lit(h))).as("__k"))
      .select(col(keyCol),
        date_add(col(dateCol), col("__k")).as(dateCol),
        (col(cntCol) * expr(s"shiftleft(1L, $h - __k)")).as("__nc"),
        expr(s"shiftleft(1L, $h - __k)").as("__dc"))
      .groupBy(keyCol, dateCol)
      .agg(sum("__nc").as("ewma_num"), sum("__dc").as("ewma_den"))
    daily.join(contrib, Seq(keyCol, dateCol))
      .select(col(keyCol), col(dateCol), col(cntCol),
        col("ewma_num"), col("ewma_den"))
  }
}
