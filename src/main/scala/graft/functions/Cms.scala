package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch point-frequency estimation — the third mergeable
  * sketch next to [[FrequentItems]] (Misra–Gries: WHICH items are
  * frequent) and HLL (a14: how MANY distinct): CMS answers "how often
  * does THIS item occur" for ad-hoc probes without keeping any
  * per-item state.
  *
  * Scale shape: `df.stat.countMinSketch` builds one depth×width
  * integer grid per partition and merges them on the driver — no
  * shuffle, no per-key rows crossing the wire; the sketch size is
  * fixed by (eps, confidence) regardless of data volume. Guarantees:
  * estimate ≥ true count always (hash collisions only ADD), and
  * estimate ≤ true + eps·N with probability ≥ confidence.
  *
  * Like the Misra–Gries query (t10), the driver-gated query runs the
  * sketch in its EXACT regime: probing K keys with width ≫ K makes
  * all-row collisions vanishingly unlikely, so estimates equal exact
  * counts and the standard oracle applies; the lossy regime's error
  * bound is spec-tested instead.
  */
object Cms {

  /** Build the sketch over `column` in one pass. */
  def build(df: DataFrame, column: String, eps: Double = 1e-4,
      confidence: Double = 0.999, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(col(column), eps, confidence, seed)

  /** Estimated counts for the probe keys, as (key, est) rows. */
  def termCounts(df: DataFrame, column: String, probes: Seq[String],
      eps: Double = 1e-4, confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    val cms = build(df, column, eps, confidence, seed)
    val spark = df.sparkSession
    import spark.implicits._
    probes.map(t => (t, cms.estimateCount(t))).toDF("value", "est")
  }
}
