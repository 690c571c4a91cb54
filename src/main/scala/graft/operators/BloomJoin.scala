package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi-join: the scale path for "fact rows whose
  * key appears in a selective dim" (the reference's archive-only
  * semi-join, SURVEY §2.2 F6 / §2.5 J3, `Handler.pm:356-360`) when
  * the dim is too large to broadcast as a hash relation but its KEY
  * SET still compresses into a few MB of bloom bits.
  *
  * Shape: build a bloom filter over the dim keys (one pass, mergeable
  * per-partition sketches — `DataFrameStatFunctions.bloomFilter` is
  * Spark's public API for exactly this), broadcast the bits, and drop
  * non-matching fact rows BEFORE the shuffle of the exact semi-join.
  * With fpp = 1% the shuffle moves ~1% false positives plus the true
  * matches instead of the whole fact table; the exact left_semi join
  * then removes the false positives, so the RESULT IS EXACT — the
  * bloom only prunes, it never decides membership.
  *
  * Catalyst does inject this rewrite itself (runtime row-level
  * filtering, spark.sql.optimizer.runtime.bloomFilter.*) when it can
  * see a selective build side with creation-side shuffle; this
  * operator is the explicit form for when the planner's heuristics
  * don't fire (e.g. the dim arrives pre-filtered from another stage,
  * or the threshold confs rule it out) and for pipelines that reuse
  * one built filter across several fact scans.
  *
  * The probe is a scala UDF (BloomFilterMightContain, the codegen'd
  * expression Catalyst uses, is private[sql]); the per-row cost is a
  * few hashes — cheap next to the shuffle bytes it saves.
  */
object BloomJoin {

  /** Exact left-semi join of `fact` against `dim` on a LONG key,
    * bloom-prefiltered. `expectedDimKeys` sizes the filter (overshoot
    * is safe: bits scale linearly, ~9.6 bits/key at 1% fpp). */
  def semiJoinLong(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    // Empty-dim guard: `bloomFilter` on a zero-row frame NPEs inside
    // Spark (no partition produces a sketch to merge). An over-
    // filtered dim is a legitimate runtime state, and the semi-join
    // answer is simply no rows — the isEmpty probe costs one
    // limit-1 task against the full scan the sketch build needs.
    if (dim.isEmpty) return fact.filter(lit(false))
    val bloom = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bits = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bits.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }
}
