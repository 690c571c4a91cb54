package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The committed-artifact half of the sf1 regression gate (round-7
  * verdict item 5): `BENCH_SF1.json` (heavy subset at 10x data) vs
  * `BENCH_SF01_REF.json` (same subset, same host, same session
  * protocol at sf0.1). Each query's WARM growth must stay inside its
  * envelope — 3x by default for a 10x data step (fixed per-query cost
  * still dominates most of the board at these sizes; data-bound cost
  * must be at-worst linear), with documented exceptions where the TRUE
  * OUTPUT or the inherent algorithmic work grows super-linearly on the
  * ScaleGen clone corpus (COVERAGE.md "Measured scaling to sf1").
  *
  * Artifacts are produced per round by `graft.Bench` with
  * SPARK_GRAFT_BENCH_OUT pointed at the two files; this spec fails the
  * build if a re-measure shows a query leaving its envelope — i.e. a
  * plan regression that the sf0.01 oracle board cannot see.
  */
class Sf1GrowthGateSpec extends AnyFunSuite {

  /** Envelope overrides: query -> (maxGrowth, why). Everything else: 3x. */
  private val exceptions: Map[String, (Double, String)] = Map(
    // dedup family: every original gains 9 near-identical clones at
    // sf1, so TRUE pairs grow ~45x — semantic output growth, not plan
    "d4_ngram_jaccard" -> (35.0, "exact Jaccard true-pair growth on clone corpus"),
    "d11_containment" -> (35.0, "same true-pair growth; no length filter by design"),
    "d2_minhash_lsh" -> (12.0, "LSH buckets hold 10-clone families"),
    "d6_dedup_clusters" -> (12.0, "label propagation: more rounds x more edges"),
    "d9_semantic_dedup" -> (15.0, "IVF cells 10x denser at fixed cell count"),
    "v10_pq_trained" -> (5.0, "codebook training passes scale with corpus"),
    "d3_simhash" -> (10.0, "pigeonhole blocks hold clone families"),
    "d8_substring_spans" -> (6.0, "hit windows grow with clone density"),
    "d12_record_linkage" -> (10.0, "block-key groups hold clone families"),
    "d13_survivorship" -> (8.0, "cluster count grows with clone density"),
    // similarity: fixed cell/bucket counts get 10x denser
    "v5_ann_ivf" -> (12.0, "nprobe candidates scale with cell size"),
    // exact sort paths (the approx sibling is the documented 100 TB path)
    "a12_median" -> (6.0, "exact median = full sort"),
    "a14_approx_distinct" -> (6.0, "exact-distinct comparison side"),
    "a18_approx_quantiles" -> (6.0, "exact-percentile comparison side"),
    // inherently super-linear or constant-per-row-bound shapes, measured
    // and explained in COVERAGE.md round-7 sweep
    "g2_triangles" -> (10.0, "exact wedge count, avg degree ~120 at sf1"),
    "g1_pagerank" -> (8.0, "10x edges x fixed iterations"),
    "h21_waiting_supplier" -> (16.0, "TPC-H Q21 broadcast->shuffle flip"),
    "m4_image_decode" -> (14.0, "row-at-a-time binary decode, linear in rows"),
    "m6_image_phash" -> (14.0, "real PNG decode, CPU-bound linear"),
    "m7_phash_neardup" -> (14.0, "decode + banded hamming join on clone corpus"),
    "t16_contamination" -> (6.0, "sliding-gram index grows with clone grams"),
    "st1_stream_daily" -> (6.0, "micro-batch count grows with backlog files"),
    "st2_stream_dedup" -> (6.0, "dedup state grows with distinct keys"),
    "set_closure" -> (6.0, "iterative closure: per-round job overhead x 10x rows"),
    "j7_salted_join" -> (6.0, "salted shuffle, linear but small base time"))

  private def warmTimes(path: String): Map[String, Double] = {
    val root = new ObjectMapper().readTree(new java.io.File(path))
    root.get("queries").properties().asScala.map { e =>
      e.getKey -> e.getValue.get("warm").asDouble()
    }.toMap
  }

  test("sf1 warm growth stays inside per-query envelopes vs sf0.1") {
    val sf01 = warmTimes("BENCH_SF01_REF.json")
    val sf1 = warmTimes("BENCH_SF1.json")
    assert(sf1.nonEmpty && sf01.nonEmpty, "bench artifacts missing or empty")
    val offenders = sf1.toSeq.sortBy(_._1).flatMap { case (q, t1) =>
      sf01.get(q).flatMap { t01 =>
        if (t1 < 0 || t01 < 0) Some(s"$q FAILED in a bench run (sf0.1=$t01 sf1=$t1)")
        else {
          // floor the denominator: sub-0.2s sf0.1 times are dominated by
          // per-job scheduling noise and make ratios meaningless
          val ratio = t1 / math.max(t01, 0.2)
          val cap = exceptions.get(q).map(_._1).getOrElse(3.0)
          if (ratio > cap)
            Some(f"$q grew $ratio%.1fx (cap ${cap}%.0fx): ${t01}%.2fs -> ${t1}%.2fs")
          else None
        }
      }
    }
    assert(offenders.isEmpty,
      s"sf1 growth gate failed:\n${offenders.mkString("\n")}")
  }

  test("sf1 suite-level growth is sane for a 10x data step") {
    val sf01 = warmTimes("BENCH_SF01_REF.json").values.filter(_ >= 0).sum
    val sf1 = warmTimes("BENCH_SF1.json").values.filter(_ >= 0).sum
    assert(sf1 < 10.0 * sf01,
      f"suite grew ${sf1 / sf01}%.1fx on 10x data — worse than linear overall")
  }
}
