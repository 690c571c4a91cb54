package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching — edit-distance near-dup pairs. The
  * classic record-linkage shape missing from the shingle/minhash
  * family: MinHash catches token-set overlap, Levenshtein catches
  * character-level edits (typos, OCR noise, template fills) that can
  * leave token sets disjoint.
  *
  * All-pairs Levenshtein is O(n²·len²) — never viable. The standard
  * scale shape is BLOCKING: a cheap deterministic key buckets rows so
  * only same-block pairs are verified, then the exact (bounded)
  * distance decides. Block sizes are capped so one degenerate key
  * (empty docs, boilerplate prefix) cannot create a quadratic
  * straggler task — same skew guard as the LSH bucket / posting-list
  * caps in [[Dedup]].
  *
  * The match key is an ASCII-only prefix: Spark and other engines
  * agree on per-CHARACTER edit distance only when characters and
  * bytes coincide, and a bounded prefix caps the per-pair cost. The
  * verify uses Spark's bounded `levenshtein(l, r, max)` (banded DP,
  * O(max·len) per pair instead of O(len²)).
  */
object Fuzzy {

  /** Near-dup pairs (id1 < id2) with their edit distance.
    * `docs` needs (doc_id, text). Blocking = exact match on the first
    * `blockLen` chars of the normalized key. */
  def levenshteinPairs(docs: DataFrame, keyLen: Int = 40, blockLen: Int = 8,
      maxDist: Int = 10, maxBlock: Int = 64): DataFrame = {
    val keyed = docs.select(col("doc_id"),
        substring(regexp_replace(col("text"), "[^ -~]", ""), 1, keyLen)
          .as("key"))
      .withColumn("block", substring(col("key"), 1, blockLen))
    val admitted = keyed.groupBy("block").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBlock).select("block")
    val inBlock = keyed.join(broadcast(admitted), Seq("block"))
    val left = inBlock.select(col("block"), col("doc_id").as("id1"),
      col("key").as("k1"))
    val right = inBlock.select(col("block"), col("doc_id").as("id2"),
      col("key").as("k2"))
    left.join(right, Seq("block"))
      .filter(col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("k1"), col("k2"), maxDist))
      .filter(col("dist") >= 0) // bounded variant returns -1 past maxDist
      .select(col("id1"), col("id2"), col("dist"))
  }
}
