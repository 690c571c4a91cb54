package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for the training-data pipeline: exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard near-dup.
  *
  * Scale posture (100 TB):
  *  - exact dedup is one hash-groupBy on a digest — the digest (16
  *    bytes) shuffles, never the document body;
  *  - MinHash: per-doc signatures are built by a single
  *    explode(tokens) x seeds aggregation with map-side partial MIN;
  *    candidate generation shuffles only (doc_id, band_key) pairs;
  *  - SimHash: 60 conditional SUMs in ONE aggregation pass (no
  *    bit-explosion join), then pigeonhole blocking on 15-bit quarters
  *    so the pair join never goes quadratic;
  *  - n-gram Jaccard: inverted-index join on shingle hashes (shuffle
  *    is bounded by posting-list sizes, not n^2);
  *  - every verify step re-checks candidates with exact integer
  *    arithmetic (a*inter >= b*union), so LSH recall/precision issues
  *    only ever ADD candidate pairs to verify, never wrong results.
  *
  * All hashes are md5-derived ([[Text.hash60]]) — deterministic and
  * reproducible in any SQL engine, unlike JVM murmur variants.
  */
object Dedup {

  /** Exact dedup on the md5 digest of lowercased text.
    * Returns one row per distinct content: (key, copies, canonical_id)
    * where canonical is the smallest id — the row a dedup pass keeps. */
  def exact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(md5(lower(col(textCol))).as("key"), col(idCol).as("id"))
      .groupBy("key")
      .agg(count(lit(1)).as("copies"), min("id").as("canonical"))

  /** Per-doc MinHash signature rows: (id, seed, minhash).
    * k seeds; h_seed(tok) = hash60(seed || '|' || tok). */
  def minhashSignatures(docs: DataFrame, k: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(Text.tokenSet(col(textCol))).as("tok"))
    val seeds = docs.sparkSession.range(k).select(col("id").as("seed"))
    toks.crossJoin(broadcast(seeds))
      .select(col("id"), col("seed"),
        Text.hash60(concat(col("seed").cast("string"), lit("|"), col("tok"))).as("h"))
      .groupBy("id", "seed").agg(min("h").as("minhash"))
  }

  /** LSH band keys: group the k signature rows into bands of r rows;
    * band key = md5 of the comma-joined minhash values (seed order). */
  def lshBands(sig: DataFrame, rowsPerBand: Int = 4): DataFrame =
    sig.withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy("id", "band")
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("seed"), col("minhash")))),
        x => x.getField("minhash").cast("string")), ",")).as("bkey"))

  /** Candidate pairs: ids sharing any (band, bkey); a < b, distinct. */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val x = bands.as("x"); val y = bands.as("y")
    x.join(y, col("x.band") === col("y.band") &&
        col("x.bkey") === col("y.bkey") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** Exact token-set Jaccard join for a pair set: keeps pairs with
    * jaccard >= num/den using integer cross-multiplication
    * (den * inter >= num * union) — no float comparison anywhere. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, num: Int, den: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      Text.tokenSet(col(textCol)).as("toks"))
    pairs
      .join(sets.select(col("id").as("a"), col("toks").as("ta")), "a")
      .join(sets.select(col("id").as("b"), col("toks").as("tb")), "b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select(col("a"), col("b"))
  }

  /** MinHash+LSH near-dup pipeline: signatures -> bands -> candidates
    * -> exact-verify at jaccard >= num/den. */
  def minhashNearDup(docs: DataFrame, num: Int = 19, den: Int = 20,
      k: Int = 16, rowsPerBand: Int = 4): DataFrame =
    verifyJaccard(lshCandidates(lshBands(minhashSignatures(docs, k), rowsPerBand)),
      docs, num, den)

  /** 60-bit SimHash per doc, computed as 60 conditional sums in one
    * aggregation (no per-bit row blowup). Majority vote per bit;
    * exact ties (2*ones == ntokens) set the bit. */
  def simhash(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(Text.tokenSet(col(textCol))).as("tok"))
      .withColumn("h", Text.hash60(col("tok")))
    val bitSums = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1)).as(s"b$j"))
    val aggCols = count(lit(1)).as("n") +: bitSums
    val agg = toks.groupBy("id").agg(aggCols.head, aggCols.tail: _*)
    val sh = (0 until 60).map(j =>
      when(col(s"b$j") * 2 >= col("n"), shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ + _)
    agg.select(col("id"), sh.as("simhash"))
  }

  /** SimHash near-dup: pairs with hamming distance <= maxDist.
    * Pigeonhole blocking: 60 bits in 4 blocks of 15; any pair at
    * distance <= 3 shares at least one exact block. Pairs are joined
    * per block and deduped, never the full n^2. */
  def simhashNearDup(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val blocks = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(q =>
        struct(lit(q).as("q"),
          shiftright(col("simhash"), q * 15).bitwiseAND(0x7FFF).as("bk"))): _*)).as("blk"))
      .select(col("id"), col("simhash"), col("blk.q"), col("blk.bk"))
    val x = blocks.as("x"); val y = blocks.as("y")
    x.join(y, col("x.q") === col("y.q") && col("x.bk") === col("y.bk") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** n-gram (3-token shingle) Jaccard near-dup via an inverted-index
    * join on shingle hashes: only docs sharing a shingle ever meet.
    * Shared-shingle counts give |intersection| directly; set sizes
    * come from per-doc distinct-shingle counts. Integer threshold. */
  def ngramJaccardNearDup(docs: DataFrame, num: Int = 1, den: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val shingles = docs.select(col(idCol).as("id"),
      explode(array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => Text.hash60(concat_ws(" ", slice(toks, i, lit(3))))))).as("sh"))
    val sizes = shingles.groupBy("id").agg(count(lit(1)).as("nsh"))
    val x = shingles.as("x"); val y = shingles.as("y")
    val inter = x.join(y, col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("nsh").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("nsh").as("nb")), "b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select(col("a"), col("b"))
  }
}
