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

  /** Materialization policy for the bounded pair-table OUTPUTS of
    * d2/d3/d4/d11 (minhash/simhash/jaccard/containment): each op
    * unpersists its internal feature cache before returning, so by
    * default the output is eagerly `localCheckpoint`ed SERIALIZED
    * while the cache is still hot — the 30x heap insurance from
    * round 9 (deserialized checkpoint rows cost 5-10x their
    * serialized size). `Some(level)` = eager checkpoint at that
    * level; `None` = return the LAZY plan and leave materialization
    * to the caller (who then pays the feature-pipeline recompute on
    * every action — both self-join sides re-shingle). A var, not a
    * per-call param: it is a measurement/ops knob (`DedupCkptBench`
    * sweeps it and COVERAGE.md records the measured trade), not
    * query semantics — results are identical under every setting. */
  @volatile private[graft] var pairCheckpoint
      : Option[org.apache.spark.storage.StorageLevel] =
    Some(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** Apply [[pairCheckpoint]] to a bounded pair-table output. */
  private def ckptPairs(df: DataFrame): DataFrame = pairCheckpoint match {
    case Some(lvl) => df.localCheckpoint(true, lvl) // MEMORY_AND_DISK_SER default
    case None => df
  }

  /** Shared skew guard: drop rows whose group (by `cols`) exceeds
    * `cap` members. The sizing window rides the same shuffle the
    * downstream per-group join/aggregate needs. None = no-op. */
  private def capGroupSize(df: DataFrame, cols: Seq[String],
      cap: Option[Int]): DataFrame = cap match {
    case None => df
    case Some(c) =>
      import org.apache.spark.sql.expressions.Window
      df.withColumn("__n",
          count(lit(1)).over(Window.partitionBy(cols.map(col): _*)))
        .filter(col("__n") <= c).drop("__n")
  }


  /** Exact dedup on the md5 digest of lowercased text.
    * Returns one row per distinct content: (key, copies, canonical_id)
    * where canonical is the smallest id — the row a dedup pass keeps. */
  def exact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(md5(lower(col(textCol))).as("key"), col(idCol).as("id"))
      .groupBy("key")
      .agg(count(lit(1)).as("copies"), min("id").as("canonical"))

  /** Incremental (cross-corpus) exact dedup: classify every `batch`
    * document against an already-ingested `corpus` by content digest —
    * the op an append-only training pipeline runs on each new crawl
    * drop before ingesting it. One row per batch doc:
    * (id, key, status) with status
    *  - `dup_corpus`: content already present in the corpus (wins
    *    even when the batch also repeats it internally);
    *  - `dup_batch`:  content new to the corpus, but a smaller-id
    *    batch doc carries the same bytes (within-batch duplicate);
    *  - `new`:        first occurrence anywhere — the rows to ingest.
    *
    * Scale posture: the corpus collapses to a DISTINCT digest set
    * before the join, so only 16-byte keys shuffle from the 100 TB
    * side — and an ingest pipeline keeps that digest set as its own
    * compact table, paying the corpus scan once ever, not per batch.
    * The within-batch canonical window and the corpus join both hash
    * on `key`, so the exchange is reused across the two steps. For
    * extreme corpus/batch asymmetry, prefilter the batch with
    * [[graft.operators.BloomJoin]] over the corpus digests; the exact
    * join after it keeps the result exact. */
  def incrementalExact(corpus: DataFrame, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null text gets a sentinel key: md5(null) is null, and an
    // equi-join never matches null = null — two null-text batch docs
    // classified as dups of each other while NEITHER matched a
    // null-text corpus doc. The sentinel makes the corpus check agree
    // with exact()'s groupBy (all null keys in one group); the d10
    // oracle carries the same COALESCE.
    val digest = coalesce(md5(lower(col(textCol))), lit("__null_text__"))
    val corpusKeys = corpus.select(digest.as("key")).distinct()
      .withColumn("__in", lit(1))
    batch.select(col(idCol).as("id"), digest.as("key"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy("key").orderBy("id")))
      .join(corpusKeys, Seq("key"), "left")
      .select(col("id"), col("key"),
        when(col("__in") === 1, "dup_corpus")
          .when(col("__rn") > 1, "dup_batch")
          .otherwise("new").as("status"))
  }

  /** XOR masks for the k min-hash functions: h_i(tok) =
    * hash60(tok) XOR mask_i. XOR by a fixed mask is a bijection on
    * the hash space, so MIN over masked hashes is a valid min-hash
    * family — at 1/k-th the md5 cost of hashing (seed||token) k
    * times. Masks are md5-derived literals, reproducible anywhere. */
  def minhashMasks(k: Int): Seq[Long] =
    (0 until k).map(i => Text.hash60Literal(s"minhash-seed-$i"))

  /** Per-doc MinHash signature from a feature table (id, h), wide
    * form: (id, m0..m{k-1}). ONE md5 upstream per feature — the k
    * per-seed minima are k MIN aggregates over the same exploded rows
    * (single shuffle, map-side partial MIN). */
  def minhashSignaturesFrom(features: DataFrame, k: Int = 16): DataFrame = {
    val masks = minhashMasks(k)
    val aggs = masks.zipWithIndex.map { case (m, i) =>
      min(col("h").bitwiseXOR(lit(m))).as(s"m$i")
    }
    features.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Token-level signatures (kept for set-similarity use). */
  def minhashSignatures(docs: DataFrame, k: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    minhashSignaturesFrom(
      docs.select(col(idCol).as("id"),
        explode(Text.tokenSet(col(textCol))).as("tok"))
        .select(col("id"), Text.hash60(col("tok"), Some(docs.sparkSession)).as("h")), k)

  /** LSH band keys from the wide signature: band key = md5 of the
    * comma-joined band minima. Emits (id, band, bkey). */
  def lshBands(sig: DataFrame, rowsPerBand: Int = 4): DataFrame = {
    val k = sig.columns.count(_.startsWith("m"))
    // fail loudly instead of silently discarding the trailing minima:
    // k=10, rowsPerBand=4 would band only m0..m7 and quietly run
    // below the (k, rowsPerBand) LSH recall curve the caller sized
    require(k % rowsPerBand == 0,
      s"signature width $k is not a multiple of rowsPerBand=$rowsPerBand")
    val nBands = k / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val ms = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"m$i").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws(",", ms: _*)).as("bkey"))
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bkey"))
  }

  /** Candidate pairs: ids sharing any (band, bkey); a < b, distinct.
    *
    * `maxBucketSize` is the 100 TB skew guard: a degenerate bucket
    * (e.g. a boilerplate band shared by millions of docs) makes the
    * self-join quadratic IN THAT BUCKET. Capping drops buckets larger
    * than the threshold before the join — the standard LSH trade
    * (those pairs are usually re-found through their other, more
    * selective bands; exact-duplicate floods are better handled by
    * [[exact]] dedup first). The sizing window rides the same
    * (band, bkey) shuffle the join needs anyway. */
  def lshCandidates(bands: DataFrame,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val pruned = capGroupSize(bands, Seq("band", "bkey"), maxBucketSize)
    val x = pruned.as("x"); val y = pruned.as("y")
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

  /** Exact Jaccard verify on a feature table (id, h): intersections
    * are computed ONLY for the candidate pairs, via two joins and a
    * count — never materializing per-doc arrays. Integer threshold. */
  def verifyJaccardOn(pairs: DataFrame, features: DataFrame,
      num: Int, den: Int): DataFrame = {
    val sizes = features.groupBy("id").agg(count(lit(1)).as("n"))
    val fa = features.select(col("id").as("a"), col("h"))
    val fb = features.select(col("id").as("b"), col("h"))
    val inter = pairs.join(fa, "a").join(fb, Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
      .filter(col("inter") * den >= (col("na") + col("nb") - col("inter")) * num)
      .select(col("a"), col("b"))
  }

  /** MinHash+LSH near-dup: the canonical document pipeline
    * shingle -> minhash -> band -> bucket-join -> exact verify at
    * shingle-jaccard >= num/den.
    *
    * SHINGLE-level hashing matters at scale: token-level similarity
    * saturates on natural corpora (everything shares common words),
    * making token-LSH buckets giant; the 3-gram shingle space keeps
    * background similarity near zero, so buckets stay tiny and the
    * candidate join never goes quadratic (measured here: 7M candidate
    * pairs token-level vs 256 shingle-level on the same 5k docs). */
  def minhashNearDup(docs: DataFrame, num: Int = 1, den: Int = 2,
      k: Int = 16, rowsPerBand: Int = 4,
      maxBucketSize: Option[Int] = None): DataFrame = {
    // The feature table feeds both the signature build and the verify
    // join — persist it so the shingle pipeline runs once, not twice.
    // The pair OUTPUT is bounded by construction (LSH buckets + the
    // verify filter), so it is materialized eagerly (localCheckpoint)
    // and the feature cache released before returning: a long-lived
    // driver running many dedup passes otherwise accumulates every
    // pass's shingle cache for the life of the session.
    val features = shingleHashes(docs)
      .select(col("id"), col("sh").as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidates(
      lshBands(minhashSignaturesFrom(features, k), rowsPerBand), maxBucketSize)
    val out = ckptPairs(verifyJaccardOn(cands, features, num, den))
    features.unpersist()
    out
  }

  /** 60-bit SimHash per doc, computed as 60 conditional sums in one
    * aggregation (no per-bit row blowup). Majority vote per bit;
    * exact ties (2*ones == ntokens) set the bit. */
  def simhash(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(Text.tokenSet(col(textCol))).as("tok"))
      .withColumn("h", Text.hash60(col("tok"), Some(docs.sparkSession)))
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
    * per block and deduped, never the full n^2.
    *
    * `maxBlockSize` is the skew guard: a degenerate block value
    * (e.g. near-identical boilerplate collapsing to one simhash
    * region) would make its self-join quadratic; capping drops such
    * blocks — pairs may still meet through their other three blocks
    * (recall trade, None = exact blocking). */
  def simhashNearDup(docs: DataFrame, maxDist: Int = 3,
      maxBlockSize: Option[Int] = None): DataFrame = {
    // One row per doc — persist so the token explode + 60-sum agg
    // runs once instead of once per self-join side; the bounded pair
    // output checkpoints eagerly so the cache is released before
    // returning (no per-call cache accumulation in long sessions).
    val sh = simhash(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allBlocks = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(q =>
        struct(lit(q).as("q"),
          shiftright(col("simhash"), q * 15).bitwiseAND(0x7FFF).as("bk"))): _*)).as("blk"))
      .select(col("id"), col("simhash"), col("blk.q"), col("blk.bk"))
    val blocks = capGroupSize(allBlocks, Seq("q", "bk"), maxBlockSize)
    val x = blocks.as("x"); val y = blocks.as("y")
    val out = x.join(y, col("x.q") === col("y.q") && col("x.bk") === col("y.bk") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    // SERIALIZED (default policy): on a clone-dense corpus the pair
    // table itself is large (every k-clone family emits C(k,2) rows);
    // deserialized checkpoint rows cost 5-10x their serialized size
    // and OOM'd the 8g bench heap at the 30x step
    val ck = ckptPairs(out)
    sh.unpersist()
    ck
  }

  /** Connected components over a near-dup pair list: every document
    * gets the MINIMUM doc id reachable through the pair graph as its
    * cluster id — the assignment a dedup pass uses to keep exactly one
    * representative per near-dup cluster. Documents in no pair are
    * their own cluster.
    *
    * Min-label propagation with path halving: each round ships every
    * vertex's current label across its edges, PLUS a pointer jump
    * (my label's current label — still a member of my component, so
    * the min stays component-local), and takes the per-vertex MIN.
    * The jump makes label trees halve in depth each round, so the
    * loop converges in O(log diameter) rounds rather than
    * O(diameter) — the standard shortcutting trick of the
    * large-star/small-star family.
    *
    * Only vertices that appear in a pair enter the loop: isolated
    * documents (the overwhelming majority of a corpus after LSH) are
    * their own cluster by definition and join back AFTER the
    * fixpoint, so the corpus-sized table is scanned once, never
    * shuffled per round.
    *
    * Convergence costs no join: per-vertex labels are monotonically
    * non-increasing (the union includes each vertex's own label), so
    * the global label sum strictly decreases until fixpoint — one
    * tiny agg over the round's already-checkpointed blocks decides
    * termination. Bounded by `maxIters`. */
  /** Lazily-created PER-PARENT-SESSION child session for the
    * clustering loop (AQE off). Building a fresh `newSession()` per
    * call was measured at ~0.25-0.3 s fixed cost at sf0.1 (a fresh
    * SessionState instantiates the whole analyzer/optimizer stack on
    * first use, plus the dynamic-conf copy) — a real tax on repeated
    * incremental-dedup calls, so the child is created ONCE per parent
    * and reused; calls are isolated from each other by the uniquely
    * named global temp views, not by the session. WeakHashMap: the
    * child holds the SparkContext/sharedState, NOT the parent session
    * object, so a discarded parent stays collectible. Caveat (by
    * design): the parent's dynamic conf is snapshotted at FIRST use —
    * later parent-side conf changes don't re-propagate; the loop's
    * parallelism is explicit (`repartition(p, ...)` with p computed
    * from the parent's live conf), so the only child-conf dependence
    * that matters is the AQE toggle this session exists to pin. */
  private val loopSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        org.apache.spark.sql.SparkSession]())
  private def loopSession(sess: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession =
    loopSessions.synchronized {
      var c = loopSessions.get(sess)
      if (c == null) {
        c = sess.newSession()
        // newSession starts from the builder conf, not runtime-set
        // values: copy the parent's dynamic SQL conf so the loop plans
        // under the same shuffle sizing / thresholds (static throw; skip)
        for ((k, v) <- sess.conf.getAll)
          try c.conf.set(k, v) catch { case _: Throwable => () }
        c.conf.set("spark.sql.adaptive.enabled", "false")
        loopSessions.put(sess, c)
      }
      c
    }

  def nearDupClusters(pairs: DataFrame, docs: DataFrame,
      idCol: String = "doc_id", maxIters: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val raw = pairs.select(col("a").as("x"), col("b").as("y"))
      .unionByName(pairs.select(col("b").as("x"), col("a").as("y")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ecnt = raw.count()
    if (ecnt == 0) {
      raw.unpersist()
      return docs.select(col(idCol), col(idCol).as("cluster"))
    }
    // Loop parallelism sized to the GRAPH, not the session default:
    // the pair graph after LSH is orders of magnitude smaller than the
    // corpus, and running a 500-vertex round across 32 (or a cluster's
    // 2000) shuffle partitions is pure scheduling overhead — measured
    // here at sf0.1: 0.95 s/round at 32 partitions vs 0.45 s at the
    // sized value. ~1M edges per partition, capped at the session
    // shuffle parallelism for genuinely large graphs.
    val maxP = try docs.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => 200 }
    val p = math.max(1L, math.min(maxP.toLong, ecnt / 1000000L + 1)).toInt
    val sess = docs.sparkSession
    // AQE re-plans every exchange as its own query-stage job — the
    // right trade on real data, pure scheduling latency on the loop's
    // already-sized p-partition rounds. Disable it for the LOOP ONLY
    // by running every round in a CHILD SESSION (`newSession()`:
    // isolated SQL conf, shared SparkContext + block/cache manager).
    // The parent session's conf is never touched, so concurrent
    // unrelated queries keep AQE and there is no restore race — the
    // former session-global toggle (serialized on a lock, with a
    // documented plan-latency caveat for concurrent callers) is
    // retired. Frames cross the session boundary through UNIQUELY
    // NAMED global temp views (dropped in the finally): a view stores
    // the LOGICAL plan, so the checkpointed LogicalRDD — with its
    // HashPartitioning — re-analyzes identically in the child.
    val child = loopSession(sess)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val rawView = s"graft_cc_raw_$tag"
    val outView = s"graft_cc_labels_$tag"
    val gtDb = sess.conf.get("spark.sql.globalTempDatabase", "global_temp")
    // try begins BEFORE view registration and the eager edge/label
    // checkpoints: those jobs run real corpus-scale work, and a
    // failure there must not leak the global temp view (app-lifetime
    // scope) or the raw persist — the finally below covers them all.
    try {
    raw.createOrReplaceGlobalTempView(rawView)
    // Pre-partition edges by source ONCE and localCheckpoint (eager):
    // the checkpointed LogicalRDD keeps HashPartitioning(x, p) — when
    // labels outgrow broadcast and the message join goes sort-merge,
    // edges never re-shuffle — AND it truncates the pair-generation
    // lineage (a full LSH pipeline), so every round's plan sees a leaf
    // table instead of re-analyzing that pipeline's plan tree. The
    // re-analysis was measured at sf0.1 as the dominant per-round cost
    // of the loop, dwarfing its actual 256-edge data movement.
    // edge and label tables are corpus-scale (one row per pair /
    // per doc): store SERIALIZED with disk spill — the deserialized
    // default is 5-10x larger and is what turns a tight heap into an
    // OOM at 30x data (see Graph.pageRank's edge table, same class)
    val edges = child.table(s"$gtDb.$rawView")
      .repartition(p, col("x")).localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var labels = edges.select(col("x").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    raw.unpersist()
      var prevSum: Option[java.math.BigDecimal] = None
      var converged = false
      var i = 0
      val dbg = sys.env.contains("GRAFT_DEBUG_CC")
      var tRound = System.nanoTime()
      while (!converged && i < maxIters) {
        // messages: my label, delivered to each neighbor; plus the
        // pointer jump label(label(id)) — path halving; the jumped-to
        // label belongs to a reachable vertex, so the min stays
        // component-local. Round 0's labels are the identity map, so
        // both joins collapse to a projection of the edge list itself
        // (and the jump to a no-op) — no join stages at all.
        val delivered =
          if (i == 0) edges.select(col("y").as("id"), col("x").as("label"))
          else {
            val msgs = edges.join(labels, edges("x") === labels("id"))
              .select(col("y").as("id"), col("label"))
            val jump = labels.as("l1").join(labels.as("l2"),
                col("l1.label") === col("l2.id"))
              .select(col("l1.id").as("id"), col("l2.label").as("label"))
            msgs.unionByName(jump)
          }
        val next = labels.unionByName(delivered)
          .repartition(p, col("id"))
          .groupBy("id").agg(min("label").as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // Convergence costs no join: per-vertex labels are monotonically
        // non-increasing (each vertex's own label rides the union), so
        // the global sum strictly decreases until fixpoint. This ONE
        // action both populates next's cache and returns the sum;
        // decimal(38,0) is exact at any vertex count (no Long overflow).
        val sumNow = Option(next
          .agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        // compareTo, not equals: BigDecimal.equals is scale-sensitive
        converged = (prevSum, sumNow) match {
          case (Some(a), Some(b)) => a.compareTo(b) == 0
          case (a, b) => a == b
        }
        prevSum = sumNow
        val finished = converged || i + 1 >= maxIters
        if (i % 5 == 4 && !finished) {
          // periodic lineage truncation (extra job, 1 round in 5)
          val ck = next.localCheckpoint(true,
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
          next.unpersist(); labels.unpersist()
          labels = ck
        } else {
          labels.unpersist()
          labels = next
        }
        if (dbg) {
          println(f"[cc] round $i: ${(System.nanoTime() - tRound) / 1e9}%.2f s sum=$sumNow")
          tRound = System.nanoTime()
        }
        i += 1
      }
      // Release the loop's cached tables before returning: callers
      // hold only the returned PLAN, so the final round's
      // MEMORY_AND_DISK persist (and the edge checkpoint) otherwise
      // live for the whole session — one leaked corpus-scale cache per
      // call. The eager SER checkpoint materializes the labels first,
      // making the unpersists safe (the module's standard
      // checkpoint-then-unpersist pattern). The checkpointed labels
      // cross back to the PARENT session through the second global
      // temp view, so the returned plan (and the corpus join below)
      // is planned under the caller's conf — AQE on.
      labels.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        .createOrReplaceGlobalTempView(outView)
      labels.unpersist()
      edges.unpersist()
      val finalLabels = sess.table(s"$gtDb.$outView")
      // isolated docs: their own cluster; the paired-vertex label table
      // is tiny relative to the corpus, so AQE broadcasts it and the
      // corpus side joins without a shuffle.
      docs.select(col(idCol).as("id"))
        .join(finalLabels, Seq("id"), "left")
        .select(col("id").as(idCol),
          coalesce(col("label"), col("id")).as("cluster"))
    } finally {
      // analysis is eager, so the returned frame holds the RESOLVED
      // checkpoint plan — the views are only needed until here.
      // dropGlobalTempView is a silent no-op for a never-created view
      // (early failure paths); unpersist is idempotent on raw.
      sess.catalog.dropGlobalTempView(rawView)
      sess.catalog.dropGlobalTempView(outView)
      raw.unpersist()
    }
  }

  /** Write-once materialization of the near-dup cluster assignment —
    * the d-family's analog of `store/LifetimeMv` and the o19/o20
    * bucket-layout trade: the minhash → LSH → verify → connected-
    * components chain is the most expensive computation the dedup
    * family runs, and several consumers (d6's assignment, d13's
    * survivorship, d14's soft weights — or any downstream curation
    * step) need the SAME (doc_id, cluster) table. Paying the chain
    * once per consumer (worse: once per consumer per action) is the
    * mistake; a production pipeline writes the assignment ONCE per
    * corpus generation as a curated table and every report joins it.
    *
    * In-session emulation of that table: the first caller per
    * (canonicalized docs plan, parameters) runs the chain and writes
    * (doc_id, cluster) parquet to a swept temp dir; every later call
    * in the JVM reads the files back. Parquet, not a cached plan, on
    * purpose: readers keep column pruning and AQE, results are
    * byte-stable across consumers by construction (one write, many
    * reads), and bench/ops cache hygiene (`clearCache`, RDD
    * unpersists) cannot invalidate what is a file. Keying on the
    * canonicalized plan means a different corpus, sf dir, or
    * parameter set builds its own table — never a stale read.
    *
    * `tablePath`: the DURABLE form of the same contract — the actual
    * curated table location a production corpus generation writes.
    * When given, the in-JVM plan-keyed cache is bypassed and the
    * FILES are the authority: an existing committed table
    * (`_SUCCESS` present) is read back as-is — across JVMs, across
    * sessions — and a missing or uncommitted one is (re)built in
    * place. The caller owns the keying (one path per corpus
    * generation) and the eviction (drop the directory to force a
    * rebuild); a half-written table from a crashed writer has no
    * `_SUCCESS` and rebuilds rather than serving torn files. */
  private val clustersCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Single-writer contract for a durable `tablePath`: exactly one
    * driver may build a given path at a time (concurrent builders
    * both seeing a missing `_SUCCESS` would overwrite each other's
    * files mid-commit) — a production corpus generation owns its
    * table path the way it owns any curated output directory. A
    * params sidecar (`_graft_params.json`) is committed with the
    * table; serving a committed table under DIFFERENT parameters
    * fails fast rather than silently returning clusters computed
    * with someone else's thresholds. */
  def clustersTable(docs: DataFrame, num: Int = 1, den: Int = 2,
      k: Int = 16, rowsPerBand: Int = 4,
      idCol: String = "doc_id", tablePath: Option[String] = None): DataFrame = {
    val params = s"""{"num":$num,"den":$den,"k":$k,""" +
      s""""rowsPerBand":$rowsPerBand,"idCol":"$idCol"}"""
    def build(dir: String): String = {
      nearDupClusters(
          minhashNearDup(docs, num, den, k, rowsPerBand), docs, idCol)
        .write.mode("overwrite").parquet(dir)
      dir
    }
    val path = tablePath match {
      case Some(p) =>
        // Hadoop FS, not java.io.File: the durable path may be on any
        // cluster filesystem (hdfs://, s3a://), and _SUCCESS is the
        // committer's atomicity marker on all of them
        val conf = docs.sparkSession.sessionState.newHadoopConf()
        val hp = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
        val sidecar = new org.apache.hadoop.fs.Path(p, "_graft_params.json")
        val fs = hp.getFileSystem(conf)
        // committed = _SUCCESS AND sidecar: the sidecar lands after
        // the parquet commit, so a writer crashing in that window
        // leaves _SUCCESS with no params record — serving that under
        // whatever params the NEXT caller passes is exactly the
        // silent mismatch the sidecar exists to prevent. Treat it as
        // torn and rebuild (single-writer contract: nobody else owns
        // this path mid-build).
        if (fs.exists(hp) && fs.exists(sidecar)) {
          // committed table: its params sidecar is the authority —
          // a mismatch means the caller mis-keyed the path, not that
          // we should rebuild (overwriting a table another generation
          // committed is the worse failure)
          val in = fs.open(sidecar)
          val existing = try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim finally in.close()
          require(existing == params,
            s"clustersTable at $p was committed with params $existing " +
              s"but was requested with $params — one tablePath keys ONE " +
              "parameter set; use a different path or drop the directory " +
              "to rebuild")
          p
        } else {
          // Destructive-rebuild guard (round-17 advisory): _SUCCESS
          // with data files but NO sidecar is what an UNRELATED
          // committed parquet dataset naturally looks like — a caller
          // who mis-keys tablePath at one must not have it silently
          // destroyed by our mode("overwrite"). The torn-commit
          // window this writer owns (crash between parquet commit and
          // sidecar write) is distinguished by the claim marker below,
          // created BEFORE the build starts. It lives NEXT TO the
          // table directory, not inside it — overwrite mode clears
          // the directory itself, which would erase an inner marker
          // exactly in the window it must survive.
          val tableDir = new org.apache.hadoop.fs.Path(p)
          val claim = new org.apache.hadoop.fs.Path(
            tableDir.getParent, s".${tableDir.getName}._graft_building")
          if (fs.exists(hp) && !fs.exists(claim) &&
              fs.listStatus(tableDir).exists(
                _.getPath.getName.endsWith(".parquet")))
            throw new IllegalStateException(
              s"clustersTable at $p contains a committed parquet dataset " +
                "with no _graft_params.json sidecar and no _graft_building " +
                "marker — refusing to overwrite a directory this writer " +
                "never built; point tablePath elsewhere or drop the " +
                "directory explicitly")
          fs.create(claim, true).close()
          build(p)
          val out = fs.create(sidecar, true)
          try out.write(params.getBytes("UTF-8")) finally out.close()
          fs.delete(claim, false)
          p
        }
      case None =>
        val sh = docs.queryExecution.analyzed.canonicalized.semanticHash()
        clustersCache.computeIfAbsent(
          s"$sh|${docs.schema.catalogString.hashCode}|$num/$den|$k|$rowsPerBand|$idCol",
          _ => build(graft.store.TempSweep.tempDir("graft_clusters")
            .toString + "/clusters"))
    }
    docs.sparkSession.read.parquet(path)
  }

  /** n-gram (3-token shingle) Jaccard near-dup via an inverted-index
    * join on shingle hashes: only docs sharing a shingle ever meet.
    * Shared-shingle counts give |intersection| directly; set sizes
    * come from per-doc distinct-shingle counts. Integer threshold. */
  /** Distinct 3-gram shingle hashes per doc: explode the shingle
    * STRINGS first so md5 evaluates in whole-stage codegen (inside a
    * `transform` lambda it runs interpreted, ~10x slower); the final
    * distinct mirrors the oracle's distinct-over-hashes exactly even
    * under (improbable) hash collisions. */
  def shingleHashes(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", dedupe: Boolean = true): DataFrame = {
    // posexplode + lead windows: every step (split, explode, lead,
    // concat, md5) is codegen'd; the alternative — building shingle
    // strings inside a transform() lambda — evaluates interpreted per
    // element. The per-doc window sort rides the same shuffle the
    // downstream per-doc aggregate needs anyway. (Measured at sf0.1:
    // the lambda build is ~3x slower wall-clock on the fingerprint and
    // minhash pipelines even though it avoids this shuffle — the
    // interpreted per-element cost dominates. Don't switch back.)
    //
    // `dedupe = false` skips the distinct exchange for consumers whose
    // aggregate is multiset-invariant (MIN for fingerprints): the
    // window already hash-partitioned by id, so a following
    // groupBy("id") is exchange-free.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("pos")
    val hashes = docs.select(col(idCol).as("id"),
        posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("id"),
        Text.hash60(concat_ws(" ", col("tok"), col("t1"), col("t2")),
          Some(docs.sparkSession)).as("sh"))
    if (dedupe) hashes.distinct() else hashes
  }

  /** Document fingerprints, bulk form (same math as
    * [[Text.fingerprint]] but explode-then-hash, codegen-friendly):
    * (id, fp) where fp = min shingle hash, or hash of the whole text
    * for docs under 3 tokens. */
  def fingerprints(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val n = Text.tokenCount(col(textCol))
    // min over the shingle SET equals min over the multiset, so the
    // distinct exchange is skipped: the only shuffle is the per-doc
    // window sort, and the MIN aggregate reuses its partitioning.
    val long = shingleHashes(docs.filter(n >= 3), textCol, idCol, dedupe = false)
      .groupBy("id").agg(min("sh").as("fp"))
    val short = docs.filter(n < 3)
      .select(col(idCol).as("id"),
        Text.hash60(lower(col(textCol)), Some(docs.sparkSession)).as("fp"))
    long.unionByName(short)
  }

  /** Line-level dedup (boilerplate removal): segment each document
    * into fixed non-overlapping `chunkTokens`-token "lines" and report
    * every line occurring more than once across the corpus, with its
    * occurrence count and canonical (minimum) doc id — the rows a
    * boilerplate-strip pass would drop.
    *
    * Chunking rides the shared row-local gram pipeline
    * ([[gramDigests]] with stride = n: non-overlapping windows) —
    * no shuffle before the digest aggregate, and only
    * (chunk-string-hash) pairs ever shuffle. */
  def lineDedup(docs: DataFrame, chunkTokens: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // stride == n: non-overlapping chunks of the shared gram pipeline
    gramDigests(docs, chunkTokens, stride = chunkTokens, textCol, idCol)
      .groupBy("key")
      .agg(count(lit(1)).as("copies"), min("id").as("canonical"))
      .filter(col("copies") > 1)

  /** Boilerplate detection — [[lineDedup]]'s per-GROUP twin: chunks
    * whose distinct-document frequency within one group (domain /
    * source / template family) reaches `minDf` are boilerplate
    * (headers, footers, navigation), to be stripped rather than
    * deduped. The distinction matters: a chunk repeated across the
    * whole corpus is a clone signal (d5), one repeated across a
    * single source's documents is the source's template.
    *
    * Same digest pipeline (chunk text never shuffles — 32-hex keys
    * do); the group label joins in from the corpus's (id, group) dim
    * and the count is DISTINCT docs, so in-document repetition can't
    * promote a chunk to boilerplate. */
  def boilerplateChunks(docs: DataFrame, chunkTokens: Int = 8,
      minDf: Int = 2, textCol: String = "text", idCol: String = "doc_id",
      groupCol: String = "source"): DataFrame = {
    val dim = docs.select(col(idCol).as("id"), col(groupCol))
    gramDigests(docs, chunkTokens, stride = chunkTokens, textCol, idCol)
      .join(dim, "id")
      .groupBy(col(groupCol), col("key"))
      .agg(countDistinct(col("id")).as("df"), min("id").as("canonical"))
      .filter(col("df") >= minDf)
  }

  /** The gram pipeline shared by [[lineDedup]] (stride = n chunks),
    * [[slidingGramHashes]] (stride 1), and [[substringSpans]]
    * (stride 1, positions kept). ROW-LOCAL (round 18): explode the
    * gram-start position sequence (the stride is its step) and build
    * each gram by element_at off the document's token array — every
    * step (split, sequence, explode, element_at, concat, md5) is
    * codegen'd and the array is never copied per gram row (pruned in
    * the same stage). The old posexplode + (n-1) lead-window form
    * paid a per-doc window sort that shuffled EVERY TOKEN ROW of the
    * corpus before a single digest existed (guide §2.4 "remove
    * shuffles outright") — and unlike [[shingleHashes]]' window
    * (whose id-shuffle the minhash aggregate reuses), no gram
    * consumer reuses id-partitioning: they all reshuffle by digest.
    * The md5-per-gram dominates compute either way, so sf0.1 is
    * flat-to-better (grams build 1.6 -> 0.9 s cold, parity
    * exceptAll 0/0 — plans/r18/kp4_gram_stage_evidence.txt); the
    * removed shuffle is the part that grew with corpus size.
    * Output is exactly the old (id, pos, key) row set: pos ranges
    * over multiples of `stride` up to size-n, 0-based. NOT distinct:
    * callers choose (lineDedup counts copies; decontamination
    * distincts). */
  private[graft] def gramDigests(docs: DataFrame, n: Int, stride: Int,
      textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("id"), col("toks"), explode(
        sequence(lit(0), size(col("toks")) - n, lit(stride))).as("pos"))
      .select(col("id"), col("pos"), md5(concat_ws(" ",
        (0 until n).map(j => element_at(col("toks"), col("pos") + j + 1)): _*))
        .as("key"))

  /** Exact-substring dedup spans (the Lee et al. 2022 "Deduplicating
    * Training Data" pass, re-expressed relationally): for every
    * document, the maximal token spans every position of which starts
    * an n-token gram that occurs AT LEAST TWICE in the corpus —
    * including a second time in the same document, matching the
    * suffix-array formulation (any repeated substring is a dup, not
    * just cross-document ones). Downstream consumers cut or count
    * these spans.
    *
    * The suffix-array machinery dissolves into two shuffles:
    *  1. duplicate marking — a COUNT window keyed on the gram digest
    *     (one shuffle on the 32-hex key; no self-join, and map-side
    *     the digest rows are all that move, never gram text);
    *  2. span assembly — per-document gaps-and-islands: overlapping
    *     hit windows (consecutive start positions) merge via a
    *     running gap-count, then one aggregate per island (one
    *     shuffle on doc id, which also serves the final window).
    * Output: (doc_id, span_id, start_pos, end_pos, n_tok), positions
    * 0-based token indices, end inclusive. */
  def substringSpans(docs: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy("key")
    val wd = Window.partitionBy("id").orderBy("pos")
    val hits = gramDigests(docs, n, stride = 1, textCol, idCol)
      .withColumn("copies", count(lit(1)).over(wk))
      .filter(col("copies") >= 2)
    val islands = hits
      .withColumn("gap",
        when(col("pos") - lag("pos", 1).over(wd) === 1, 0).otherwise(1))
      .withColumn("island", sum("gap").over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("island"))
      .agg(min("pos").as("start_pos"),
        (max("pos") + (n - 1)).as("end_pos"))
    islands
      .withColumn("span_id", row_number().over(
        Window.partitionBy("id").orderBy("start_pos")))
      .select(col("id").as(idCol), col("span_id"),
        col("start_pos").cast("long"), col("end_pos").cast("long"),
        (col("end_pos") - col("start_pos") + 1).cast("long").as("n_tok"))
  }

  /** Distinct sliding n-token-gram digests per document — the
    * stride-1 instantiation of the shared gram pipeline (see
    * [[lineDedup]] for the stride-n chunk form). */
  def slidingGramHashes(docs: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    gramDigests(docs, n, stride = 1, textCol, idCol)
      .select("id", "key").distinct()

  /** Benchmark decontamination: which EVAL documents share at least
    * one sliding n-token gram with ANY train document, and how many
    * distinct grams hit. The standard pre-training hygiene check (an
    * eval answer memorized verbatim in the corpus shows up as long
    * n-gram overlap; n=8..13 is the usual window).
    *
    * Scale: both sides reduce to distinct (id, digest) pairs; the
    * train side further collapses to a distinct digest set, and the
    * join is a plain hash equi-join on the digest — shuffle carries
    * 32-hex keys only. At extreme train sizes, prefilter the eval
    * side with [[graft.operators.BloomJoin]] over the train digests
    * (same exactness argument: bloom pass, exact join after). */
  def contamination(train: DataFrame, evalDocs: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // gramDigests directly: the train side only needs the distinct
    // DIGEST set, so slidingGramHashes' per-(id, key) distinct was a
    // second full shuffle of the train grams for nothing (round 18)
    val trainKeys = gramDigests(train, n, stride = 1, textCol, idCol)
      .select("key").distinct()
    slidingGramHashes(evalDocs, n, textCol, idCol)
      .join(trainKeys, "key")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("hit_grams"))
  }

  /** Exact n-gram-Jaccard near-dup: pairs with Jaccard >= num/den,
    * via inverted-index equi-join + per-pair overlap count, with the
    * LENGTH FILTER embedded in the join (J >= t implies
    * den·min(na,nb) >= num·max(na,nb), since inter <= min and
    * union >= max — size-mismatched pairs never leave the join).
    * Per-doc profile sizes ride the join rows and `first()` through
    * the pair aggregation, so no size-table joins afterwards.
    *
    * Scale analysis (measured on the sf0.1→sf1 rehearsal,
    * COVERAGE.md): join volume is Σ df(sh)², so cost tracks the
    * squared posting lists — and on a near-dup-heavy corpus the
    * OUTPUT grows the same way (10 copies/doc → 25 pairs became
    * 250,600: every within-family pair is a true result). The
    * AllPairs/PPJoin prefix-filter family was implemented and
    * benchmarked here and REJECTED for this operator: with a fixed
    * shingle vocabulary (df̄ ≈ 75) the df-ordered prefix index only
    * shed 2.9× of the join (48M vs 138M rows) while the exact verify
    * had to shuffle two full profiles per surviving candidate (~36 GB
    * at sf1) — strictly worse than counting overlap on the equi-join
    * the shuffle already pays for. A vectorized single-node engine
    * (DuckDB) runs the same full-join plan in comparable wall time,
    * i.e. the equi-join+count IS the right exact plan; sub-quadratic
    * behavior comes from semantics, not plan shape:
    * `maxPostingList` (below) for boilerplate-dominated corpora, or
    * [[minhashNearDup]] as the approximate path at corpus scale.
    *
    * `maxPostingList` is the skew guard for the inverted index: a
    * shingle occurring in k documents contributes k² join rows, so a
    * boilerplate shingle shared by millions would dominate the
    * shuffle. When set, shingles with document frequency above the
    * cap are removed from BOTH the index and the per-doc sizes —
    * the result is then the exact Jaccard over each document's
    * RARE-shingle profile (stop-shingle removal), a well-defined
    * approximation of full-profile Jaccard. None = exact. */
  def ngramJaccardNearDup(docs: DataFrame, num: Int = 1, den: Int = 2,
      textCol: String = "text", idCol: String = "doc_id",
      maxPostingList: Option[Int] = None): DataFrame = {
    // capped profile sizes attach by a join against the tiny per-doc
    // size aggregate (one row per doc): AQE broadcasts it while it
    // fits and falls back to a shuffle join at corpus scale — cheaper
    // at BOTH ends than an always-shuffling id window. Persisted:
    // both join sides consume the same shingle pipeline.
    val capped =
      capGroupSize(shingleHashes(docs, textCol, idCol), Seq("sh"), maxPostingList)
    val sizes = capped.groupBy("id").agg(count(lit(1)).as("nsh"))
    // persisted: both self-join sides consume the same shingle
    // pipeline; the bounded pair output checkpoints eagerly so the
    // cache is released before returning
    val shingles = capped.join(sizes, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val x = shingles.as("x"); val y = shingles.as("y")
    val out = x.join(y, col("x.sh") === col("y.sh") && col("x.id") < col("y.id") &&
        col("x.nsh") * den >= col("y.nsh") * num &&
        col("y.nsh") * den >= col("x.nsh") * num)
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"),
        first(col("x.nsh")).as("na"), first(col("y.nsh")).as("nb"))
      .filter(col("inter") * den >= (col("na") + col("nb") - col("inter")) * num)
      .select(col("a"), col("b"))
    val ck = ckptPairs(out)
    shingles.unpersist()
    ck
  }

  /** Asymmetric containment near-dup: pairs where the SMALLER
    * document's shingle profile is ≥ thresholdPm/1000 contained in
    * the other's — `C = |A∩B| / min(|A|, |B|)`. This is the web-scrape
    * case Jaccard structurally misses: a page embedded verbatim in a
    * boilerplate wrapper has tiny J (union ≈ the wrapper) but
    * containment ≈ 1 (cf. Broder 1997's resemblance vs containment).
    *
    * Same inverted-index equi-join + overlap count as
    * [[ngramJaccardNearDup]], with two deliberate differences:
    * containment admits NO symmetric length filter (size-mismatched
    * pairs are exactly the signal), so the join carries no size
    * pruning — `maxPostingList` (stop-shingle removal) is the skew
    * guard that matters; and the emitted score is an integer permille
    * (`1000·inter div min`), engine-exact. Output (a, b, cont_pm). */
  def containmentPairs(docs: DataFrame, thresholdPm: Int = 800,
      textCol: String = "text", idCol: String = "doc_id",
      maxPostingList: Option[Int] = None): DataFrame = {
    val capped =
      capGroupSize(shingleHashes(docs, textCol, idCol), Seq("sh"), maxPostingList)
    val sizes = capped.groupBy("id").agg(count(lit(1)).as("nsh"))
    // same cache lifecycle as [[ngramJaccardNearDup]]: persist feeds
    // both self-join sides once, eager-checkpoint the bounded pairs,
    // release the cache before returning
    val shingles = capped.join(sizes, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val x = shingles.as("x"); val y = shingles.as("y")
    val out = x.join(y, col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"),
        first(col("x.nsh")).as("na"), first(col("y.nsh")).as("nb"))
      .select(col("a"), col("b"),
        expr("(1000 * inter) div least(na, nb)").as("cont_pm"))
      .filter(col("cont_pm") >= thresholdPm)
    val ck = ckptPairs(out)
    shingles.unpersist()
    ck
  }
}
