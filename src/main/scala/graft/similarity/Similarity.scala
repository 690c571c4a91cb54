package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Scale posture (100 TB):
  *  - brute-force top-k broadcasts the (small) query set and computes
  *    dot products in a single codegen'd pass over the corpus — the
  *    corpus never shuffles; per-query top-k is a
  *    TakeOrderedAndProject-style window over q partitions;
  *  - the LSH path buckets vectors by random-hyperplane sign bits so
  *    candidate joins stay within buckets (n^2 -> n^2 / 2^p expected);
  *    hyperplanes are derived from md5 ([[Text.hash60]]) so bucketing
  *    is deterministic and engine-reproducible;
  *  - all externally-compared outputs are INTEGERS (ids, ranks,
  *    buckets); cosine floats stay internal so cross-engine float
  *    noise can't flip a verified result (thresholds sit in measured
  *    gaps of the data distribution).
  */
object Similarity {

  /** Cosine similarity between two array<double> columns: ordered
    * left-to-right summation (deterministic per engine). Zero-norm
    * vectors yield NULL — cosine is undefined there, NULL sorts last
    * in the rankers' desc ordering and fails every `>= threshold`
    * filter, and it matches BOTH the native expression and DuckDB's
    * double division (the oracle engine nulls 0/0; Spark's ANSI
    * Divide would THROW instead, and the pre-guard raw division made
    * the fallback path crash on padding vectors while the native path
    * silently returned NaN, which sorts ABOVE everything). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = aggregate(a, lit(0.0), (acc, x) => acc + x * x)
    val nb = aggregate(b, lit(0.0), (acc, x) => acc + x * x)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Cosine column: the native codegen'd `cosine_sim` expression when
    * [[graft.plans.GraftExtensions]] is installed, else the HOF
    * formulation. Bit-identical results (same index-ordered double
    * accumulation). */
  private def cosineCol(df: DataFrame, a: Column, b: Column): Column =
    if (df.sparkSession.catalog.functionExists("cosine_sim"))
      call_function("cosine_sim", a, b)
    else cosine(a, b)

  /** Brute-force ANN: for each query vector, the top-k nearest
    * corpus vectors by cosine (excluding self), rank ties broken by
    * neighbor id. Output: (query_id, rank, neighbor) — integers. */
  def annBruteForce(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosineCol(corpus, col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** Cosine near-dup: all pairs (a < b) with cosine >= threshold —
    * the EXACT small-scale form (golden sets, spot audits). All-pairs
    * is quadratic by design; the scale paths are
    * [[hyperplaneBuckets]]/[[annLsh]] (approximate, blocked)
    * and [[semanticDedup]] (IVF-cell blocked). To make it impossible
    * to point this at a real corpus by accident, a plan-level
    * row-count assertion (1-row aggregate broadcast into the left
    * side — no extra driver action, fails at execution time) caps the
    * input at `maxRows`. */
  def cosineNearDup(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxRows: Long = 20000L): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val guard = v.agg(count(lit(1)).as("_n"))
      .filter(assert_true(col("_n") <= maxRows,
        lit(s"cosineNearDup is all-pairs O(n^2); input exceeds " +
          s"maxRows=$maxRows — use the blocked forms (v3/v4/d9) at " +
          "scale, or raise the cap deliberately")).isNull)
      .select(lit(1).as("_guard"))
    val x = v.crossJoin(broadcast(guard))
      .select(col("id").as("a"), col("v").as("va"))
    val y = v.select(col("id").as("b"), col("v").as("vb"))
    x.join(y, col("a") < col("b"))
      .filter(cosineCol(corpus, col("va"), col("vb")) >= threshold)
      .select(col("a"), col("b"))
  }

  /** LSH bucket id per vector: p sign bits of hyperplane dot products.
    * bucket = sum over p of (dot(v, w_p) >= 0) << p.
    *
    * Plane components are ROW-INDEPENDENT, so they are precomputed
    * driver-side ([[Text.hash60Literal]] is bit-identical to the
    * hash60 expression — bucket ids are unchanged). The per-row work
    * is the native [[graft.plans.HyperplaneBucket]] expression when
    * the extensions are installed — ONE Catalyst node with a fused
    * codegen loop. The unrolled composable fallback is bit-identical
    * but its planes x maxDim term tree (512 nodes at 8x64) costs
    * ~0.5 s of analyzer/optimizer time per query, which dominated
    * the v4 bench (data executes in microseconds at any dim); both
    * paths fail loud on vectors longer than `maxDim` (the native
    * expression throws, the fallback embeds an assert_true). */
  private def bucketCol(df: DataFrame, vec: Column, planes: Int,
      maxDim: Int): Column =
    if (df.sparkSession.catalog.functionExists("hyperplane_bucket"))
      call_function("hyperplane_bucket", vec, lit(planes), lit(maxDim))
    else {
      val w = graft.plans.HyperplaneBucket.weights(planes, maxDim)
      val bits = (0 until planes).map { p =>
        val dot = (0 until maxDim).map { j =>
          coalesce(try_element_at(vec, lit(j + 1)) * lit(w(p * maxDim + j)),
            lit(0.0))
        }.reduce(_ + _)
        when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
      }
      when(assert_true(size(vec) <= maxDim,
        lit(s"hyperplaneBuckets: vector dim exceeds maxDim=$maxDim")).isNull,
        bits.reduce(_ + _))
    }

  /** (id, bucket) per corpus vector — see [[bucketCol]]. */
  def hyperplaneBuckets(corpus: DataFrame, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxDim: Int = 64): DataFrame = {
    val v = asDouble(col(vecCol))
    corpus.select(col(idCol).as("id"),
      bucketCol(corpus, v, planes, maxDim).as("bucket"))
  }

  /** K-means training for IVF cells: deterministic id-stride init
    * (the same seeding [[annIvf]] uses untrained), then `iters`
    * Lloyd steps — assign every vector to its nearest centroid
    * (broadcast centroids, one codegen'd corpus pass) and recompute
    * each cell's mean with the [[VectorMean]] custom aggregate
    * (map-side partial buffers; vectors never shuffle). Returns
    * (cid, cv) centroids ready to pass into an IVF search.
    * Empty cells drop out (standard Lloyd behavior). */
  def kmeansCentroids(corpus: DataFrame, stride: Int = 43, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecMean = udaf(VectorMean)
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // rank-based cap on the stride init, same guard as pqCodebook /
    // ivf cells: an UNCAPPED n/stride init makes every Lloyd pass
    // O(n^2/stride) (233k broadcast centroids on a 10M corpus) —
    // binding only above stride*maxCentroids (~176k) vectors, so
    // every tested scale is byte-identical
    var cents = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol)).limit(maxCentroids)
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    val wAssign = Window.partitionBy("id").orderBy(col("c").desc, col("cid").asc)
    (1 to iters).foreach { _ =>
      val assigned = v.crossJoin(broadcast(cents))
        .select(col("id"), col("v"), col("cid"),
          cosineCol(corpus, col("v"), col("cv")).as("c"))
        .withColumn("r", row_number().over(wAssign))
        .filter(col("r") === 1)
      cents = assigned.groupBy("cid").agg(vecMean(col("v")).as("cv"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }
    cents
  }

  /** [[annIvf]] against TRAINED cells: k-means centroids replace the
    * id-stride sample, everything else identical. */
  def annIvfTrained(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int = 5, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    annIvfWith(corpus, queries, centroids, k, nprobe, idCol, vecCol)

  /** IVF-style ANN (inverted-file index): the corpus is partitioned
    * into cells around a small centroid set; a query probes only its
    * `nprobe` nearest cells. Centroids here are a deterministic
    * id-stride sample of the corpus (production would k-means them —
    * the index/search dataflow is identical and that's what scales):
    *  - assignment is one codegen'd pass over the corpus against the
    *    BROADCAST centroid set (the corpus never shuffles to index);
    *  - search touches only the probed cells' posting lists, so the
    *    scored candidate set is |corpus| * nprobe / #cells in
    *    expectation instead of |corpus| per query.
    * Same output contract as [[annBruteForce]]; recall < 1 by
    * construction (the standard IVF trade-off, tuned via nprobe). */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nprobe: Int = 2, centroidStride: Int = 43,
      maxCells: Int = Int.MaxValue, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // maxCells caps the centroid set independently of corpus size —
    // without it the stride sample grows the cell count with the
    // corpus and the assignment pass goes O(n²/stride) (the same
    // quadratic the sf1 rehearsal caught in the PQ codebook; see
    // [[pqCodebook]] and the capped-everything [[annIvfPq]]). The cap
    // is RANK-based (first maxCells sampled ids via a distributed
    // top-k, not an id-value bound), so it yields exactly maxCells
    // centroids on sparse or offset id spaces too. Default
    // Int.MaxValue preserves the oracle-gated stride semantics.
    annIvfWith(corpus, queries,
      ivfCentroids(corpus, centroidStride, maxCells, idCol, vecCol),
      k, nprobe, idCol, vecCol)
  }

  /** [[annIvf]] with a metadata predicate pushed INTO the cell-blocked
    * search — the production shape of filtered vector search: ONE
    * index (the centroid set, built from the FULL corpus) serves
    * every filter, while the posting lists are built from the
    * filtered corpus, so the predicate reaches the parquet scan as a
    * pushed filter and the probe scores matching vectors only —
    * filter-before/within-cells, never filter-after-top-k (which
    * silently returns < k; v16 pins that contrast on the brute-force
    * path). Equivalent to filtering before assignment, because cell
    * assignment is per-vector: rank-1-nearest-centroid commutes with
    * any row predicate. Recall caveats are [[annIvf]]'s, plus the
    * usual filtered-ANN one: a highly selective predicate empties
    * probed cells (raise nprobe — the knob is per-query, the index
    * unchanged). */
  def annIvfFiltered(corpus: DataFrame, queries: DataFrame,
      pred: Column, k: Int = 5, nprobe: Int = 2,
      centroidStride: Int = 43, maxCells: Int = Int.MaxValue,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    annIvfWith(corpus.filter(pred), queries,
      ivfCentroids(corpus, centroidStride, maxCells, idCol, vecCol),
      k, nprobe, idCol, vecCol)

  /** [[annIvfFiltered]] against an EXPLICIT centroid set — the
    * trained-index form of filtered vector search: the SAME trained
    * centroids serve the unfiltered search ([[annIvfTrained]]), the
    * cluster assignments ([[kmeansAssignments]]' codebook) and every
    * filtered query, while the posting lists are rebuilt from the
    * filtered corpus so the predicate reaches the parquet scan
    * (plan-pinned in PlanShapeSpec). Production never retrains per
    * filter — one index, many predicates; this overload is that
    * contract. */
  def annIvfFilteredTrained(corpus: DataFrame, queries: DataFrame,
      pred: Column, centroids: DataFrame, k: Int = 5, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    annIvfWith(corpus.filter(pred), queries, centroids, k, nprobe,
      idCol, vecCol)

  /** Trained IVF cells in cosine (double) space, derived from the
    * ENGINE-EXACT integer k-means ([[pqCodebookTrained]] with m = 1
    * over the whole vector — the same training loop v11's
    * [[kmeansAssignments]] runs): integer Lloyd keeps every training
    * step oracle-checkable (a floating-point mean's summation order
    * perturbs centroids across engines), and the dequantization back
    * to doubles — (q − 2²¹) / 10⁶, small exact longs through one IEEE
    * divide, identical in any engine — yields the (cid, cv) set the
    * IVF searches accept. ONE trained index therefore serves the
    * cluster-assignment row (v11), unfiltered trained search, and
    * every filtered search (v16c). */
  def trainedIvfCentroids(corpus: DataFrame, dim: Int = 64,
      stride: Int = 31, k: Int = 8, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqCodebookTrained(corpus, m = 1, subDim = dim, stride, k, iters,
        idCol, vecCol)
      .select(col("cw").as("cid"),
        transform(col("cv"),
          q => (q - lit(1L << 21)).cast("double") / lit(1000000.0)).as("cv"))

  /** The IVF centroid sample [[annIvf]] indexes with, exposed so the
    * size-independence invariant (exactly `maxCells` centroids no
    * matter how large — or how sparse/offset-keyed — the corpus is)
    * is testable without running a search; Sf1RegressionSpec gates
    * it in `sbt test`. */
  def ivfCentroids(corpus: DataFrame, centroidStride: Int = 43,
      maxCells: Int = Int.MaxValue, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val sampled = corpus.filter(pmod(col(idCol), lit(centroidStride)) === 0)
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    if (maxCells == Int.MaxValue) sampled
    else sampled.orderBy("cid").limit(maxCells)
  }

  /** Shared IVF search over an explicit (cid, cv) centroid set. */
  private def annIvfWith(corpus: DataFrame, queries: DataFrame,
      cents: DataFrame, k: Int, nprobe: Int, idCol: String,
      vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // index build: one codegen'd pass of corpus x broadcast centroids,
    // rank-1 cell per vector. The rank<=1 filter triggers Spark's
    // WindowGroupLimit rewrite, which runs a PARTIAL per-partition
    // top-1 BELOW the exchange — so the n x k candidate rows collapse
    // to ~n before shuffling (measured faster than the equivalent
    // min_by hash aggregate, whose array-key hashing costs more than
    // the group-limit's streaming comparison)
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val wAssign = Window.partitionBy("id").orderBy(col("c").desc, col("cid").asc)
    val assign = v.crossJoin(broadcast(cents))
      .select(col("id"), col("cid"),
        cosineCol(corpus, col("v"), col("cv")).as("c"))
      .withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1)
      .select(col("id").as("nid"), col("cid"))
    // probe lists: the QUERY set's own vectors against the same
    // centroids (queries need not be corpus members); both sides of
    // this product are small, and the probe table — (qid, cid, qv) x
    // nprobe — is what broadcasts into the cell join
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy("qid").orderBy(col("c").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cid"),
        cosineCol(corpus, col("qv"), col("cv")).as("c"))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    // search: only the probed cells' posting lists are scored
    val cands = assign.join(broadcast(probes), "cid")
      .filter(col("nid") =!= col("qid"))
      .join(corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv")), "nid")
      .select(col("qid"), col("nid"),
        cosineCol(corpus, col("qv"), col("nv")).as("cos"))
      // a vector can reach a query through only one cell (assignment is
      // rank-1 unique), so candidates are already distinct
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** Semantic (embedding-space) dedup: the scale path of
    * [[cosineNearDup]]. All-pairs cosine is O(n²) and unshardable;
    * blocking by IVF cell makes it O(Σ cell²) with every stage
    * shuffle-partitioned by cell:
    *  1. assign each vector to its nearest centroid (one codegen'd
    *     pass against the BROADCAST centroid set — same index build as
    *     [[annIvf]]; only thin (id, cid, cos) rows cross the rank-1
    *     window shuffle, vectors rejoin by id afterwards);
    *  2. self-join WITHIN cells only (shuffle on cid; the cell cap is
    *     the skew guard the LSH/simhash paths use);
    *  3. a vector is dropped iff some SMALLER-id vector in its cell is
    *     within `threshold` cosine — greedy keep-first, deterministic.
    * Recall < 1 across cell boundaries (standard blocking trade-off;
    * raise centroid count to shrink cells, or run twice with different
    * strides for higher recall). Output: (id, kept 0/1) for every
    * corpus vector. */
  def semanticDedup(corpus: DataFrame, threshold: Double,
      centroidStride: Int = 43, idCol: String = "vec_id",
      vecCol: String = "embedding", maxCentroids: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rank-based centroid cap (see kmeansCentroids): bounds the
    // assignment crossJoin at maxCentroids*n; not binding below
    // stride*maxCentroids vectors
    val cents = corpus.filter(pmod(col(idCol), lit(centroidStride)) === 0)
      .orderBy(col(idCol)).limit(maxCentroids)
      .select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // rank-1 assignment via window + rank<=1: Spark's WindowGroupLimit
    // rewrite runs a partial per-partition top-1 BELOW the exchange,
    // so carrying the vector through the window costs ~n rows on the
    // shuffle, not n x k (measured faster than both the min_by hash
    // aggregate — array-key hashing — and a thin-assign-then-rejoin)
    val wAssign = Window.partitionBy("id").orderBy(col("c").desc, col("cid").asc)
    val assigned = v.crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("cid"),
        cosineCol(corpus, col("v"), col("cv")).as("c"))
      .withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1)
      .select(col("id"), col("v"), col("cid"))
    // self-join via aliases of the SAME frame: both sides shuffle the
    // identical (cid, id, v) subplan, so the assignment pass and its
    // exchange are computed once and reused (ReusedExchange), not
    // twice as two differently-projected copies would be
    val x = assigned.alias("x"); val y = assigned.alias("y")
    val dropped = x.join(y, col("x.cid") === col("y.cid") &&
        col("x.id") < col("y.id"))
      .filter(cosineCol(corpus, col("x.v"), col("y.v")) >= threshold)
      .select(col("y.id").as("id")).distinct()
    corpus.select(col(idCol).as("id"))
      .join(dropped.withColumn("dropFlag", lit(1)), Seq("id"), "left")
      .select(col("id"),
        when(col("dropFlag").isNotNull, lit(0)).otherwise(lit(1)).as("kept"))
  }

  /** Bucketed ANN: same contract as [[annBruteForce]] but candidates
    * are restricted to the query's hyperplane bucket — the scale path.
    * Recall < 1 by construction; pair with multiple tables for recall
    * (the standard LSH trade-off). */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      planes: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bucket is computed IN the corpus/query projections — no
    // (corpus ⋈ own-buckets) self-joins: the old shape scanned the
    // corpus four times and shuffled it twice for a column that's a
    // pure per-row function of the vector
    val v = asDouble(col(vecCol))
    val c = corpus.select(col(idCol).as("nid"), v.as("nv"),
      bucketCol(corpus, v, planes, 64).as("bucket"))
    // query vectors come from the QUERIES frame itself (same contract
    // as annBruteForce: queries need not be corpus members) — the old
    // corpus-left_semi shape silently dropped out-of-corpus queries
    // and substituted corpus embeddings for same-id queries
    val q = queries.select(col(idCol).as("qid"), v.as("qv"),
      bucketCol(corpus, v, planes, 64).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosineCol(corpus, col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** Int8 scalar quantization: per-vector affine map of each element
    * onto 0..255 (min→0, max→255, floor buckets). 4x smaller vectors
    * for ANN probing; all-double arithmetic with one floor, so codes
    * are engine-exact and integer downstream math stays hash-safe.
    * Constant vectors (max == min) map to all-zero codes. */
  def quantizeInt8(vec: Column): Column = {
    val mn = array_min(vec).cast("double")
    val mx = array_max(vec).cast("double")
    when(mx === mn, transform(vec, _ => lit(0L)))
      .otherwise(transform(vec, x =>
        floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)).cast("long")))
  }

  /** Squared L2 distance between two array<double> columns, scaled to
    * an exact integer: `floor(1e6 * d * d)` where `d` is the Euclidean
    * distance computed as sqrt-of-ordered-sum — the same shape DuckDB's
    * `list_distance` uses, so the double is reproducible cross-engine
    * and the floor makes every downstream SUM order-independent
    * (integer adds commute; double adds don't). */
  def sqDistInt(a: Column, b: Column): Column = {
    val d = sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))
    floor(lit(1000000.0) * d * d).cast("long")
  }

  /** Product-quantization codebooks: the `dim`-wide vector space is
    * split into `m` orthogonal `dim/m`-wide subspaces, and each
    * subspace gets its own codeword set — a deterministic id-stride
    * sample of the corpus restricted to that subspace (production
    * would k-means each subspace exactly like [[kmeansCentroids]];
    * the index/search dataflow is identical).
    *
    * The codebook is CAPPED at `k` codewords per subspace regardless
    * of corpus size — the defining PQ property (k=256 in production,
    * one byte per code). An uncapped stride sample grows the codebook
    * with the corpus and makes encoding O(n²/stride); measured on the
    * sf0.1→sf1 rehearsal that turned a 1.6 s encode into 46 s, while
    * the fixed-k codebook keeps it linear. Output:
    * (m, cw, cv: array<double>) — m·k rows, always broadcast. */
  def pqCodebook(corpus: DataFrame, m: Int = 4, subDim: Int = 16,
      stride: Int = 31, k: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val subs = array((0 until m).map(i =>
      slice(asDouble(col(vecCol)), 1 + subDim * i, subDim)): _*)
    // rank-based cap: the first k sampled ids (distributed top-k, not
    // an id-value bound) — exactly k codewords even when ids are
    // sparse or offset; on dense-from-0 ids this equals the old
    // `id < stride*k` bound
    corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cw"), posexplode(subs).as(Seq("m", "cv")))
      .select(col("m"), col("cw"), col("cv"))
  }

  /** PQ encode: each corpus vector becomes `m` small integer codes —
    * per subspace, the id of its nearest codeword (squared-L2 argmin,
    * ties to the lower codeword id, one `min_by` hash aggregate).
    *
    * THIS is the 100 TB ANN index: an encoded vector is m longs
    * (m bytes in production) instead of dim floats — a 64-dim float
    * corpus compresses 64x, so the search-time scan reads codes, not
    * vectors. Encoding is one pass: subvectors explode (m rows per
    * vector), meet the BROADCAST codebook, and the argmin combines
    * map-side — the corpus never shuffles its raw vectors. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int = 4,
      subDim: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val subs = array((0 until m).map(i =>
      slice(asDouble(col(vecCol)), 1 + subDim * i, subDim)): _*)
    // NOT rewritten to the packed-codebook [[argminCw]] form the
    // integer-space encoders use (round-18): this encode's distance
    // is [[sqDistInt]] — double casts + sqrt + floor per codeword —
    // and evaluating that chain inside the nested interpreted
    // transform measured SLOWER than the SortAggregate it would
    // remove (v8 1.06 s → 1.60/1.74 s in two fresh JVMs; v9 1.16 →
    // 2.15 s). The long-space sites won from the same rewrite
    // because plain zip_with long arithmetic is cheap interpreted.
    corpus.select(col(idCol).as("id"), posexplode(subs).as(Seq("m", "sv")))
      .join(broadcast(codebook), "m")
      .select(col("id"), col("m"),
        struct(sqDistInt(col("sv"), col("cv")).as("d"), col("cw")).as("dc"))
      .groupBy("id", "m")
      .agg(min(col("dc")).as("best"))
      .select(col("id"), col("m"), col("best.cw").as("code"))
  }

  /** ANN via PQ + asymmetric distance computation (ADC): queries stay
    * un-quantized; each query precomputes a tiny distance table —
    * its squared L2 to every codeword in every subspace — and a
    * corpus vector's approximate distance is the SUM over subspaces
    * of the table entry its code points at (the standard IVF-ADC
    * search kernel, cf. Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011).
    *
    * Scale posture: the distance table is |q| * m * |codebook| rows —
    * kilobytes — and BROADCASTS into the code-table scan, so search
    * is one pass over the compressed codes with a map-side-combining
    * (query, neighbor) sum; raw vectors are touched only for the
    * queries. Distances are integers ([[sqDistInt]]) so the
    * cross-subspace sum is engine-exact. Output like
    * [[annBruteForce]]: (query_id, rank, neighbor); recall < 1 by
    * construction (quantization error, tuned via m x codebook size). */
  def annPqAdc(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      m: Int = 4, subDim: Int = 16, stride: Int = 31, codebookK: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = pqCodebook(corpus, m, subDim, stride, codebookK, idCol, vecCol)
    val codes = pqEncode(corpus, cb, m, subDim, idCol, vecCol)
    val subs = array((0 until m).map(i =>
      slice(asDouble(col(vecCol)), 1 + subDim * i, subDim)): _*)
    val dtable = queries
      .select(col(idCol).as("qid"), posexplode(subs).as(Seq("m", "qv")))
      .join(broadcast(cb), "m")
      .select(col("qid"), col("m"), col("cw"),
        sqDistInt(col("qv"), col("cv")).as("d"))
    val adc = codes.join(broadcast(dtable),
        codes("m") === dtable("m") && codes("code") === dtable("cw"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum("d").as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("nid").asc)
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** Integer-quantized per-subspace views of a vector: each of the
    * `m` subvectors maps element-wise through
    * `floor(1e6 * x) + 2^21` — thousandths-of-a-millionth precision,
    * offset so every quantized value is NON-NEGATIVE for |x| ≤ 2
    * (embeddings are unit-scale). Non-negativity is what makes the
    * trained-codebook arithmetic engine-exact: integer sums commute
    * under any shuffle order, and floor-division equals truncating
    * division only when the operands cannot be negative (engines
    * disagree on negative integer division). Distances are
    * translation-invariant, so the offset never shows in a result. */
  private def quantSubs(vecCol: Column, m: Int, subDim: Int): Column =
    array((0 until m).map(i =>
      transform(slice(asDouble(vecCol), 1 + subDim * i, subDim),
        x => (floor(x * 1000000) + lit(1L << 21)).cast("long"))): _*)

  /** Exact integer squared L2 over quantized vectors (plain long
    * arithmetic — no float round-trip, commutes across engines). */
  private def sqDistLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** The m·k codeword table packed to ONE row per subspace:
    * (m, cbs: array<struct<cw, cv>>). Codebooks are capped at k
    * codewords per subspace by construction, so a packed row is
    * kilobytes and always broadcast-safe. */
  private def packCodebook(cb: DataFrame): DataFrame =
    cb.groupBy("m").agg(collect_list(struct(col("cw"), col("cv"))).as("cbs"))

  /** Per-row nearest-codeword argmin against a [[packCodebook]] row —
    * the round-18 rewrite of the encode aggregate. The old shape
    * exploded each subvector against the broadcast codebook (k rows
    * per (id, m)) and took `min(struct(d, cw))` per group; a struct
    * aggregation buffer is not hash-supported, so every encode pass
    * planned as Sort → SortAggregate → Exchange → SortAggregate over
    * the k-times-exploded corpus (the same engine limitation that
    * cost s11 its round-17 rewrite; v10's round-18 before-plan shows
    * two such chains). Computing the argmin INSIDE the projection —
    * `array_min` over the packed codewords with the identical
    * lexicographic (d, cw) ordering, ties to the lower cw — removes
    * the k-way row blowup, both SortAggregates and their Sorts; the
    * per-row work is the same k interpreted distance evaluations the
    * join form paid (zip_with/aggregate never participated in
    * codegen either way). */
  private def argminCw(sv: Column, cbs: Column,
      dist: (Column, Column) => Column): Column =
    array_min(transform(cbs, c =>
      struct(dist(sv, c.getField("cv")).as("d"), c.getField("cw").as("cw"))))

  /** TRAINED PQ codebooks: per-subspace k-means (Lloyd) over the
    * integer-quantized subvectors, replacing [[pqCodebook]]'s raw
    * stride sample with centroids that actually fit the data — same
    * capped-k API, same (m, cw, cv) output contract (cv in quantized
    * integer space; pair with [[annPqAdcTrained]]).
    *
    * Every training step is ENGINE-EXACT integer arithmetic, so the
    * whole training loop is oracle-checkable (floating-point k-means
    * is not: a mean's summation order perturbs centroids):
    *  - init = the first `k` stride-sampled ids (rank-based cap);
    *  - assign = integer squared-L2 argmin, ties to the lower
    *    codeword id;
    *  - update = element-wise integer floor-mean of the members
    *    (sums of non-negative longs; overflow-safe while a cluster
    *    holds < 2^41 members at the 2^22 quantized magnitude).
    * Empty codewords drop out (standard Lloyd). The member re-explode
    * shuffles (m, cw, pos, x) rows — the same volume as reading the
    * vectors once per iteration; `iters` is small by design. */
  def pqCodebookTrained(corpus: DataFrame, m: Int = 4, subDim: Int = 16,
      stride: Int = 31, k: Int = 16, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qsub = corpus.select(col(idCol).as("id"),
      posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "qv")))
    var cb = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("cw"),
        posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "cv")))
      .select(col("m"), col("cw"), col("cv"))
    (1 to iters).foreach { _ =>
      // assignment: one pass of the quantized corpus against the
      // BROADCAST packed codebook — per-row [[argminCw]] (identical
      // deterministic (d, cw) ties), no group aggregate, qv rides
      // along in the same projection
      val assigned = qsub.join(broadcast(packCodebook(cb)), "m")
        .select(col("id"), col("m"), col("qv"),
          argminCw(col("qv"), col("cbs"), sqDistLong).as("best"))
      // update: element-wise integer floor-mean per codeword —
      // map-side-combining long sums, then the tiny (m·k·subDim)
      // position table reassembles into arrays
      val sums = assigned
        .select(col("m"), col("best.cw").as("cw"),
          posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("m", "cw", "pos")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      cb = sums
        .groupBy("m", "cw")
        .agg(sort_array(collect_list(
          struct(col("pos"), expr("sx div n").as("v")))).as("pv"))
        .select(col("m"), col("cw"),
          transform(col("pv"), p => p.getField("v")).as("cv"))
        // truncate the per-iteration lineage (the codebook is m·k
        // rows; re-analyzing a growing plan tree would dominate)
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    }
    cb
  }

  /** [[annPqAdc]] against a TRAINED codebook: identical ADC dataflow
    * (codes scanned, per-query distance tables broadcast), with
    * encode/search distances in the same exact integer space the
    * training ran in. */
  def annPqAdcTrained(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      m: Int = 4, subDim: Int = 16, stride: Int = 31, codebookK: Int = 16,
      iters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = pqCodebookTrained(
      corpus, m, subDim, stride, codebookK, iters, idCol, vecCol)
    val qsub = corpus.select(col(idCol).as("id"),
      posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "sv")))
    val codes = qsub.join(broadcast(packCodebook(cb)), "m")
      .select(col("id"), col("m"),
        argminCw(col("sv"), col("cbs"), sqDistLong).as("best"))
      .select(col("id"), col("m"), col("best.cw").as("code"))
    val dtable = queries.select(col(idCol).as("qid"),
        posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "qv")))
      .join(broadcast(cb), "m")
      .select(col("qid"), col("m"), col("cw"),
        sqDistLong(col("qv"), col("cv")).as("d"))
    val adc = codes.join(broadcast(dtable),
        codes("m") === dtable("m") && codes("code") === dtable("cw"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum("d").as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("nid").asc)
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** Full-vector k-means clustering in exact integer space — the
    * document-clustering / diversity-bucketing operator of an LLM
    * pipeline. This is [[pqCodebookTrained]] with a single subspace
    * covering the whole vector (m=1, subDim=dim): same quantized
    * Lloyd loop (stride init capped at k, argmin assignment with
    * ties to the lower centroid id, element-wise integer floor-mean),
    * then one final assignment pass. Because every step is long
    * arithmetic, the ENTIRE clustering — not just a summary — is
    * oracle-checkable; floating-point k-means is not (the mean's
    * summation order perturbs centroids).
    *
    * Scale posture: centroids are k rows and BROADCAST into each
    * assignment pass (the corpus never shuffles its vectors to
    * cluster); the update's (pos, x) re-explode is the documented
    * iteration cost, `iters` small by design. Returns
    * (id, cluster, dist) — cluster is the centroid's seed vec_id. */
  def kmeansAssignments(corpus: DataFrame, dim: Int = 64,
      stride: Int = 31, k: Int = 8, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = pqCodebookTrained(corpus, m = 1, subDim = dim, stride, k,
      iters, idCol, vecCol)
    corpus.select(col(idCol).as("id"),
        posexplode(quantSubs(col(vecCol), 1, dim)).as(Seq("m", "qv")))
      .join(broadcast(packCodebook(cb)), "m")
      .select(col("id"),
        argminCw(col("qv"), col("cbs"), sqDistLong).as("best"))
      .select(col("id"), col("best.cw").as("cluster"),
        col("best.d").as("dist"))
  }

  /** Cluster-stratified diversity selection: the medoid (member
    * nearest its centroid, ties to the lower id) plus the member
    * count of every [[kmeansAssignments]] cluster — the "one
    * representative per semantic bucket" sampler used to diversify
    * a training mix. One k-row aggregate over the assignments. */
  def diversityMedoids(corpus: DataFrame, dim: Int = 64,
      stride: Int = 31, k: Int = 8, iters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    kmeansAssignments(corpus, dim, stride, k, iters, idCol, vecCol)
      .groupBy("cluster")
      .agg(min(struct(col("dist"), col("id"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("m.id").as("medoid"),
        col("m.dist").as("dist"), col("n_members"))

  /** IVF-PQ search (the FAISS "IVFADC" layout, cf. Jégou et al. 2011
    * §IV — the index structure billion-scale ANN actually deploys):
    * the corpus is partitioned into a FIXED number of IVF cells, and
    * within the inverted lists vectors exist only as their m PQ codes.
    * A query (a) picks its `nprobe` nearest cells by cosine against
    * the broadcast centroid set, and (b) ADC-scores ONLY the probed
    * cells' codes via its broadcast per-subspace distance tables — so
    * search cost is |corpus| · nprobe / cells code lookups, with the
    * raw vectors touched for nothing but the query itself.
    *
    * Both size knobs are capped independently of corpus size (cells
    * and codebook k) — the [[pqCodebook]] rehearsal lesson: any
    * index structure sampled "every Nth vector" silently goes
    * quadratic as the corpus grows. Distances are exact integers
    * ([[sqDistInt]]), ranks deterministic. Output like
    * [[annBruteForce]]; recall trades off via nprobe x quantization
    * error (coarser than [[annIvf]]'s exact in-cell cosine — that is
    * the memory-for-recall deal PQ codes buy). */
  def annIvfPq(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nprobe: Int = 2, cellStride: Int = 43, cells: Int = 32,
      m: Int = 4, subDim: Int = 16, cbStride: Int = 31, cbK: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = asDouble(col(vecCol))
    // rank-based cell cap, same rationale as [[pqCodebook]]'s k cap
    val cents = corpus
      .filter(pmod(col(idCol), lit(cellStride)) === 0)
      .orderBy(col(idCol)).limit(cells)
      .select(col(idCol).as("cid"), v.as("cv"))
    // one codegen'd pass: every vector scored against the broadcast
    // centroids; rk=1 rows are the cell assignment, rk<=nprobe rows of
    // the query subset are the probe list
    val scored = corpus.select(col(idCol).as("id"), v.as("xv"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("cid"),
        cosineCol(corpus, col("xv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("cos").desc, col("cid").asc)))
    val assign = scored.filter(col("rk") === 1).select(col("id"), col("cid"))
    // probe list from the QUERY vectors themselves (one extra tiny
    // broadcast pass) — reusing the corpus `scored` rows silently
    // dropped out-of-corpus queries, unlike annPqAdc/annIvfWith; for
    // corpus-member queries the vectors are identical so the probe
    // set (and every oracle-gated result) is unchanged
    val probes = queries.select(col(idCol).as("qid"), v.as("qxv"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("cid"),
        cosineCol(corpus, col("qxv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rk") <= nprobe).select(col("qid"), col("cid"))
    val cb = pqCodebook(corpus, m, subDim, cbStride, cbK, idCol, vecCol)
    val codes = pqEncode(corpus, cb, m, subDim, idCol, vecCol)
      .join(assign, "id")
    val subs = array((0 until m).map(i =>
      slice(asDouble(col(vecCol)), 1 + subDim * i, subDim)): _*)
    val dtable = queries
      .select(col(idCol).as("qid"), posexplode(subs).as(Seq("m", "qv")))
      .join(broadcast(cb), "m")
      .select(col("qid"), col("m"), col("cw"),
        sqDistInt(col("qv"), col("cv")).as("d"))
    val probed = codes
      .join(broadcast(probes.withColumnRenamed("qid", "pqid")), "cid")
      .filter(col("id") =!= col("pqid"))
    val adc = probed.join(broadcast(dtable),
        probed("m") === dtable("m") && probed("code") === dtable("cw") &&
          probed("pqid") === dtable("qid"))
      .select(col("pqid"), col("id").as("nid"), col("d"))
      .groupBy("pqid", "nid")
      .agg(sum("d").as("adc"))
    adc.withColumn("rank", row_number().over(
        Window.partitionBy("pqid").orderBy(col("adc").asc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select(col("pqid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** Filtered IVF-PQ search against EXPLICIT trained artifacts — the
    * billion-scale form of filtered vector search, closing the ladder
    * v16c opened for the plain-IVF index: [[annIvfPq]]'s layout
    * (probe-limited cells + PQ codes + broadcast ADC tables) with
    * [[annIvfFilteredTrained]]'s contract (ONE trained index — the
    * coarse centroids AND the PQ codebook — serves every predicate;
    * only the posting lists rebuild filtered).
    *
    * `centroids` is a (cid, cv: array<double>) cosine-space set
    * ([[trainedIvfCentroids]] — the same index v11/v16c share);
    * `codebook` is a (m, cw, cv: array<long>) integer-space trained
    * codebook ([[pqCodebookTrained]] — the same training v10 runs).
    *
    * Filter placement: the predicate applies to the POSTING-LIST
    * builds (cell assignment + PQ encode), both per-vector functions
    * that commute with any row predicate — so it reaches the parquet
    * scan as a pushed filter (plan-pinned) and the ADC pass scores
    * only matching entries. Never filter-after-top-k. Recall caveats:
    * [[annIvfPq]]'s (quantization error x nprobe) plus filtered-ANN's
    * (a selective predicate empties probed cells — raise nprobe; the
    * index is unchanged). */
  def annIvfPqFilteredTrained(corpus: DataFrame, queries: DataFrame,
      pred: Column, centroids: DataFrame, codebook: DataFrame,
      k: Int = 5, nprobe: Int = 2, m: Int = 4, subDim: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val matching = corpus.filter(pred)
    val v = asDouble(col(vecCol))
    // posting lists from the FILTERED corpus: one codegen'd pass per
    // build against the broadcast trained artifacts; the pred is a
    // scan-side pushed filter on both
    val assign = matching.select(col(idCol).as("id"), v.as("xv"))
      .crossJoin(broadcast(centroids))
      .select(col("id"), col("cid"),
        cosineCol(corpus, col("xv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rk") === 1).select(col("id"), col("cid"))
    val codes = matching.select(col(idCol).as("id"),
        posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "sv")))
      .join(broadcast(packCodebook(codebook)), "m")
      .select(col("id"), col("m"),
        argminCw(col("sv"), col("cbs"), sqDistLong).as("best"))
      .select(col("id"), col("m"), col("best.cw").as("code"))
      .join(assign, "id")
    // probes + ADC tables from the QUERY vectors (tiny, broadcast)
    val probes = queries.select(col(idCol).as("qid"), v.as("qxv"))
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("cid"),
        cosineCol(corpus, col("qxv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rk") <= nprobe).select(col("qid"), col("cid"))
    val dtable = queries.select(col(idCol).as("qid"),
        posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "qv")))
      .join(broadcast(codebook), "m")
      .select(col("qid"), col("m"), col("cw"),
        sqDistLong(col("qv"), col("cv")).as("d"))
    // search: only the probed cells' FILTERED posting entries score
    val probed = codes
      .join(broadcast(probes.withColumnRenamed("qid", "pqid")), "cid")
      .filter(col("id") =!= col("pqid"))
    val adc = probed.join(broadcast(dtable),
        probed("m") === dtable("m") && probed("code") === dtable("cw") &&
          probed("pqid") === dtable("qid"))
      .select(col("pqid"), col("id").as("nid"), col("d"))
      .groupBy("pqid", "nid")
      .agg(sum("d").as("adc"))
    adc.withColumn("rank", row_number().over(
        Window.partitionBy("pqid").orderBy(col("adc").asc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select(col("pqid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** In-JVM emulation of a durable index location for
    * [[ivfPqIndexTable]] callers that don't name one — same contract
    * as `Dedup.clustersTable`'s plan-keyed cache: the first caller
    * per (canonicalized corpus plan, parameters) trains and writes,
    * every later call in the JVM serves the files. */
  private val ivfPqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** PERSISTED IVF-PQ index — the deployment shape of [[annIvfPq]]:
    * a production corpus generation trains the index ONCE (coarse
    * centroids + PQ codebook + the full-corpus posting lists) and
    * writes it as three curated parquet tables; every search — any
    * predicate, any session, any JVM — reads the files and never
    * re-trains or re-encodes. This closes the last gap between the
    * v17 search (which re-encodes the filtered corpus per call) and
    * what a 100 TB serving path actually does: encode is a full
    * corpus pass, so it must be paid per corpus generation, not per
    * query predicate.
    *
    * Layout under `indexPath` (any Hadoop filesystem):
    *   centroids/  (cid, cv: array<double>)   [[trainedIvfCentroids]]
    *   codebook/   (m, cw, cv: array<long>)   [[pqCodebookTrained]]
    *   postings/   (id, m, code, cid)         full-corpus cell + codes
    * plus `_graft_params.json` (the parameter sidecar) and
    * `_GRAFT_INDEX_SUCCESS` (the whole-index commit marker: the three
    * per-table `_SUCCESS` files can't arbitrate a writer that died
    * between tables). Same durability contract as
    * `Dedup.clustersTable`: a committed index is served as-is —
    * mismatched parameters fail fast rather than silently searching
    * someone else's geometry — and a torn one (no marker) rebuilds in
    * place; one driver owns a given path (single-writer, as for any
    * curated output directory).
    *
    * With `indexPath = None` the index lands in a swept temp dir
    * keyed by (canonicalized corpus plan, params) — the in-session
    * emulation of the curated table, byte-stable across consumers.
    *
    * Returns (centroids, codebook, postings) — always read FROM THE
    * FILES, so readers keep column pruning and every consumer sees
    * the same committed bytes. */
  def ivfPqIndexTable(corpus: DataFrame, dim: Int = 64, cells: Int = 8,
      cellStride: Int = 31, cellIters: Int = 1, m: Int = 4,
      subDim: Int = 16, cbStride: Int = 31, cbK: Int = 16,
      cbIters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding",
      indexPath: Option[String] = None): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val params = s"""{"dim":$dim,"cells":$cells,"cellStride":$cellStride,""" +
      s""""cellIters":$cellIters,"m":$m,"subDim":$subDim,""" +
      s""""cbStride":$cbStride,"cbK":$cbK,"cbIters":$cbIters,""" +
      s""""idCol":"$idCol","vecCol":"$vecCol"}"""
    def build(dir: String): Unit = {
      val cents = trainedIvfCentroids(
        corpus, dim, cellStride, cells, cellIters, idCol, vecCol)
      val cb = pqCodebookTrained(
        corpus, m, subDim, cbStride, cbK, cbIters, idCol, vecCol)
      // posting lists from the FULL corpus: one broadcast-centroid
      // assignment pass + one broadcast-codebook encode pass — the
      // same per-vector functions the filtered search (v17) applies
      // post-filter, so a predicate semi-join over these postings is
      // bit-identical to rebuilding them from the filtered corpus
      val v = asDouble(col(vecCol))
      val assign = corpus.select(col(idCol).as("id"), v.as("xv"))
        .crossJoin(broadcast(cents))
        .select(col("id"), col("cid"),
          cosineCol(corpus, col("xv"), col("cv")).as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("id").orderBy(col("cos").desc, col("cid").asc)))
        .filter(col("rk") === 1).select(col("id"), col("cid"))
      val postings = corpus.select(col(idCol).as("id"),
          posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "sv")))
        .join(broadcast(packCodebook(cb)), "m")
        .select(col("id"), col("m"),
          argminCw(col("sv"), col("cbs"), sqDistLong).as("best"))
        .select(col("id"), col("m"), col("best.cw").as("code"))
        .join(assign, "id")
      cents.write.mode("overwrite").parquet(s"$dir/centroids")
      cb.write.mode("overwrite").parquet(s"$dir/codebook")
      postings.write.mode("overwrite").parquet(s"$dir/postings")
    }
    val spark = corpus.sparkSession
    val path = indexPath match {
      case Some(p) =>
        val conf = spark.sessionState.newHadoopConf()
        val marker = new org.apache.hadoop.fs.Path(p, "_GRAFT_INDEX_SUCCESS")
        val sidecar = new org.apache.hadoop.fs.Path(p, "_graft_params.json")
        val fs = marker.getFileSystem(conf)
        if (fs.exists(marker)) {
          if (fs.exists(sidecar)) {
            val in = fs.open(sidecar)
            val existing = try scala.io.Source.fromInputStream(in, "UTF-8")
              .mkString.trim finally in.close()
            require(existing == params,
              s"ivfPqIndexTable at $p was committed with params $existing " +
                s"but was requested with $params — one indexPath keys ONE " +
                "parameter set; use a different path or drop the directory " +
                "to retrain")
          }
          p
        } else {
          build(p)
          val out = fs.create(sidecar, true)
          try out.write(params.getBytes("UTF-8")) finally out.close()
          fs.create(marker, true).close()
          p
        }
      case None =>
        val sh = corpus.queryExecution.analyzed.canonicalized.semanticHash()
        ivfPqIndexCache.computeIfAbsent(
          s"$sh|${corpus.schema.catalogString.hashCode}|$params",
          _ => {
            val dir = graft.store.TempSweep.tempDir("graft_ivfpq")
              .toString + "/index"
            build(dir)
            dir
          })
    }
    (spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebook"),
      readPostings(spark, path))
  }

  /** The committed posting tables of an index: the base `postings/`
    * plus every COMMITTED `postings_delta_N/` an
    * [[ivfPqIndexAppend]] has landed since training. An uncommitted
    * delta (crashed appender — no `_SUCCESS`) is invisible to
    * readers and harmlessly overwritten by a later append. */
  private def readPostings(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(conf)
    val committed = fs.globStatus(
        new org.apache.hadoop.fs.Path(root, "postings*"))
      .map(_.getPath)
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.toString).sorted
    spark.read.parquet(committed: _*)
  }

  /** Incremental growth of a committed [[ivfPqIndexTable]] — the
    * corpus-generation reality at 100 TB: new documents arrive
    * between retrains, and the serving path must absorb them WITHOUT
    * re-encoding the existing corpus or retraining the geometry. The
    * new vectors are encoded against the COMMITTED centroids and
    * codebook (the frozen index geometry — exactly how FAISS grows an
    * IVFADC index) and land as a `postings_delta_N/` parquet table
    * that every subsequent [[annIvfPqPersisted]] search reads
    * alongside the base postings.
    *
    * Contracts (same ownership model as the base index): one appender
    * per path at a time; appended ids must be NEW (an id already in
    * the postings would score twice — upstream dedup owns identity,
    * as for any fact append); a torn append (no `_SUCCESS`) is
    * invisible and the next append overwrites forward. Because the
    * geometry is frozen, recall on appended vectors degrades as the
    * corpus drifts from the trained distribution — the standard
    * trade; retrain per major generation, append within one. */
  def ivfPqIndexAppend(newVectors: DataFrame, indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = newVectors.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(conf)
    require(fs.exists(
        new org.apache.hadoop.fs.Path(root, "_GRAFT_INDEX_SUCCESS")),
      s"ivfPqIndexAppend: no committed index at $indexPath — train with " +
        "ivfPqIndexTable first")
    // the sidecar's m/subDim are the encode geometry; the append must
    // quantize exactly as the base build did
    val sidecar = new org.apache.hadoop.fs.Path(root, "_graft_params.json")
    val in = fs.open(sidecar)
    val params = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString finally in.close()
    def intField(name: String): Int =
      s""""$name":(\\d+)""".r.findFirstMatchIn(params).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"ivfPqIndexAppend: params sidecar at $indexPath lacks $name"))
    val m = intField("m"); val subDim = intField("subDim")
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val cb = spark.read.parquet(s"$indexPath/codebook")
    val v = asDouble(col(vecCol))
    val assign = newVectors.select(col(idCol).as("id"), v.as("xv"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("cid"),
        cosineCol(newVectors, col("xv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rk") === 1).select(col("id"), col("cid"))
    val delta = newVectors.select(col(idCol).as("id"),
        posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "sv")))
      .join(broadcast(packCodebook(cb)), "m")
      .select(col("id"), col("m"),
        argminCw(col("sv"), col("cbs"), sqDistLong).as("best"))
      .select(col("id"), col("m"), col("best.cw").as("code"))
      .join(assign, "id")
    // next = max over COMMITTED deltas only: a torn delta (crashed
    // appender, no _SUCCESS) must not reserve its number forever —
    // skipping uncommitted dirs makes the next append OVERWRITE the
    // torn directory forward, matching the readPostings doc ("a
    // markerless delta is harmlessly overwritten by a later append")
    // instead of accumulating dead dirs compaction never folds away.
    val next = 1 + fs.globStatus(
        new org.apache.hadoop.fs.Path(root, "postings_delta_*"))
      .filter(st => fs.exists(
        new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("postings_delta_"))
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .foldLeft(0)(math.max)
    delta.write.mode("overwrite")
      .parquet(s"$indexPath/postings_delta_$next")
  }

  /** Compaction of a grown index into a fresh generation — the
    * [[ivfPqIndexAppend]] lifecycle's other half (the ANN analog of
    * the fact store's S8 compaction): after many appends the posting
    * table is base + N deltas; compaction folds them into ONE base
    * posting table at a NEW path, carrying the centroids, codebook
    * and params sidecar over verbatim. Always to a fresh path, never
    * in place — readers of the source index keep serving committed
    * bytes throughout, and the caller flips its pointer when the new
    * generation's marker lands (the same publish-then-flip any
    * curated table rewrite uses). Geometry is untouched, so searches
    * against the compacted index are bit-identical. */
  def ivfPqIndexCompact(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, targetPath: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(indexPath)
    val dst = new org.apache.hadoop.fs.Path(targetPath)
    val fs = src.getFileSystem(conf)
    require(fs.exists(
        new org.apache.hadoop.fs.Path(src, "_GRAFT_INDEX_SUCCESS")),
      s"ivfPqIndexCompact: no committed index at $indexPath")
    require(!fs.exists(
        new org.apache.hadoop.fs.Path(dst, "_GRAFT_INDEX_SUCCESS")),
      s"ivfPqIndexCompact: $targetPath already holds a committed index " +
        "— compaction publishes a NEW generation, it never overwrites one")
    spark.read.parquet(s"$indexPath/centroids")
      .write.mode("overwrite").parquet(s"$targetPath/centroids")
    spark.read.parquet(s"$indexPath/codebook")
      .write.mode("overwrite").parquet(s"$targetPath/codebook")
    readPostings(spark, indexPath)
      .write.mode("overwrite").parquet(s"$targetPath/postings")
    val in = fs.open(new org.apache.hadoop.fs.Path(src, "_graft_params.json"))
    val params = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString finally in.close()
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dst, "_graft_params.json"), true)
    try out.write(params.getBytes("UTF-8")) finally out.close()
    fs.create(
      new org.apache.hadoop.fs.Path(dst, "_GRAFT_INDEX_SUCCESS"), true).close()
  }

  /** Filtered IVF-PQ search SERVED FROM THE PERSISTED INDEX — v17's
    * semantics against [[ivfPqIndexTable]]'s files: probes and ADC
    * tables come from the query vectors against the broadcast trained
    * artifacts exactly as in [[annIvfPqFilteredTrained]], but the
    * posting lists are the committed full-corpus tables restricted to
    * the predicate by an id SEMI-JOIN — no re-encode per predicate.
    * Cell assignment and PQ encode are per-vector functions, so
    * semi-joining the persisted postings to the filtered id set is
    * bit-identical to rebuilding them from the filtered corpus (the
    * v17 oracle gates both paths on that equality).
    *
    * Scale posture: the predicate reaches the corpus parquet scan as
    * a pushed filter (plan-pinned) and only (id) rows cross into the
    * semi-join — the vectors themselves are touched ONLY by the index
    * build, once per corpus generation. Search cost is the postings
    * scan (narrow integer rows) + broadcast probe/ADC joins. */
  def annIvfPqPersisted(corpus: DataFrame, queries: DataFrame,
      pred: Column, k: Int = 5, nprobe: Int = 2, dim: Int = 64,
      cells: Int = 8, cellStride: Int = 31, cellIters: Int = 1,
      m: Int = 4, subDim: Int = 16, cbStride: Int = 31, cbK: Int = 16,
      cbIters: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding",
      indexPath: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (centroids, codebook, postings) = ivfPqIndexTable(corpus, dim,
      cells, cellStride, cellIters, m, subDim, cbStride, cbK, cbIters,
      idCol, vecCol, indexPath)
    val v = asDouble(col(vecCol))
    // predicate placement: a semi-join of the NARROW persisted
    // postings against the filtered id set — the filter pushes to the
    // corpus scan, the postings never rebuild
    val matching = corpus.filter(pred).select(col(idCol).as("id"))
    val entries = postings.join(matching, Seq("id"), "left_semi")
    val probes = queries.select(col(idCol).as("qid"), v.as("qxv"))
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("cid"),
        cosineCol(corpus, col("qxv"), col("cv")).as("cos"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)))
      .filter(col("rk") <= nprobe).select(col("qid"), col("cid"))
    val dtable = queries.select(col(idCol).as("qid"),
        posexplode(quantSubs(col(vecCol), m, subDim)).as(Seq("m", "qv")))
      .join(broadcast(codebook), "m")
      .select(col("qid"), col("m"), col("cw"),
        sqDistLong(col("qv"), col("cv")).as("d"))
    val probed = entries
      .join(broadcast(probes.withColumnRenamed("qid", "pqid")), "cid")
      .filter(col("id") =!= col("pqid"))
    val adc = probed.join(broadcast(dtable),
        probed("m") === dtable("m") && probed("code") === dtable("cw") &&
          probed("pqid") === dtable("qid"))
      .select(col("pqid"), col("id").as("nid"), col("d"))
      .groupBy("pqid", "nid")
      .agg(sum("d").as("adc"))
    adc.withColumn("rank", row_number().over(
        Window.partitionBy("pqid").orderBy(col("adc").asc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select(col("pqid").as("query_id"), col("rank"), col("nid").as("neighbor"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion (RRF).
    *
    * Two independent rankers — lexical (occurrences of the query
    * terms among the whitespace tokens) and vector (int8-quantized
    * dot product against the query embedding, [[quantizeInt8]]) —
    * each produce a top-`k` list; fusion scores each doc
    * `Σ_systems 100000 div (60 + rank)` (the classic RRF-60 shape in
    * integer division, so scores are engine-exact) and the overall
    * top-`topK` come out. Docs absent from a ranker contribute 0 for
    * it and surface `rank = 0` in the output.
    *
    * Scale posture: each ranker is one corpus scan ending in a
    * TakeOrderedAndProject (top-k commutes before any join — the
    * corpus never shuffles); the query embedding reaches the scan as
    * a 1-row broadcast; the two k-row ranked lists fuse with a
    * trivially-small join. The post-limit rank windows are global but
    * see only k rows by construction. */
  def hybridRrf(docs: DataFrame, embs: DataFrame, queryTerms: Seq[String],
      queryVecId: Long, k: Int = 50, topK: Int = 10,
      idCol: String = "doc_id", textCol: String = "text",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = array(queryTerms.map(lit): _*)
    val lexScore = size(filter(Text.tokens(col(textCol)),
      t => array_contains(terms, t))).cast("long")
    val lexTop = docs.select(col(idCol).as("l_id"), lexScore.as("lex_score"))
      .filter(col("lex_score") > 0)
      .orderBy(col("lex_score").desc, col("l_id")).limit(k)
      // constant-but-unfoldable partition key on the post-limit k-row
      // rank windows: same single partition, but a non-empty spec
      // keeps WindowExec from warning on every bench run (a literal
      // key would constant-fold back to an empty spec) — see
      // [[graft.operators.GlobalRank.onePartitionKey]]
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy(graft.operators.GlobalRank.onePartitionKey(col("lex_score")))
          .orderBy(col("lex_score").desc, col("l_id"))))
    val codes = embs.select(col(vecIdCol).as("v_id"),
      quantizeInt8(col(vecCol)).as("codes"))
    val q = codes.filter(col("v_id") === queryVecId)
      .select(col("codes").as("q_codes"))
    val dot = aggregate(zip_with(col("codes"), col("q_codes"),
      (a, b) => a * b), lit(0L), _ + _)
    val vecTop = codes.crossJoin(broadcast(q))
      // exclude the query document from its own neighbor list — the
      // self-dot is the maximum by construction and was eating rank 1
      // of every fused result; every other ANN op here filters self
      .filter(col("v_id") =!= queryVecId)
      .select(col("v_id"), dot.as("dot"))
      .orderBy(col("dot").desc, col("v_id")).limit(k)
      .withColumn("vec_rank", row_number().over(
        Window.partitionBy(graft.operators.GlobalRank.onePartitionKey(col("dot")))
          .orderBy(col("dot").desc, col("v_id"))))
    lexTop.join(vecTop, col("l_id") === col("v_id"), "full_outer")
      .select(coalesce(col("l_id"), col("v_id")).as(idCol),
        (coalesce(expr("100000 DIV (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("100000 DIV (60 + vec_rank)"), lit(0L)))
          .cast("long").as("rrf"),
        coalesce(col("lex_rank"), lit(0)).cast("int").as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).cast("int").as("vec_rank"))
      .orderBy(col("rrf").desc, col(idCol)).limit(topK)
  }

  /** Structured random projection (Walsh/Hadamard rows): project each
    * embedding to `dims` integers, p_j = Σ_i q_i · (−1)^popcount(i & m_j)
    * with masks m_j = j+1 and q = the milli-unit integer quantization
    * of the vector. Walsh rows are mutually orthogonal ±1 vectors —
    * the subsampled-Hadamard flavor of Johnson–Lindenstrauss, minus
    * the random permutation (deterministic here so the result is
    * engine-exact).
    *
    * Shape: pure array expressions inside one codegen'd projection —
    * no shuffle, no join, no UDF; at 100 TB this runs at scan speed
    * and cuts the vector bytes that any downstream join or index
    * build must move by dim/dims. */
  def walshProject(vectors: DataFrame, dims: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = vectors.withColumn("__q",
      expr(s"transform($vecCol, x -> " +
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0D) AS BIGINT))"))
    val projections = (0 until dims).map { j =>
      val mask = j + 1
      expr("aggregate(zip_with(__q, sequence(0, size(__q) - 1), " +
        s"(v, i) -> v * CAST(1 - 2 * (bit_count(i & $mask) % 2) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)").as(s"p$j")
    }
    q.select(col(idCol) +: projections: _*)
  }
}
