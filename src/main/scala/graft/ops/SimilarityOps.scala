package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection + similarity search — the scale path for
 * training-data curation over document/embedding tables.
 *
 * Oracle-checked: `q_ngram_jaccard` (exact n-gram Jaccard with rare-shingle
 * candidate pruning) and `q_cosine_topk` (brute-force cosine top-k; double
 * math mirrored operation-for-operation by the DuckDB oracle, verified
 * bit-identical to a sequential fold).
 *
 * Engine-checked in ScalaTest (no SQL-expressible oracle): `q_minhash_pairs`
 * (MinHash + LSH banding), `q_simhash` (64-bit SimHash via per-bit
 * aggregation), `q_embed_lsh_topk` (random-hyperplane LSH bucketing + exact
 * re-rank within buckets).
 *
 * Scale notes (100 TB thinking):
 *  - Jaccard uses a document-frequency cap on shingles before the self-join:
 *    join cost is sum(df^2) over shingles, so the cap bounds it linearly in
 *    corpus size; hot (stop-phrase) shingles contribute nothing to near-dup
 *    evidence anyway.
 *  - MinHash keeps per-doc state at numPerms longs regardless of doc size;
 *    LSH banding makes candidate generation a hash-bucket group-by, not a
 *    pairwise scan. Both are one shuffle each.
 *  - The ANN path buckets by a 16-bit hyperplane signature so the exact
 *    re-rank join is per-bucket, not whole-corpus; brute force is kept as the
 *    recall baseline.
 */
object SimilarityOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** lowercased word tokens */
  private val toks = regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))

  /** distinct word-3-gram shingles of a document */
  private def shingles(tokens: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(tokens) - 2, lit(1))),
      i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1),
        element_at(tokens, i + 2))))

  /**
   * doc_id -> exploded shingles, cached: the shingle-construction expression
   * (tokenize + 3-gram transform) costs ~2s/1k docs per evaluation and every
   * consumer (df computation, candidate generation, size counts, verification)
   * re-evaluates it otherwise — here recompute is expensive and the exploded
   * output is narrow, the opposite trade-off from the merge path's no-persist
   * rule.
   *
   * Memoized per (session, canonicalized input plan): repeated invocations
   * (bench loops, verify runs) reuse ONE cache entry instead of pinning a new
   * MEMORY_AND_DISK copy per call — disk-backed blocks are not LRU-reclaimed,
   * so per-call persists would accumulate for the session's lifetime.
   */
  private val ShingleCacheMax = 8
  /** access-ordered LRU: eviction unpersists only the COLDEST entry instead
    * of flushing the whole cache (a mass flush forces ~seconds of pointless
    * recompute for every hot corpus still in use).
    *
    * Staleness contract: the key is the ANALYZED plan, which pins the file
    * listing captured at `spark.read` time — rewriting the files behind the
    * same path mid-session and re-reading through a still-cached plan is not
    * supported (the lake/table paths version their data directories instead
    * of rewriting in place, so the engine's own sources never hit this). */
  private val shingleCache =
    new java.util.LinkedHashMap[(SparkSession, Any), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, Any), DataFrame]): Boolean = {
        val evict = size() > ShingleCacheMax
        if (evict) { try e.getValue.unpersist() catch { case _: Exception => () } }
        evict
      }
    }

  private def explodedShingles(d: DataFrame): DataFrame = shingleCache.synchronized {
    // drop entries of stopped sessions eagerly, so a long-lived JVM cycling
    // through sessions or corpora never accumulates unreclaimed disk-backed
    // blocks or pins dead SparkSessions
    val key = (d.sparkSession, d.queryExecution.analyzed.canonicalized)
    val it = shingleCache.entrySet().iterator()
    while (it.hasNext) { if (it.next().getKey._1.sparkContext.isStopped) it.remove() }
    var cached = shingleCache.get(key)
    if (cached == null) {
      // two-step projection: materialize the token array as a column FIRST.
      // Referencing the tokenizer expression inside the shingle lambda would
      // re-run the whole regexp extraction per element access — O(tokens^2)
      // regex work per document (measured 3-4x the entire query's time).
      //
      // The doc rows are spread across the cluster BEFORE tokenize/explode:
      // the documents table is one small parquet file, so its scan is a
      // single partition and the whole tokenize + shingle + explode pipeline
      // (and every consumer's map-side partial aggregation over the cached
      // frame) would otherwise run in ONE task (guide §2.5 input skew). The
      // exchange moves only the raw doc rows — far cheaper than the
      // single-threaded regex work it unlocks.
      cached = d.select(col("doc_id"), col("text"))
        .repartition(d.sparkSession.sparkContext.defaultParallelism)
        .select(col("doc_id"), toks.as("_tk"))
        .select(col("doc_id"), explode(shingles(col("_tk"))).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      shingleCache.put(key, cached)
    }
    cached
  }

  /** doc_id -> exploded rare shingles (df-capped), with the per-doc rare
    * count `n` attached to every row by a window over doc_id. One subtree
    * serving both the pair expansion and the Jaccard denominators: the
    * former separate `sz` aggregate was joined back twice, and each join
    * re-executed the whole ex⋈rare pipeline (plan audit: 3x the exchanges
    * for the same rows — guide §2.4, duplicated subtrees). */
  private def rareShinglesWithCount(d: DataFrame, dfCap: Int): DataFrame = {
    val ex = explodedShingles(d)
    val rare = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("s"))
    ex.join(rare, "s")
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
  }

  /**
   * Ordered (a < b) pairs within each group of a grouped-ids frame: the
   * scale-correct replacement for a self-join on the grouping key. One
   * shuffle (the groupBy) instead of joining the exploded table against
   * itself; output volume is sum(group_size^2)/2 either way, but bounded
   * here by the df-cap/band-bucket size.
   */
  private def pairsWithinGroups(ex: DataFrame, groupCols: Seq[String],
      maxGroup: Int = Int.MaxValue): DataFrame = {
    def allPairs(in: DataFrame): DataFrame = {
      val grouped = in.groupBy(groupCols.map(col): _*)
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      grouped.select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(
          slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    }
    if (maxGroup == Int.MaxValue) allPairs(ex)
    else {
      // Bound group size BEFORE the collect_list: a mass-duplicate corpus
      // otherwise puts the whole corpus into one bucket — one giant row
      // (executor OOM) plus O(n^2) pair blowup. Sizes come from a window
      // count over the group clustering (was: a separate hash aggregate
      // joined back, which cost two more exchanges and re-executed the input
      // subtree — guide §2.4); the window's hash clustering is then REUSED
      // by both branches (the collect_list aggregate and the chain window
      // group on the same columns), so the whole capped expansion runs off
      // ONE exchange. Over-cap groups degrade to consecutive-chain pairs
      // (sorted by doc_id, lead window — streaming, spillable): O(n) volume
      // while keeping the duplicate cluster CONNECTED for downstream
      // grouping, and every emitted pair is still exact-verified by the
      // caller.
      val wg = Window.partitionBy(groupCols.map(col): _*)
      val withN = ex.withColumn("_gn", count(lit(1)).over(wg))
      val small = allPairs(withN.filter(col("_gn") <= maxGroup).drop("_gn"))
      val wchain = Window.partitionBy(groupCols.map(col): _*).orderBy(col("doc_id"))
      val big = withN.filter(col("_gn") > maxGroup)
        .withColumn("_next", lead(col("doc_id"), 1).over(wchain))
        .filter(col("_next").isNotNull)
        .select(col("doc_id").as("doc_a"), col("_next").as("doc_b"))
      small.unionByName(big)
    }
  }

  /** sequential-fold dot product (bit-identical to DuckDB's loop) */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** L2 norm — the factor [[cosine]] recomputes per PAIR. The pair-join
    * queries precompute it per ROW and use [[cosinePre]]: dot(a,b)/(na*nb)
    * evaluates the identical IEEE expression tree (each sqrt(dot(x,x)) is
    * the same sequential fold, just computed once), so results are
    * bit-identical while the per-pair work drops from 3 dot products to 1
    * (guide §1.2 "per-task work"). */
  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosinePre(dotAB: Column, na: Column, nb: Column): Column =
    dotAB / (na * nb)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact n-gram Jaccard near-dup pairs with rare-shingle candidate
    // pruning. Per-doc sizes ride the pair expansion (struct of (doc_id, n)
    // per group member) instead of two post-hoc joins: the pair set and
    // every Jaccard value are identical — sort_array orders the structs by
    // their first field, the unique doc_id, exactly as it ordered the bare
    // ids — while the plan runs the ex⋈rare pipeline once instead of 3x.
    "q_ngram_jaccard" -> ((s, dir) => {
      val fxn = rareShinglesWithCount(docs(s, dir), dfCap = 25)
      val grouped = fxn.groupBy(col("s"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
        .filter(size(col("ids")) > 1)
      val prs = grouped.select(explode(flatten(transform(col("ids"), (x, i) =>
          transform(
            slice(col("ids"), i + lit(2), size(col("ids"))),
            y => struct(x.getField("doc_id").as("doc_a"), x.getField("n").as("na"),
              y.getField("doc_id").as("doc_b"), y.getField("n").as("nb")))))).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
          col("p.na").as("na"), col("p.nb").as("nb"))
      val pairs = prs.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("common"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
      val jac = col("common") * lit(1.0) / (col("na") + col("nb") - col("common"))
      pairs
        .filter(jac >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
    }),

    // Brute-force cosine top-5 neighbors for the first 3 vectors (the exact
    // baseline the ANN variant is measured against). Norms precomputed per
    // row (see cosinePre — bit-identical, 1 dot per pair instead of 3).
    "q_cosine_topk" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm", norm(col("emb")))
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("emb").as("qe"), col("nrm").as("qn"))
      val cand = q.crossJoin(
        e.select(col("vec_id").as("nid"), col("emb").as("ne"), col("nrm").as("nn")))
        .filter(col("nid") =!= col("qid"))
        .withColumn("sim_raw",
          cosinePre(dot(col("qe"), col("ne")), col("qn"), col("nn")))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim_raw").desc, col("nid"))
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("nid"), round(col("sim_raw"), 4).as("sim"))
    }),

    // MinHash (32 permutations) + LSH banding (16 bands x 2 rows — the
    // s-curve knee (1/b)^(1/r) = 0.25 sits below the 0.5 threshold, so
    // P(candidate | j >= 0.5) >= 0.99): candidate pairs sharing a band,
    // then verified with exact Jaccard >= 0.5.
    "q_minhash_pairs" -> ((s, dir) => minhashPairs(docs(s, dir), threshold = 0.5)),

    // 64-bit SimHash per document (per-bit weighted sums of token hashes).
    "q_simhash" -> ((s, dir) => simhash(docs(s, dir))),

    // ANN: random-hyperplane LSH signature buckets + exact cosine re-rank
    // within bucket; top-3 per query vector.
    "q_embed_lsh_topk" -> ((s, dir) => embedLshTopK(embs(s, dir), k = 3)),

    // ANN: IVF coarse quantization, nProbe nearest clusters searched exactly.
    "q_embed_ivf_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      embedIvfTopK(e, e.filter(col("vec_id") < 3), k = 3)
    }))

  val oracles: Map[String, String] = Map(
    "q_ngram_jaccard" ->
      """WITH tok AS (
           SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents),
         sh AS (
           SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                                         FOR i IN range(1, greatest(len(toks)-2, 1)+1)]) AS shingles
           FROM tok),
         ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 25),
         fx AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
         sz AS (SELECT doc_id, count(*) AS n FROM fx GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                   FROM fx a JOIN fx b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT doc_a, doc_b, round(common * 1.0 / (sa.n + sb.n - common), 4) AS jaccard
         FROM pairs JOIN sz sa ON sa.doc_id = pairs.doc_a
                    JOIN sz sb ON sb.doc_id = pairs.doc_b
         WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5""",
    "q_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id < 3),
         s AS (SELECT qid, e.vec_id AS nid,
                      list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[])) AS sim_raw
               FROM q, embeddings e WHERE e.vec_id <> qid)
         SELECT qid, nid, round(sim_raw, 4) AS sim FROM s
         QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, nid) <= 5""")

  /** MinHash signatures + banded LSH + exact-Jaccard verification.
    *
    * `bandBucketCap` bounds every band bucket: buckets above the cap (mass
    * duplicates — e.g. one boilerplate text repeated across the corpus) emit
    * consecutive-chain pairs instead of all pairs, so candidate volume is
    * O(bucket) not O(bucket^2) and no single aggregation row can OOM an
    * executor. Verification is candidate-pair-driven (two joins against the
    * exploded shingles), so its cost is linear in candidates * doc size even
    * when the corpus is one giant duplicate class — a shingle-grouped pair
    * expansion would square in the duplicate count there.
    *
    * Recall contract: over-cap buckets report a spanning CHAIN of the
    * duplicate class (every emitted pair still exact-verified), not every
    * pair — downstream dedup should group candidates by connected component.
    * Consumers that need all pairs must pass `bandBucketCap = Int.MaxValue`
    * and accept the O(bucket^2) cost. */
  def minhashPairs(d: DataFrame, threshold: Double, numPerms: Int = 32,
      bands: Int = 16, bandBucketCap: Int = 64): DataFrame = {
    val ex = explodedShingles(d)
    // 32 min-hashes: min over shingles of xxhash64(shingle, perm-seed)
    val sigCols = (0 until numPerms).map(j =>
      min(xxhash64(col("s"), lit(j))).as(s"h$j"))
    val sigs = ex.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    // bands of numPerms/bands rows; band key = hash of the band's minhashes
    val rowsPerBand = numPerms / bands
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("sig"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val cands =
      pairsWithinGroups(buckets, Seq("band", "sig"), bandBucketCap).distinct()
    // exact-Jaccard verification, driven by the candidate pairs: shared
    // shingle count per pair = cands ⋈ shingles(doc_a) ⋈ shingles(doc_b).
    val sz = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cands
      .join(ex.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
      .join(ex.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
    val jac = col("common") * lit(1.0) / (col("na") + col("nb") - col("common"))
    common
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
  }

  /** 64-bit SimHash: bit i set iff sum over tokens of (2*bit_i(hash)-1) > 0.
    * Input spread before tokenize/explode — single-file sources otherwise
    * run the whole regex + per-bit map work in one task (guide §2.5). */
  def simhash(d: DataFrame): DataFrame = {
    val tokd = d.select(col("doc_id"), col("text"))
      .repartition(d.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(toks).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$i"))
    val agg = tokd.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: 4x16-bit bands, verified hamming <= maxHamming.
    *
    * Same candidate-volume bound as [[minhashPairs]]: band buckets above
    * `bandBucketCap` (mass duplicates collapsing into one signature) degrade
    * to consecutive-chain pairs — O(bucket) candidates, duplicate class kept
    * connected — instead of an O(bucket^2) self-join blowup. Recall contract:
    * over-cap buckets report a spanning chain of the duplicate class, not
    * every pair; consumers needing ALL pairs must pass
    * `bandBucketCap = Int.MaxValue` and accept the quadratic cost. */
  def simhashPairs(d: DataFrame, maxHamming: Int = 8,
      bandBucketCap: Int = 64): DataFrame = {
    val sh = simhash(d)
    val bandCols = (0 until 4).map(b => struct(lit(b).as("band"),
      shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("sig")))
    val buckets = sh.select(col("doc_id"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val cands = pairsWithinGroups(buckets, Seq("band", "sig"), bandBucketCap)
      .distinct()
    // verification joins re-attach the signatures to the candidate pairs
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * ANN via random-hyperplane LSH: 16-bit signature from deterministic
   * pseudo-random hyperplanes (hash-derived, no RNG state), exact cosine
   * re-rank within each bucket, top-k per query.
   *
   * `bucketCap` bounds the NEIGHBOR side of every signature bucket (rank by
   * vec_id — deterministic): join output is O(n * bucketCap) even when a
   * low-variance corpus collapses into one signature bucket, where the
   * uncapped self-join goes O(n^2). Recall contract: vectors ranked past the
   * cap inside a mass-duplicate bucket are not offered as neighbors — for
   * near-identical members (the only way a bucket gets that big) the capped
   * candidates carry the same similarity, so top-k quality is unaffected.
   */
  def embedLshTopK(e0: DataFrame, k: Int, sigBits: Int = 16,
      bucketCap: Int = 1024): DataFrame = {
    // spread before the signature map: the 16 hyperplane dot products (hash
    // noise generated per element) are the heaviest per-row expression in
    // this query, and a single-file embeddings source runs them in one task
    val e = e0.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .repartition(e0.sparkSession.sparkContext.defaultParallelism)
      .withColumn("nrm", norm(col("emb")))
    // hyperplane j component d = centered hash noise in [-1, 1)
    def plane(j: Int): Column = transform(
      sequence(lit(0), size(col("emb")) - 1),
      d => pmod(xxhash64(d + lit(j * 4099)), lit(1000003L)).cast("double")
        / lit(500001.5) - lit(1.0))
    val sig = (0 until sigBits).map(j =>
      when(dot(col("emb"), plane(j)) > 0, shiftleft(lit(1), j)).otherwise(lit(0)))
      .reduce((a, b) => a.bitwiseOR(b))
    val bucketed = e.withColumn("bucket", sig)
    // neighbor side capped per bucket; the window sort is external/spillable,
    // so even a single whole-corpus bucket is O(n log n) and never OOMs
    val wb = Window.partitionBy(col("bucket")).orderBy(col("vec_id"))
    val nbrs = bucketed.withColumn("_rnb", row_number().over(wb))
      .filter(col("_rnb") <= bucketCap).drop("_rnb")
    // norms ride the bucketed rows (cosinePre: bit-identical, 1 dot/pair)
    val pairs = bucketed.as("a").join(nbrs.as("b"),
      col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        cosinePre(dot(col("a.emb"), col("b.emb")),
          col("a.nrm"), col("b.nrm")).as("sim_raw"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim_raw").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim_raw"), 4).as("sim"))
  }

  /**
   * Deterministic k-means centroids for IVF, trained on a BOUNDED sample:
   * one distributed pass selects the `sampleCap` lowest-(hash, id) vectors
   * (TakeOrdered — hash order decorrelates the sample from id locality, the
   * unique id tiebreak makes the selection a pure function of the data), then
   * all `iters` Lloyd rounds run sequentially on the driver over that sample.
   *
   * Why local: coarse-quantizer quality needs only a sample (IVF recall is
   * governed by nProbe, not centroid micro-precision), while full-corpus
   * Lloyd costs 2 distributed passes PER ROUND — at 100 TB that is the
   * dominant build cost, and distributed double summation made the result
   * partition-order dependent. The local fold is sequential in sorted id
   * order, so the centroids are bit-identical at any parallelism.
   *
   * Empty clusters keep their previous centroid (k never silently shrinks);
   * argmax ties break to the lowest cluster index.
   */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int,
      sampleCap: Int = 4096): DataFrame = {
    val spark = e.sparkSession
    val sample = e.select(col("vec_id"), col("emb"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleCap)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(sample.nonEmpty, "kmeansCentroids: empty input")
    val vecs = sample.map(_._2)
    val kk = math.min(k, vecs.length)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) -1.0 else d / den
    }
    var cents: Array[Array[Double]] = vecs.take(kk).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](vecs.head.length))
      val counts = new Array[Long](kk)
      vecs.foreach { v =>
        var best = 0; var bestSim = cos(v, cents(0)); var c = 1
        while (c < kk) {
          val s = cos(v, cents(c))
          if (s > bestSim) { best = c; bestSim = s } // tie -> lowest index
          c += 1
        }
        counts(best) += 1
        var i = 0; while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0L) cents(c) // empty cluster: keep previous centroid
        else sums(c).map(_ / counts(c))
      }
    }
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("cid", "cemb")
  }

  /**
   * ANN via IVF (inverted-file) coarse quantization: assign every vector to
   * its nearest of `nCentroids` coarse centroids (broadcast — the centroid
   * table is tiny), then answer each query by exact cosine search over only
   * the `nProbe` clusters nearest the query. The scale path: cluster
   * assignment is one broadcast-join pass (linear, no shuffle of the corpus
   * beyond the final per-cluster grouping), and query cost is
   * |corpus| * nProbe / nCentroids instead of |corpus|.
   *
   * Centroids: deterministic first-k init refined by `kmeansIters` Lloyd
   * rounds (0 = the v1 first-k behavior); recall/cost is then controlled by
   * nProbe.
   */
  def embedIvfTopK(e0: DataFrame, queries0: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, kmeansIters: Int = 2): DataFrame = {
    // norms precomputed per vector/centroid/query; cosinePre keeps the
    // IEEE expression tree identical while the assignment pass drops from
    // 3 dot products per (vector, centroid) to 1
    val e = e0.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .repartition(e0.sparkSession.sparkContext.defaultParallelism)
      .withColumn("nrm", norm(col("emb")))
    val queries = queries0.select(col("vec_id").as("qid"),
      col("embedding").cast("array<double>").as("qe"))
      .withColumn("qn", norm(col("qe")))
    val cents = kmeansCentroids(e, nCentroids, kmeansIters)
      .withColumn("cnrm", norm(col("cemb")))
    // corpus-side cluster assignment: argmax-cosine centroid per vector
    val assigned = e.crossJoin(broadcast(cents))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("emb"), col("nrm")),
        cosinePre(dot(col("emb"), col("cemb")), col("nrm"), col("cnrm"))).as("a"))
      .select(col("vec_id").as("nid"), col("a.cid").as("cluster"),
        col("a.emb").as("ne"), col("a.nrm").as("nn"))
    // query-side probe list: nProbe nearest centroids per query
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("csim", cosinePre(dot(col("qe"), col("cemb")), col("qn"), col("cnrm")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select(col("qid"), col("qe"), col("qn"), col("cid").as("cluster"))
    // exact re-rank within probed clusters only
    val cand = probes.join(assigned, "cluster")
      .filter(col("nid") =!= col("qid"))
      .withColumn("sim_raw", cosinePre(dot(col("qe"), col("ne")), col("qn"), col("nn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim_raw").desc, col("nid"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim_raw"), 4).as("sim"))
  }

  /** Exact brute-force cosine top-k for every vector (recall baseline). */
  def bruteForceTopK(e0: DataFrame, k: Int): DataFrame = {
    val e = e0.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        cosinePre(dot(col("a.emb"), col("b.emb")),
          col("a.nrm"), col("b.nrm")).as("sim_raw"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim_raw").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim_raw"), 4).as("sim"))
  }
}
