package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (ANN) over Array[Float] columns — the
  * LLM-data extension queries (brief: brute-force cosine baseline + an
  * LSH-bucketed scale path).
  *
  * All vector math is built-in higher-order functions (zip_with /
  * aggregate) over array<double> — codegen'd, no UDFs, and exactly
  * reproducible in the DuckDB oracle (list_cosine_similarity /
  * list_transform), so even the ANN operators are hash-checked.
  */
object Similarity {

  /** dot(a, b) over array<double> columns — native one-pass expression
    * (graft.functions.DotProduct); sequential accumulation, bit-identical
    * to the HOF fold `aggregate(zip_with(a,b,_*_), 0.0, _+_)` it replaces
    * (kept below as `dotHof` for the equivalence spec) and to the oracle's
    * list accumulation. */
  def dot(a: Column, b: Column): Column = graft.functions.columns.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** One traversal computes dot + both norms (CosineSimilarity). */
  def cosine(a: Column, b: Column): Column = graft.functions.columns.cosineSim(a, b)

  /** Interpreted higher-order-function forms — the readable reference
    * implementations the native expressions are tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Brute-force exact top-k cosine neighbors for a bounded query set.
    *
    * Scale design: the QUERY side is broadcast (it is k user queries, not
    * a scaling table — the one case where an explicit broadcast hint is
    * correct); the corpus side streams through a single narrow pass, then
    * a per-query top-k window. Cost is O(|corpus| * |queries|) — the
    * baseline the LSH path is measured against.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv")))
    val c = Balance(corpus)
      .select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nv"))
    val scored = c.join(q, col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
    topKPerQuery(scored, "sim", k)
  }

  /** Deterministic random-hyperplane signature (`bits` wide) of an
    * array<double> embedding: bit b = sign of <e, p_b> with plane
    * components p_b[i] = md5_60bit("b:i")/2^60*2 - 1 (full-rank
    * pseudo-random planes, engine-portable by exact digest arithmetic —
    * see graft.functions.VectorOpsUtil.plane). Deterministic planes
    * (instead of a seeded RNG) keep the operator oracle-reproducible AND
    * make signatures stable across jobs — required for incremental
    * indexing at scale (re-ingesting a shard must not re-bucket the old
    * shards). */
  def hyperplaneSig(vecCol: String, bits: Int, dim: Int): Column =
    graft.functions.columns.hyperplaneSig(col(vecCol), bits, offset = 0, dim = dim)

  /** The plane-component formula in each engine's SQL (Spark for the HOF
    * reference form, DuckDB for the oracle builders). `iExpr` is the
    * 0-based dimension expression. Both reduce the same md5-prefix int64
    * through identical IEEE steps, so the doubles are bit-equal. */
  def planeSql(k: Int, iExpr: String): String =
    s"((cast(conv(substring(md5(concat('$k:', cast($iExpr as string))), 1, 15), 16, 10) as double)" +
      s" / 1152921504606846976.0) * 2 - 1)"
  def planeSqlDuck(k: Int, iExpr: String): String =
    s"((('0x' || substr(md5('$k:' || CAST($iExpr AS VARCHAR)), 1, 15))::BIGINT::DOUBLE" +
      s" / 1152921504606846976.0) * 2 - 1)"

  /** HOF reference form of the signature (equivalence spec only). */
  def hyperplaneSigHof(vecCol: String, bits: Int, dim: Int): Column =
    (0 until bits).map { b =>
      val proj = expr(
        s"aggregate(sequence(0, ${dim - 1}), cast(0.0 as double), " +
          s"(acc, i) -> acc + $vecCol[i] * ${planeSql(b, "i")})")
      when(proj > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Squared L2 distance over array<double> columns (native one-pass,
    * sequential accumulation, oracle-reproducible). */
  def l2sq(a: Column, b: Column): Column = graft.functions.columns.l2Squared(a, b)

  /** IVF (inverted-file) ANN — the other scale path from the brief.
    *
    * Coarse quantizer: `centroids` (a bounded, broadcastable set — in a
    * real index the output of k-means; here any deterministic sample).
    * Build = ONE broadcast-join pass assigning each corpus vector to its
    * nearest centroid (the "inverted lists", naturally expressible as a
    * table partitioned/bucketed by centroid id). Query = probe the
    * `nprobe` nearest centroids and scan only their lists — work scales
    * with corpus/centroids * nprobe, not |corpus|.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // The coarse quantizer is bounded by definition (IVF uses ~sqrt(N)
    // centroids; a real index trains a few thousand), so assignment must
    // NOT be a join: the old cross-join + row_number form exploded every
    // corpus vector x |centroids| and shuffled the full vector payload
    // just to take an argmin. Collect the centroids once (k × dim doubles
    // — the bounded driver read this operator is defined by), BROADCAST
    // the matrix, and fold a map-side argmin in a native expression
    // (NearestCentroids): a narrow projection, zero shuffle, zero row
    // explosion, and — unlike the earlier typedLit struct-array form —
    // O(1) plan size in k·dim, so a few-thousand-centroid × 1024-dim
    // index neither blows up Catalyst analysis nor busts codegen method
    // limits. The (distance, cid) tie-break is identical to the
    // `ORDER BY d, cid` window form. Centroid ids are int64 (the IVF
    // index contract; numeric ids cast losslessly).
    val centRows = centroids
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cv"))
      .collect()
    if (centRows.isEmpty) // no lists, no probes — empty result, same schema
      return queries
        .select(col(idCol).as("qid"), lit(1).as("rank"), col(idCol).as("nid"))
        .filter(lit(false))
    val matrix = graft.functions.CentroidMatrix(
      centRows.map(_.getLong(0)),
      centRows.map(_.getSeq[Double](1).toArray))
    val bc = scope.ownBroadcast(corpus.sparkSession.sparkContext.broadcast(matrix))
    def assign(df: DataFrame, id: String, v: String, keep: Int) =
      df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(v))
        .select(col(id), col(v),
          explode(graft.functions.columns.nearestCentroids(col(v), bc, keep))
            .as("cid"))
    val lists = assign(Balance(corpus), "nid", "nv", 1) // inverted lists: (cid, nid, nv)
    val probes = assign(queries, "qid", "qv", nprobe)
    val scored = lists.join(probes, Seq("cid")).filter(col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
    topKPerQuery(scored, "sim", k)
  }

  /** Two-stage retrieval: COARSE rank in a `projDim`-dimensional random
    * projection (deterministic md5-derived planes — the same family as
    * the LSH signatures, so projections are stable across jobs and
    * reproducible in the oracle), keep a per-query `shortlist`, then
    * EXACT-cosine rerank only the shortlist. The production pattern when
    * neither IVF lists nor LSH buckets fit: per-pair coarse cost drops
    * dim/projDim-fold (64→8 here), and the expensive exact scoring
    * touches `shortlist` rows per query instead of the corpus. The
    * projection itself is a narrow per-row pass (projDim native dot
    * products against plan-time literal planes); at scale the coarse
    * stage composes with the LSH bucket join to avoid the full scan too. */
  def projectedRerankTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      projDim: Int, shortlist: Int, dim: Int): DataFrame = {
    // literal-free projection: PlaneProjection computes the md5-derived
    // plane components executor-side (cached), so the plan carries only
    // (j, dim) per coordinate — the same plan-size discipline as the
    // broadcast centroid matrices (the old typedLit form embedded
    // projDim × dim literals). Bit-identical accumulation order.
    def proj(v: Column): Column = array((0 until projDim).map { j =>
      graft.functions.columns.planeProjection(v, j, dim)
    }: _*)
    val c = Balance(corpus)
      .select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nv"))
    val q = broadcast(
      queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv")))
    // coarse stage on NARROW rows: (qid, nid, csim) only — the shortlist
    // window must never shuffle the full vector payload (that would cost
    // MORE than brute force); survivors re-join the corpus for their
    // vectors (sl is queries x shortlist rows — AQE broadcasts it, so
    // the fetch is a second narrow pass over the corpus, not a shuffle)
    val coarse = c
      .select(col("nid"), proj(col("nv")).as("np"))
      .join(q.select(col("qid"), proj(col("qv")).as("qp")), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qp"), col("np")).as("csim"))
    val w1 = Window.partitionBy("qid").orderBy(col("csim").desc, col("nid"))
    val sl = coarse.withColumn("__r", row_number().over(w1))
      .filter(col("__r") <= shortlist)
      .select("qid", "nid")
    val rerank = sl.join(c, Seq("nid")).join(q, Seq("qid"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
    topKPerQuery(rerank, "sim", k)
  }

  /** Shared final stage of every ANN operator: per-query rank by score
    * desc with the id tie-break, keep k — ONE place for the output/
    * tie-break contract the oracles pin. */
  private def topKPerQuery(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col(scoreCol).desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"))
  }

  /** Build product-quantization codebooks from a bounded sample set: the
    * first `ks` sample vectors (ordered by id), sliced into `m`
    * `dsub`-dim subvectors — codebook j covers dims [j·dsub, (j+1)·dsub).
    * A production index trains each subspace codebook with k-means
    * (`Clustering.kmeans` on the sliced corpus — composition identical to
    * the q84 trained-IVF lifecycle); a deterministic sample keeps the
    * gate oracle-replayable. Codebooks are m × ks × dsub doubles — small
    * by construction (the whole point of PQ). */
  def pqCodebooks(samples: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int, ks: Int): Seq[graft.functions.CentroidMatrix] = {
    val rows = samples
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cv"))
      .orderBy("cid").limit(ks).collect()
    require(rows.nonEmpty, "pqCodebooks: empty sample set")
    (0 until m).map { j =>
      graft.functions.CentroidMatrix(
        rows.map(_.getLong(0)),
        rows.map(_.getSeq[Double](1).slice(j * dsub, (j + 1) * dsub).toArray))
    }
  }

  /** Train PQ codebooks with the k-means trainer — one independent
    * `Clustering.kmeans` per dsub-dim subspace over the SLICED corpus
    * (the composition pqCodebooks' scaladoc names; the q84 trained-IVF
    * lifecycle applied at the subspace level). Slicing is a narrow
    * projection, each subspace trains on the full corpus, and the
    * returned codebooks are the trained centroids keyed by cluster id —
    * drop-in for pqTopK/ivfPqTopK. Deterministic end-to-end (lowest-id
    * init, broadcast-argmin E-step, decimal M-step), so a gate oracle
    * can replay the whole training in SQL. */
  def pqTrainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int, ks: Int, iters: Int): Seq[graft.functions.CentroidMatrix] = {
    // The m subspace trainings are INDEPENDENT Lloyd chains, but each is
    // a sequence of iters small jobs synchronized at the driver (M-step
    // collect feeds the next E-step broadcast) — latency-bound, not
    // data-bound. Submitting them from concurrent threads overlaps the
    // per-job scheduling gaps (Spark's scheduler is thread-safe; FAIR/
    // FIFO both fine since every job is short); results are keyed by j
    // so the output order — and therefore the trained codebooks — are
    // bit-identical to the sequential form.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until m).map { j => Future {
        val sub = corpus.select(col(idCol).as("sid"),
          slice(col(vecCol).cast("array<double>"), j * dsub + 1, dsub).as("sv"))
        val rows = Clustering.kmeans(sub, "sid", "sv", ks, iters)
          .select("cid", "cv").collect().sortBy(_.getLong(0))
        graft.functions.CentroidMatrix(
          rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
      } }
      Await.result(Future.sequence(fs), Duration.Inf)
    } finally pool.shutdown()
  }

  /** Product-quantized ANN (the IVF-PQ compression stage, asymmetric
    * distance computation): each corpus vector is encoded as m codebook
    * ids — ONE narrow projection of m broadcast `NearestCentroids` argmin
    * kernels over the vector's subslices — and queries score against the
    * RECONSTRUCTED vectors: dot(q, recon(v)) = Σ_j dot(q_sub_j,
    * codebook_j[code_j]), evaluated left-to-right so ranks are
    * bit-reproducible in the oracle. The memory lever at 100 TB: a
    * 64-dim float64 corpus (512 B/vector) becomes m int64 codes + shared
    * codebooks (→ m bytes at int8 storage), which is what lets the
    * residency fit executor RAM; scoring touches codes only, never the
    * original vectors. Codebook lookup tables ride a Broadcast exactly
    * like the assignment matrices (native `AdcScore` kernel — plan size
    * O(1) in m·ks·dsub, asserted in SimilaritySpec at ks=256). Output:
    * (qid, rank, nid), rank by ADC score desc, nid tie-break. */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      codebooks: Seq[graft.functions.CentroidMatrix],
      idCol: String, vecCol: String, k: Int,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(codebooks.nonEmpty, "pqTopK: no codebooks")
    val coded = pqEncode(
      Balance(corpus).select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nv")), "nv", codebooks, scope)
    val q = broadcast(queries.select(
      col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv")))
    val scored = coded.join(q, col("nid") =!= col("qid"))
      .withColumn("sim", adcScore(adcTables(corpus, codebooks, scope),
        codebooks.length, col("qv")))
    topKPerQuery(scored, "sim", k)
  }

  /** Encode: m argmin codes per row, ONE narrow pass of broadcast
    * `NearestCentroids` kernels over the vector's subslices (columns
    * __c0..__c{m-1}). */
  private def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Seq[graft.functions.CentroidMatrix],
      scope: CacheScope): DataFrame = {
    val dsub = codebooks.head.vecs.head.length
    val sc = df.sparkSession.sparkContext
    codebooks.zipWithIndex.foldLeft(df) { case (d, (cb, j)) =>
      d.withColumn(s"__c$j", element_at(
        graft.functions.columns.nearestCentroids(
          slice(col(vecCol), j * dsub + 1, dsub),
          scope.ownBroadcast(sc.broadcast(cb)), keep = 1), 1))
    }
  }

  /** ADC: per-subspace lookup (cid -> subvector) + dot against the
    * query's subslice, as ONE native `AdcScore` kernel over the m code
    * columns. The codebook tables ride a Broadcast (plan size O(1) in
    * m·ks·dsub — the same discipline as the assignment matrices; the old
    * `typedLit`-map form re-entered ~260k doubles into the plan at
    * production ks=256). Left-assoc accumulation inside the kernel pins
    * the float order so ranks stay oracle-reproducible bit-for-bit. */
  private def adcScore(bcT: Broadcast[graft.functions.PqCodebookTables],
      m: Int, qv: Column): Column =
    graft.functions.columns.adcScore(
      qv, array((0 until m).map(j => col(s"__c$j")): _*), bcT)

  /** Build + broadcast the ADC tables once per operator call. */
  private def adcTables(df: DataFrame,
      codebooks: Seq[graft.functions.CentroidMatrix],
      scope: CacheScope): Broadcast[graft.functions.PqCodebookTables] =
    scope.ownBroadcast(df.sparkSession.sparkContext.broadcast(
      graft.functions.PqCodebookTables.fromCodebooks(codebooks)))

  /** The COMPLETE IVF-PQ index: coarse inverted lists (ivfTopK's
    * broadcast-argmin assignment) bound the candidate set to the probed
    * lists, and PQ codes + asymmetric distance score the candidates —
    * scoring never touches original corpus vectors, so the per-query
    * cost is (corpus/centroids)·nprobe rows × m code lookups over a
    * corpus resident as m small ints per vector. This is the standard
    * billion-scale ANN layout (coarse quantizer + PQ residency); both
    * stages are the already-gated kernels composed. */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      codebooks: Seq[graft.functions.CentroidMatrix],
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(codebooks.nonEmpty, "ivfPqTopK: no codebooks")
    val centRows = centroids
      .select(col(idCol).cast("long").as("cid"),
        col(vecCol).cast("array<double>").as("cv"))
      .collect()
    require(centRows.nonEmpty, "ivfPqTopK: no centroids")
    val matrix = graft.functions.CentroidMatrix(
      centRows.map(_.getLong(0)),
      centRows.map(_.getSeq[Double](1).toArray))
    val bc = scope.ownBroadcast(corpus.sparkSession.sparkContext.broadcast(matrix))
    // inverted lists WITH codes: one narrow projection computes the
    // coarse cid and the m PQ codes together — single corpus pass
    val lists = pqEncode(
      Balance(corpus).select(col(idCol).as("nid"),
        col(vecCol).cast("array<double>").as("nv")), "nv", codebooks, scope)
      .withColumn("cid", element_at(
        graft.functions.columns.nearestCentroids(col("nv"), bc, keep = 1), 1))
      .drop("nv") // codes + cid only: the PQ residency, vectors dropped
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .select(col("qid"), col("qv"), explode(
        graft.functions.columns.nearestCentroids(col("qv"), bc, nprobe)).as("cid"))
    val scored = lists.join(probes, Seq("cid")).filter(col("nid") =!= col("qid"))
      .withColumn("sim", adcScore(adcTables(corpus, codebooks, scope),
        codebooks.length, col("qv")))
    topKPerQuery(scored, "sim", k)
  }

  /** Int8 scalar quantization of an embedding column (the IVF-SQ8 memory
    * lever: a 100 TB float32 corpus becomes 25 TB of int8 codes, the
    * difference between an index that fits executor memory and one that
    * doesn't). Per-vector symmetric scale: q_i = floor(v_i * 127 / max|v|
    * + 0.5) ∈ [-127, 127], stored as integer-valued doubles so the native
    * vector expressions consume them directly — dot products of int8
    * codes are EXACT in double arithmetic (|dot| ≤ 64·127² ≪ 2^53), so
    * quantized scoring is bit-reproducible across engines.
    *
    * floor(x + 0.5), not round(): both engines' floor is exact IEEE,
    * while round() half-case modes differ. The expression shape
    * (x * 127.0 / ma) is pinned left-associative on both sides.
    *
    * Cosine is invariant under the per-vector positive scale, so
    * quantized cosine search needs NO dequantization — rank directly on
    * the codes (the scale would matter only for L2/dot scoring). */
  def quantizeInt8(v: Column): Column = {
    // nullif + coalesce: an all-zero vector quantizes to zeros instead of
    // NaN codes from the 0/0 scale
    val ma = nullif(array_max(transform(v, x => abs(x))), lit(0.0))
    transform(v, x => coalesce(floor(x * lit(127.0) / ma + lit(0.5)), lit(0.0)))
  }

  /** Embedding near-duplicate candidate pairs: self-join on the
    * hyperplane bucket, cosine-filtered — the vector counterpart of
    * MinHash near-dup. All-pairs within a bucket is quadratic in
    * occupancy, so oversized buckets are ADAPTIVELY REFINED: their
    * members get `bits` more signature bits from a disjoint plane family
    * per depth (offset = bits*d) until every bucket fits
    * `maxBucketSize` or `maxDepth` is reached. Near-dup pairs at the
    * thresholds this operator targets (cosine → 1, angle → 0) survive
    * every refinement split with probability 1 - depth*bits*θ/π ≈ 1, so
    * candidate semantics match the unrefined all-pairs join on real
    * corpora (and exactly, for exact-scaled duplicates). A bucket still
    * oversized at maxDepth holds ≥cap near-identical vectors — its
    * members pair with the bucket's min-id representative (star): the
    * rep IS a near-dup of each member there, so thresholded pairs
    * survive and cost stays linear in occupancy. */
  def cosineNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int, dim: Int,
      maxBucketSize: Int = 64, maxDepth: Int = 3,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    var cur = scope.own(Balance(corpus)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", hyperplaneSig("v", bits, dim).cast("string"))
      .cache())
    if (maxBucketSize == Int.MaxValue) {
      // cap disabled (oracle-pinned gates): refinement and the occupancy
      // histogram are provably no-ops — skip their actions/joins and go
      // straight to the per-bucket clique (same shortcut as the minhash
      // twin in Dedup.minhashCandidatesFromTokens)
      val a = cur.select(col("bucket"), col("id").as("a_id"), col("v").as("va"))
      val b = cur.select(col("bucket"), col("id").as("b_id"), col("v").as("vb"))
      return a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
        .withColumn("sim", cosine(col("va"), col("vb")))
        .filter(col("sim") >= threshold)
        .select("a_id", "b_id")
        .distinct()
    }
    var depth = 0
    var maxOcc = cur.groupBy("bucket").count()
      .agg(coalesce(max("count"), lit(0L))).collect()(0).getLong(0)
    while (maxOcc > maxBucketSize && depth < maxDepth) {
      depth += 1
      val sizes = cur.groupBy("bucket").agg(count(lit(1)).as("__bn"))
      val refined = scope.own(cur.join(sizes, Seq("bucket"))
        .withColumn("bucket",
          when(col("__bn") > maxBucketSize,
            concat(col("bucket"), lit("_"),
              graft.functions.columns.hyperplaneSig(
                col("v"), bits, offset = bits * depth, dim = dim).cast("string")))
            .otherwise(col("bucket")))
        .drop("__bn")
        .cache())
      maxOcc = refined.groupBy("bucket").count()
        .agg(coalesce(max("count"), lit(0L))).collect()(0).getLong(0)
      cur.unpersist()
      cur = refined
    }
    // cached: referenced three times below (clique sides, reps, star
    // members). Scope-owned like the minhash twin — long-lived callers
    // release after materializing.
    val sized = scope.own(cur
      .join(cur.groupBy("bucket")
        .agg(count(lit(1)).as("__bn"), min("id").as("__rep")), Seq("bucket"))
      .cache())
    val small = sized.filter(col("__bn") <= maxBucketSize)
    val a = small.select(col("bucket"), col("id").as("a_id"), col("v").as("va"))
    val b = small.select(col("bucket"), col("id").as("b_id"), col("v").as("vb"))
    val clique = a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "va", "vb")
    // residual hot buckets after maxDepth: near-identical clusters → star
    val repRows = sized.filter(col("__bn") > maxBucketSize && col("id") === col("__rep"))
      .select(col("bucket"), col("id").as("a_id"), col("v").as("va"))
    val star = sized.filter(col("__bn") > maxBucketSize && col("id") =!= col("__rep"))
      .select(col("bucket"), col("id").as("b_id"), col("v").as("vb"))
      .join(repRows, Seq("bucket"))
      .select(col("a_id"), col("b_id"), col("va"), col("vb"))
    clique.unionByName(star)
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select("a_id", "b_id")
      .distinct()
  }

  /** LSH-bucketed approximate top-k: candidates are only corpus vectors in
    * the query's hyperplane bucket — the 100 TB path (bucket join, no full
    * scan per query). Recall is tuned by `bits` (fewer bits = bigger
    * buckets = higher recall, more work). */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int, dim: Int): DataFrame = {
    // cast BEFORE sig so the signature math sees double
    val c = Balance(corpus)
      .select(col(idCol).as("nid"), col(vecCol).cast("array<double>").as("nv"))
      .withColumn("nsig", hyperplaneSig("nv", bits, dim))
    val q = broadcast(
      queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
        .withColumn("qsig", hyperplaneSig("qv", bits, dim)))
    val scored = c.join(q, col("nsig") === col("qsig") && col("nid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
    topKPerQuery(scored, "sim", k)
  }
}
