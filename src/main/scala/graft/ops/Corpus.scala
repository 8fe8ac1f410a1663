package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines (LLM-data
  * extensions beyond the reference): line-level corpus dedup (C4-style),
  * Bloom-prefiltered decontamination, global sequence packing, sliding
  * token-window chunking, deterministic weighted sampling.
  *
  * Every operator is built from native `functions._` expressions (no
  * UDFs): whole-stage-codegen-friendly and arithmetic-portable to the
  * DuckDB oracle. Hashes reuse the md5-based `TextHash.portableHash`
  * family so oracle SQL reproduces them bit-for-bit.
  */
object Corpus {

  // ---------------------------------------------------------------- lines

  /** C4-style line-level corpus dedup: a "line" (any `delim`-separated
    * segment) that occurs more than `maxOcc` times across the WHOLE corpus
    * is dropped from every document; surviving lines are reassembled in
    * their original order.
    *
    * Shape (scale-first): posexplode lines (narrow) → one hash-count
    * shuffle on the 60-bit line hash → hash join back (line table is
    * skew-resistant: key = content hash) → one reassembly shuffle on the
    * doc id. Work is linear in corpus lines; no per-pair comparisons. At
    * 100 TB the count table is itself large but stays (hash, count) — two
    * longs per distinct line — and the join is a plain shuffled hash join;
    * a production variant can swap the exact count for a CountMinSketch
    * broadcast when approximate thresholds are acceptable.
    *
    * Returns (idCol, text, n_kept, n_dropped) — `text` is the surviving
    * document (empty string when every line was boilerplate).
    */
  /** `joinDelim` is the literal separator used to reassemble surviving
    * lines — callers passing a non-default `delimRegex` must supply the
    * matching literal (a regex is not invertible, so it cannot be
    * derived); with the defaults a doc with no dropped lines round-trips
    * byte-identically. */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      delimRegex: String = "\n", maxOcc: Long = 1,
      joinDelim: String = "\n"): DataFrame = {
    val lines = docs
      // NULL text ≡ empty doc: posexplode(split(NULL)) emits no rows, which
      // would silently DROP the document from the (inner-joined) totals
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), delimRegex))
          .as(Seq("pos", "line")))
      .withColumn("h", TextHash.portableHash(col("line")))
    val counts = lines.groupBy("h").agg(count(lit(1)).as("__n"))
    val kept = lines.join(counts, Seq("h"))
      .filter(col("__n") <= maxOcc)
      .groupBy(idCol)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          joinDelim).as("text"),
        count(lit(1)).as("n_kept"))
    val total = lines.groupBy(idCol).agg(count(lit(1)).as("__tot"))
    docs.select(col(idCol)).join(kept, Seq(idCol), "left").join(total, Seq(idCol))
      .select(col(idCol),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__tot") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  // ---------------------------------------------------------------- bloom

  /** Driver-side Bloom-filter build over a (small) benchmark hash set:
    * `mBits` bits as a packed long[] with `k` probes per element. The
    * probe scheme is double hashing derived arithmetically from the
    * 60-bit input hash — build and probe only need to agree; filter
    * quality affects cost, never correctness (no false negatives). */
  def bloomBuild(hashes: Array[Long], mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits ($mBits) must be a positive multiple of 64")
    val bits = new Array[Long](mBits / 64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      val g2 = ((h >>> 17) | 1L) % mBits
      var j = 0
      while (j < k) {
        val pos = (((h % mBits) + j * g2) % mBits + mBits) % mBits
        bits((pos / 64).toInt) |= (1L << (pos % 64))
        j += 1
      }
      i += 1
    }
    bits
  }

  /** Membership probe as a pure Column expression over the SAME double-
    * hashing scheme as [[bloomBuild]]: the bit array ships as a literal
    * (constant-folded into codegen; at production scale, an executor
    * broadcast with a native expression). k AND-ed bit tests per row —
    * no shuffle, no UDF. */
  def bloomMightContain(h: Column, bits: Array[Long], mBits: Int, k: Int): Column = {
    val arr = lit(bits)
    val m = lit(mBits.toLong)
    val g2 = (shiftrightunsigned(h, 17).bitwiseOR(lit(1L))) % m
    (0 until k).map { j =>
      val pos = pmod((pmod(h, m)) + lit(j.toLong) * g2, m)
      // the functions-API shiftright only takes a literal shift amount;
      // call_function reaches the SQL overload with a column amount
      (call_function("shiftright",
        element_at(arr, (pos / 64).cast("int") + 1), (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L)
    }.reduce(_ && _)
  }

  /** Benchmark decontamination with a Bloom prefilter: corpus shingle
    * hashes are screened map-side against a compact filter built from the
    * benchmark's shingles, and only Bloom-positive shingles reach the
    * exact confirm join. Because a Bloom filter has NO false negatives,
    * the output is bit-identical to the exact semi-join — the filter
    * only shrinks the shuffled side (at 100 TB: megabytes broadcast
    * instead of re-shuffling every corpus shingle).
    *
    * Returns (docIdCol, n_shared) for corpus docs with ≥1 benchmark
    * shingle hit.
    */
  def bloomDecontaminate(corpusShingles: DataFrame, benchShingles: DataFrame,
      docIdCol: String = "doc_id", hCol: String = "h",
      mBits: Int = 0, k: Int = 3): DataFrame = {
    val benchHashes = benchShingles.select(col(hCol)).distinct()
    // the benchmark side is small by construction (held-out eval suites);
    // collect is the explicit, documented driver-side step of the build
    val hs = benchHashes.collect().map(_.getLong(0))
    // mBits <= 0 → auto-size at ~10 bits/key (fp ≈ 1%): a FIXED width
    // saturates once the bench set outgrows it and the "prefilter" stops
    // filtering — selectivity, never correctness, but the whole point
    val m = if (mBits > 0) mBits
      else math.max(1 << 10, ((hs.length * 10L + 63) / 64 * 64)
        .min(1L << 30).toInt)
    val bits = bloomBuild(hs, m, k)
    corpusShingles
      .filter(bloomMightContain(col(hCol), bits, m, k))
      .join(benchHashes, Seq(hCol))
      .groupBy(docIdCol)
      .agg(countDistinct(hCol).as("n_shared"))
  }

  // -------------------------------------------------------------- packing

  /** Global exclusive-prefix token offset per doc in `orderCol` order,
    * WITHOUT a single-partition global window: per-range-partition
    * cumulative sums run in parallel, the tiny per-partition totals are
    * prefix-summed on the driver, and each partition's offset joins back
    * by partition id. This is the textbook distributed scan — the naive
    * `Window.orderBy(orderCol)` (no partitionBy) collapses 100 TB into
    * one task. Adds (__start) = tokens before this doc. */
  def globalTokenOffsets(docs: DataFrame, orderCol: String, tokCol: String,
      numParts: Int = 32): DataFrame = {
    // NULL token count ≡ 0-token doc (same convention as chunkSpans):
    // without the coalesce a null row gets a NULL cumsum/__start (and an
    // all-null lowest partition would NPE the totals collect below)
    val parts = docs
      .withColumn(tokCol, coalesce(col(tokCol).cast("long"), lit(0L)))
      .repartitionByRange(numParts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    // ROWS frame, not the default RANGE: peers (duplicate orderCol values)
    // must not share a cumulative sum or the exclusive prefix double-counts
    // them. With duplicates the per-duplicate split is still partition-
    // internal order — pass a unique orderCol for fully deterministic
    // output.
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // localCheckpoint is REQUIRED for correctness, not a cache hint: the
    // per-partition cumsum executes twice (totals job below + the returned
    // plan), and RangePartitioner's sample seed varies per RDD id — two
    // executions could draw DIFFERENT range boundaries, applying each
    // partition's offset to the wrong rows. Pinning the materialized RDD
    // makes both jobs read the same partitioning. (Production: persist the
    // staged scan; it is one narrow materialization of the corpus.)
    val local = parts.withColumn("__cum", sum(col(tokCol)).over(w))
      .localCheckpoint(true)
    val totals = local.groupBy("__pid").agg(max("__cum").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p))).toMap
    val offCol = pids.foldLeft(lit(0L)) { (acc, p) =>
      when(col("__pid") === p, lit(offsets(p))).otherwise(acc)
    }
    local.withColumn("__start", col("__cum") - col(tokCol) + offCol)
      .drop("__pid", "__cum")
  }

  /** Offset-chunk sequence packing: documents in deterministic `orderCol`
    * order are laid head-to-tail on a global token tape; a document joins
    * the training sequence its FIRST token lands in (`floor(start /
    * budget)`). One distributed scan ([[globalTokenOffsets]]) + one
    * aggregation — the packing a concat-and-chunk pretraining loader
    * applies, computed corpus-parallel.
    *
    * Returns per-sequence stats (seq_id, n_docs, n_tokens, first_doc,
    * last_doc).
    */
  def packSequences(docs: DataFrame, orderCol: String, tokCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget ($budget) must be positive")
    globalTokenOffsets(docs, orderCol, tokCol)
      .withColumn("seq_id", floor(col("__start") / budget))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("n_tokens"),
        min(orderCol).as("first_doc"), max(orderCol).as("last_doc"))
  }

  // ------------------------------------------------------------- chunking

  /** Sliding token-window chunk spans per document (the RAG / long-context
    * chunking primitive): starts at 0, stride, 2·stride, … while < n_tok;
    * each chunk holds `least(window, n_tok - start)` tokens. Pure narrow
    * explode — rows out ≈ rows in × n/stride, no shuffle until the caller
    * aggregates. Returns (idCol, chunk_id, start, n_chunk_tokens). */
  def chunkSpans(docs: DataFrame, idCol: String, tokCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive")
    docs
      .select(col(idCol), coalesce(col(tokCol).cast("long"), lit(0L)).as("__n"))
      .withColumn("start",
        explode(sequence(lit(0L), greatest(col("__n") - 1, lit(0L)), lit(stride.toLong))))
      // "starts while < n": a 0-token doc yields NO chunks (the sequence
      // floor of 0 would otherwise emit one phantom empty chunk)
      .filter(col("start") < col("__n"))
      .select(col(idCol),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start"),
        least(lit(window.toLong), col("__n") - col("start")).as("n_chunk_tokens"))
  }

  /** Chunk TEXT materialization on top of [[chunkSpans]]: the chunk's
    * tokens re-joined with single spaces. Token-slice arithmetic mirrors
    * the span variant exactly; still one narrow explode. */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window/stride must be positive")
    docs
      .select(col(idCol), TextHash.tokens(coalesce(col(textCol), lit(""))).as("__tok"))
      .withColumn("__n", size(col("__tok")).cast("long"))
      .withColumn("start",
        explode(sequence(lit(0L), greatest(col("__n") - 1, lit(0L)), lit(stride.toLong))))
      .filter(col("start") < col("__n"))
      .select(col(idCol),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start"),
        array_join(slice(col("__tok"), (col("start") + 1).cast("int"), lit(window)), " ")
          .as("chunk_text"))
  }

  // --------------------------------------------------------------- shards

  /** Deterministic training-shard assignment — the global-shuffle step a
    * pretraining export runs after curation: shard = portable hash of the
    * doc id mod `nShards` (uniform, reproducible across runs/engines) and
    * an independent within-shard order key (second hash family), so
    * neighboring source docs land in different shards in decorrelated
    * order. Pure narrow projection; the writer path is
    * `.repartition(nShards, col("shard")).sortWithinPartitions("ord")` +
    * `partitionBy("shard")` — one shuffle, every shard written in
    * parallel. */
  def shardAssign(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards ($nShards) must be positive")
    docs
      .withColumn("shard",
        pmod(TextHash.portableHash(col(idCol).cast("string")), lit(nShards.toLong)))
      .withColumn("ord", TextHash.portableHash(col(idCol).cast("string"), seed = 1))
  }

  /** Write the curated corpus as `nShards` deterministic shards (one
    * parquet directory per shard, rows shuffled within shard by the
    * decorrelated order key). Returns the per-shard (shard, n_docs)
    * manifest. */
  def writeShards(docs: DataFrame, idCol: String, nShards: Int,
      outDir: String): DataFrame = {
    val assigned = shardAssign(docs, idCol, nShards)
    assigned
      .repartition(nShards, col("shard"))
      // sort key must LEAD with the partition column: the partitioned write
      // requires child ordering on `shard`, and a bare ord-sort would be
      // dropped (EliminateSorts) in favor of the writer's own shard-sort.
      // (shard, ord) satisfies the writer's requirement by prefix, so the
      // within-shard ord order actually reaches the files.
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    assigned.sparkSession.read.parquet(outDir)
      // partition-directory columns read back as int: pin the manifest type
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"))
  }

  // ------------------------------------------------------------- sampling

  /** Deterministic weighted priority sample: top-`k` docs by key
    * `u / weight` ASC where `u` is the doc's md5-derived 60-bit uniform —
    * heavier docs draw systematically smaller keys, so selection
    * probability rises with weight. Deliberately libm-free (no ln/pow —
    * int64→double conversion and one IEEE division are bit-identical in
    * every engine; an exact A-Res would use ln(u)/w and stop being
    * hash-reproducible across libms). One narrow projection + TakeOrdered
    * top-k — no full sort materialization. Weights must be positive
    * (zero/negative weights produce infinite/negated keys). */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame =
    docs
      .withColumn("__key",
        TextHash.portableHash(col(idCol).cast("string")).cast("double") /
          col(weightCol).cast("double"))
      .orderBy(col("__key").asc, col(idCol).asc)
      .limit(k)
      .drop("__key")

  /** Leakage-free train/val/test split: the assignment is a pure function
    * of the duplicate-CLUSTER label (not the document), so near-duplicates
    * — same cluster by construction — can never straddle splits. A per-doc
    * random split leaves that contamination channel open: the val copy of
    * a training document leaks. Deterministic via the portable hash
    * (stable across jobs/shards, like every other hash in this engine);
    * pure narrow projection, zero shuffle. */
  def clusterSplit(docs: DataFrame, clusterCol: String, nBuckets: Int = 10,
      valBucket: Int = 8, testBucket: Int = 9): DataFrame = {
    require(nBuckets > 2 && valBucket != testBucket &&
      valBucket < nBuckets && testBucket < nBuckets,
      s"invalid split config: $nBuckets/$valBucket/$testBucket")
    docs
      .withColumn("__b",
        pmod(TextHash.portableHash(col(clusterCol).cast("string")), lit(nBuckets)))
      .withColumn("split",
        when(col("__b") === valBucket, "val")
          .when(col("__b") === testBucket, "test")
          .otherwise("train"))
      .drop("__b")
  }

  /** Per-domain document cap (the RefinedWeb/CCNet host-level guard: a
    * handful of mirror-heavy hosts must not dominate the corpus): keep at
    * most `cap` documents per `domainCol`, ordered by `priority` (ties
    * must be broken deterministically by the caller's last sort key).
    *
    * Shape: ONE hash shuffle on the domain key + a row_number window —
    * the same W1 window as ingest dedup, so hot domains (the exact
    * motivation for the operator) fall under the same AQE skew split.
    * The window never sorts the corpus globally: ordering is per-domain
    * partition. */
  def domainCap(docs: DataFrame, domainCol: String, cap: Int,
      priority: Seq[Column]): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(col(domainCol)).orderBy(priority: _*)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
