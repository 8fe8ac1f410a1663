package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines. Nothing here exists in the reference (its dedup is
  * row-version W1, SURVEY.md §2.5); these are the LLM-data extensions the
  * engine adds, designed shuffle-minimal for 100 TB:
  *
  *  - exact:   one hash-aggregate on a 32-char content key (never on the
  *             full text), so the shuffle carries keys + ids only.
  *  - minhash: banded LSH — per-row signature (narrow), explode to
  *             (band, bucket) keys, self-join per bucket. Candidate work
  *             scales with bucket occupancy, never |docs|^2.
  */
object Dedup {
  import TextHash._

  /** Exact dedup on normalized content: returns one row per distinct
    * content with the smallest id kept and the duplicate count. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), contentKey(col(textCol)).as("ck"))
      .groupBy("ck")
      .agg(min(idCol).as(idCol), count(lit(1)).as("n_copies"))
      .drop("ck")

  /** MinHash-LSH near-duplicate candidate pairs (a_id < b_id).
    *
    * @param minTokens  docs shorter than this are skipped (shingling needs
    *                   context; also bounds tiny-doc bucket blowup)
    */
  def minhashCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 8, bands: Int = 4,
      minTokens: Int = 8, maxBucketSize: Int = 64,
      scope: CacheScope = CacheScope.unmanaged): DataFrame =
    minhashCandidatesFromTokens(
      docs.select(col(idCol).as("id"), tokens(col(textCol)).as("tok"))
        .filter(size(col("tok")) >= minTokens),
      shingleN, k, bands, maxBucketSize, scope)

  /** Same, over pre-tokenized docs (columns `id`, `tok`).
    *
    * The band table is cached before the self-join: it is tiny relative
    * to the corpus (id + band + 32-char hash per band), and without it
    * each join side would re-evaluate the whole shingle+md5 pipeline.
    * At warehouse scale the same role is played by materializing the
    * signature table once per corpus version. The caches are registered
    * with `scope`: the default (CacheScope.unmanaged) keeps them until
    * session end (gate mode); a long-lived caller passes its own scope
    * and calls `scope.release()` after materializing the result.
    *
    * Hot buckets: all-pairs WITHIN a bucket is quadratic in occupancy —
    * on a duplication-heavy corpus (boilerplate, mirrored pages) one
    * viral bucket dominates the whole job (measured: 8x-replicated docs
    * → 11.9x wall, see SCALE.md). Buckets larger than `maxBucketSize`
    * therefore emit STAR pairs (every member ↔ the bucket's min-id
    * representative) instead of the clique: connectivity for the
    * downstream dup-cluster union-find is preserved, cost becomes linear
    * in occupancy. Small buckets (the near-dup signal) keep exact
    * all-pairs semantics.
    */
  def minhashCandidatesFromTokens(
      toks: DataFrame, shingleN: Int = 3, k: Int = 8,
      bands: Int = 4, maxBucketSize: Int = 64,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // native one-pass shingle-hash + signature (graft.functions.TextHashOps;
    // bit-identical to the shingles/shingleHashes/minhashSignature HOF
    // chain — TextHashOpsSpec asserts it)
    // cached BEFORE the histogram join: both join sides read the band
    // table, and without the cache each would re-run the whole
    // shingle+minhash pipeline
    val sigs = scope.own(bandTable(Balance(toks), shingleN, k, bands).cache())
    if (maxBucketSize == Int.MaxValue) {
      // cap disabled (oracle-pinned gates): skip the occupancy histogram
      // entirely — the star branch is provably empty
      val a = sigs.as("a")
      val b = sigs.as("b")
      return a.join(b,
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .distinct()
    }
    // occupancy histogram: one narrow-key shuffle, the same stats table a
    // production LSH job materializes for bucket monitoring
    val sized = scope.own(sigs
      .join(sigs.groupBy("band", "bh")
        .agg(count(lit(1)).as("__bn"), min("id").as("__rep")),
        Seq("band", "bh"))
      .cache())
    val small = sized.filter(col("__bn") <= maxBucketSize)
    val a = small.as("a")
    val b = small.as("b")
    val cliquePairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
    val starPairs = sized
      .filter(col("__bn") > maxBucketSize && col("id") =!= col("__rep"))
      .select(col("__rep").as("a_id"), col("id").as("b_id")) // rep = min ⇒ a_id < b_id
    cliquePairs.unionByName(starPairs).distinct()
  }

  /** The persistable LSH band table (id, band, bh) of a tokenized corpus —
    * the INDEX a production dedup pipeline materializes once per corpus
    * version (bucket-partitioned on (band, bh) at scale). Incremental
    * shards then join against it without recomputing the corpus. */
  def bandTable(toks: DataFrame, shingleN: Int = 3, k: Int = 8,
      bands: Int = 4): DataFrame = {
    require(k % bands == 0,
      s"minhash k ($k) must be divisible by bands ($bands)")
    toks
      .withColumn("hs",
        graft.functions.columns.shingleHashes(col("tok"), shingleN, mod32 = true))
      .withColumn("sig", graft.functions.columns.minhashSig(
        col("hs"), k, minhashP, minhashABase, minhashBBase))
      .select(col("id"), explode(lshBands("sig", bands, k / bands)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** Incremental near-dup candidates: NEW shard docs vs an EXISTING corpus
    * band table — the operational mode at 100 TB, where re-banding the
    * whole corpus per arriving shard is unaffordable. One narrow join on
    * (band, bh): work scales with |shard| and bucket occupancy, never
    * |corpus|. Returns (new_id, corpus_id) pairs.
    *
    * Same hot-bucket hazard as the full pipeline: a viral corpus bucket
    * (boilerplate) joined by a boilerplate-heavy shard is |shard bucket| x
    * |corpus bucket| pairs. Corpus buckets over `maxBucketSize` therefore
    * yield only the (new_id, bucket-representative) pair — connectivity
    * for downstream clustering preserved, cost linear. A production
    * deployment precomputes the (__bn, __rep) histogram WITH the index;
    * here it is derived on the fly. */
  def incrementalCandidates(newToks: DataFrame, corpusBands: DataFrame,
      shingleN: Int = 3, k: Int = 8, bands: Int = 4,
      maxBucketSize: Int = 64,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val nb = bandTable(Balance(newToks), shingleN, k, bands)
      .select(col("id").as("new_id"), col("band"), col("bh"))
    val cb = corpusBands.select(col("id").as("corpus_id"), col("band"), col("bh"))
    val cbKept =
      if (maxBucketSize == Int.MaxValue) cb
      else {
        // prune the corpus side BEFORE the shard join — filtering after
        // would still materialize the quadratic bucket cross product.
        // cached: cb feeds both the histogram and the join; an unpersisted
        // corpusBands plan (e.g. bandTable(...) passed directly) would
        // otherwise re-run its whole pipeline twice. Scope-owned (same
        // contract as the sibling operator); a production deployment
        // reads the index from a materialized table instead.
        val cbc = scope.own(cb.cache())
        val hist = cbc.groupBy("band", "bh")
          .agg(count(lit(1)).as("__bn"), min("corpus_id").as("__rep"))
        cbc.join(hist, Seq("band", "bh"))
          .filter(col("__bn") <= maxBucketSize || col("corpus_id") === col("__rep"))
          .drop("__bn", "__rep")
      }
    nb.join(cbKept, Seq("band", "bh"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select("new_id", "corpus_id")
      .distinct()
  }

  /** ExactSubstr-style repeated-span coverage (the span-level dedup
    * metric from "Deduplicating Training Data Makes Language Models
    * Better": repeated w-token spans, not whole-doc dups, are what
    * inflate memorization). Shape: w-gram inverted index (one explode),
    * histogram of gram hashes, join back, then per-doc interval-union
    * arithmetic via a lag window — `least(w, p - lag(p))` sums exactly
    * the union size of the overlapping [p, p+w-1] intervals. Returns
    * (id, covered_tokens) for docs with any repeated span. Within-doc
    * repeats count (as in the paper). Shuffles: gram histogram + the
    * per-doc window — both on narrow (hash|id, pos) rows, never text. */
  def repeatedSpanCoverage(toks: DataFrame, w: Int = 8,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: the per-doc hash arrays feed both the histogram and the
    // join-back (compact: one int64 per gram; the EXPLODED rows are not
    // cached). Scope-owned, same contract as the band-table cache.
    val hs = scope.own(Balance(toks).filter(size(col("tok")) >= w)
      .select(col("id"),
        graft.functions.columns.shingleHashes(col("tok"), w, mod32 = false).as("hs"))
      .cache())
    val g = hs.select(col("id"), posexplode(col("hs")).as(Seq("p", "h")))
    val rep = g.groupBy("h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select("h")
    val win = Window.partitionBy("id").orderBy("p")
    g.join(rep, Seq("h"))
      .withColumn("__c",
        least(lit(w), col("p") - coalesce(lag("p", 1).over(win), col("p") - w)))
      .groupBy("id")
      .agg(sum("__c").cast("bigint").as("covered_tokens"))
  }

  /** ExactSubstr span REMOVAL — the transform behind the
    * [[repeatedSpanCoverage]] metric: every token covered by ANY
    * corpus-repeated w-gram is dropped, survivors reassemble in order
    * (the Lee-et-al. dedup that actually edits the corpus rather than
    * dropping whole docs). Same inverted-index machinery as the metric;
    * the extra work is one bounded explode (covered gram → w positions)
    * and one anti-join on (id, pos) — both on narrow int rows, never
    * text, until the final per-doc reassembly. Docs shorter than w emit
    * no grams and pass through whole. Returns (id, text, n_kept,
    * n_removed). */
  def removeRepeatedSpans(toks: DataFrame, w: Int = 8): DataFrame = {
    val base = Balance(toks).select(col("id"), col("tok"))
    val g = base.filter(size(col("tok")) >= w)
      .select(col("id"),
        posexplode(graft.functions.columns.shingleHashes(
          col("tok"), w, mod32 = false)).as(Seq("p", "h")))
    val rep = g.groupBy("h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select("h")
    val covered = g.join(rep, Seq("h"))
      .select(col("id"),
        explode(sequence(col("p"), col("p") + lit(w - 1))).as("t"))
      .distinct()
    val kept = base
      .select(col("id"), posexplode(col("tok")).as(Seq("t", "token")))
      .join(covered, Seq("id", "t"), "left_anti")
      .groupBy("id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("t"), col("token")))),
            x => x.getField("token")),
          " ").as("text"),
        count(lit(1)).as("n_kept"))
    // NULL tok ≡ empty doc (the lineDedup/globalTokenOffsets convention):
    // size(NULL) is -1/NULL depending on legacy conf — clamp either to 0
    // so the removal count can never go negative
    base.select(col("id"),
      coalesce(greatest(size(col("tok")), lit(0)), lit(0))
        .cast("bigint").as("__tot"))
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__tot") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** SimHash fingerprints: (id, simhash). Near-dups share fingerprints (or
    * differ in few bits); grouping by fingerprint is a single hash shuffle. */
  def simhashFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame =
    Balance(docs)
      .select(col(idCol), tokens(col(textCol)).as("tok"))
      // n=1 shingle hash == md5(token) 60-bit value; native single pass.
      // coalesce 0: the HOF form this replaced folded a NULL token array
      // to fingerprint 0 (per-bit when(null>0).otherwise(0)), and oracle
      // SQL agrees — keep that contract for null text.
      .withColumn("hs", graft.functions.columns.shingleHashes(
        col("tok"), 1, mod32 = false))
      .select(col(idCol),
        coalesce(graft.functions.columns.simhash(col("hs"), bits), lit(0L))
          .as("simhash"))

  /** Exact n-gram (token-set) Jaccard similarity between paired docs —
    * the verification stage after LSH candidate generation. Input must
    * already be pairs (it is NEVER applied all-pairs at scale). */
  def jaccard(tokA: org.apache.spark.sql.Column, tokB: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val da = array_distinct(tokA)
    val db = array_distinct(tokB)
    val inter = size(array_intersect(da, db)).cast("double")
    round(inter / (size(da) + size(db) - inter), 6)
  }
}
