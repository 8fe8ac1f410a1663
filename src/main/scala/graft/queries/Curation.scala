package graft.queries

import graft.Tables
import graft.ops.{Components, Corpus, TextAnalysis, TextHash}
import org.apache.spark.sql.functions._

/** Corpus-preparation gate queries (round 5): line-level dedup, Bloom
  * decontamination, sequence packing, chunking, weighted sampling,
  * cluster-representative selection. Each is oracle-checked against
  * DuckDB on the shared `documents` fixture.
  */
object Curation {

  /** q71 — C4-style line-level corpus dedup. "Lines" are derived
    * deterministically (8-token segments of each doc, joined by '\n');
    * docs 0-24 are duplicated at id+1000000 so every line of those docs
    * occurs twice corpus-wide and gets dropped, while partial trailing
    * segments shared by accident also fall out. The output pins the exact
    * reassembled text bytes via the portable 60-bit hash — proving
    * order-preserving reassembly, not just counts. Shapes: one explode
    * (narrow), one hash-count shuffle, one hash join, one doc-id
    * reassembly shuffle.
    */
  val q71_line_dedup = Q(
    "q71_line_dedup",
    """WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 25),
      |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tok FROM base),
      |ld AS (SELECT doc_id, list_transform(range(0, (len(tok) + 7) // 8),
      |    g -> array_to_string(list_slice(tok, g*8 + 1, g*8 + 8), ' ')) AS lines
      |  FROM t),
      |l AS (SELECT doc_id, unnest(lines) AS line,
      |    unnest(range(1, len(lines) + 1)) AS pos FROM ld),
      |h AS (SELECT doc_id, pos, line,
      |    ('0x' || substr(md5(line), 1, 15))::BIGINT AS hh FROM l),
      |c AS (SELECT hh, count(*) AS n FROM h GROUP BY hh),
      |k AS (SELECT h.doc_id, h.pos, h.line FROM h JOIN c USING (hh) WHERE c.n <= 1),
      |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
      |    count(*) AS n_kept FROM k GROUP BY doc_id),
      |tot AS (SELECT doc_id, count(*) AS tot FROM l GROUP BY doc_id)
      |SELECT tot.doc_id,
      |  cast(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
      |  cast(tot.tot - coalesce(agg.n_kept, 0) AS BIGINT) AS n_dropped,
      |  ('0x' || substr(md5(coalesce(agg.text, '')), 1, 15))::BIGINT AS kept_h
      |FROM tot LEFT JOIN agg USING (doc_id)""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    val base = docs.unionByName(
      docs.filter(col("doc_id") < 25)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    // derive the lined fixture: 8-token segments joined by '\n'
    val tok = TextHash.tokens(col("text"))
    val nGroups = floor((size(tok) + lit(7)) / lit(8)).cast("long")
    val lined = base.select(col("doc_id"),
      array_join(
        transform(sequence(lit(0L), nGroups - 1),
          g => array_join(slice(tok, (g * 8 + 1).cast("int"), lit(8)), " ")),
        "\n").as("text"))
    Corpus.lineDedup(lined, "doc_id", "text", delimRegex = "\n", maxOcc = 1)
      .select(col("doc_id"), col("n_kept"), col("n_dropped"),
        TextHash.portableHash(col("text")).as("kept_h"))
  }

  /** q72 — Bloom-prefiltered benchmark decontamination: 6-gram shingle
    * hashes of held-out docs (doc_id % 50 == 0) build a compact Bloom
    * filter; corpus shingles are screened map-side and only
    * Bloom-positives reach the exact confirm join, whose result is
    * bit-identical to the exact semi-join (no false negatives). The
    * oracle IS that exact semi-join — the gate proves the Bloom path
    * changes nothing but cost. */
  val q72_bloom_decontam = Q(
    "q72_bloom_decontam",
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tok
      |  FROM documents),
      |sh AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(tok) - 4),
      |      i -> ('0x' || substr(md5(tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
      |        || ' ' || tok[i+3] || ' ' || tok[i+4] || ' ' || tok[i+5]), 1, 15))::BIGINT)) AS h
      |  FROM t WHERE len(tok) >= 6),
      |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),
      |hits AS (SELECT s.doc_id, count(DISTINCT s.h) AS n_shared
      |  FROM sh s JOIN bench b USING (h)
      |  WHERE s.doc_id % 50 <> 0
      |  GROUP BY s.doc_id)
      |SELECT cast(count(*) AS BIGINT) AS n_contaminated_docs,
      |  cast(sum(n_shared) AS BIGINT) AS total_hits,
      |  cast(max(n_shared) AS BIGINT) AS max_hits
      |FROM hits""".stripMargin) { (s, dir) =>
    val sh = Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextHash.tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 6)
      .select(col("doc_id"), explode(
        graft.functions.columns.shingleHashes(col("tok"), 6, mod32 = false)).as("h"))
    val bench = sh.filter(col("doc_id") % 50 === 0)
    val corpus = sh.filter(col("doc_id") % 50 =!= 0)
    Corpus.bloomDecontaminate(corpus, bench)
      .agg(count(lit(1)).as("n_contaminated_docs"),
        sum("n_shared").as("total_hits"),
        max("n_shared").as("max_hits"))
  }

  /** q73 — offset-chunk sequence packing over the whole corpus: docs in
    * doc_id order on a global token tape, sequence = floor(first-token
    * offset / 512). The Spark side computes the global prefix sum with
    * the DISTRIBUTED two-phase scan (per-range-partition cumsum + driver
    * prefix of the tiny per-partition totals) — never a single-partition
    * global window; the oracle uses DuckDB's plain global window. */
  val q73_sequence_packing = Q(
    "q73_sequence_packing",
    """WITH t AS (SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      |c AS (SELECT doc_id, tok,
      |    sum(tok) OVER (ORDER BY doc_id) - tok AS start FROM t)
      |SELECT cast(start // 512 AS BIGINT) AS seq_id,
      |  count(*) AS n_docs,
      |  cast(sum(tok) AS BIGINT) AS n_tokens,
      |  cast(min(doc_id) AS BIGINT) AS first_doc,
      |  cast(max(doc_id) AS BIGINT) AS last_doc
      |FROM c GROUP BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
    Corpus.packSequences(docs, "doc_id", "tok", budget = 512L)
  }

  /** q74 — sliding token-window chunk spans (window 32, stride 24): the
    * RAG / long-context chunking primitive as one narrow explode. Per-doc
    * chunk counts + overlap-inclusive covered-token sums. */
  val q74_chunk_spans = Q(
    "q74_chunk_spans",
    """WITH t AS (SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS n FROM documents),
      |ch AS (SELECT doc_id, unnest(range(0, greatest(n, 1), 24)) AS start, n FROM t)
      |SELECT doc_id, count(*) AS n_chunks,
      |  cast(sum(least(32, n - start)) AS BIGINT) AS n_covered
      |FROM ch GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("tok"))
    Corpus.chunkSpans(docs, "doc_id", "tok", window = 32, stride = 24)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_chunk_tokens").as("n_covered"))
  }

  /** q75 — deterministic weighted priority sample: top-40 docs by
    * `md5-uniform / n_chars` ASC (heavier docs draw smaller keys). All
    * arithmetic is int64→double conversion + one IEEE division — exact
    * in both engines; no libm transcendentals (round-3 lesson: libm
    * results differ per engine). */
  val q75_weighted_sample = Q(
    "q75_weighted_sample",
    """SELECT doc_id, lang, n_chars
      |FROM documents
      |ORDER BY ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 15))::BIGINT::DOUBLE
      |    / cast(n_chars AS DOUBLE) ASC, doc_id ASC
      |LIMIT 40""".stripMargin) { (s, dir) =>
    Corpus.weightedSample(
      Tables.load(s, dir, "documents").select("doc_id", "lang", "n_chars"),
      "doc_id", "n_chars", k = 40)
  }

  /** q76 — duplicate-cluster representative selection: connected
    * components over the q60 edge structure (chains inside doc_id
    * 5-blocks) pick the cluster, then the rep is the member with the
    * HIGHEST quality score (doc_id tie-break) — the keep-best-copy
    * policy a curation pipeline applies after clustering, composing the
    * components operator with the quality scorer in one lineage. */
  val q76_cluster_reps = {
    val swList = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
    Q(
      "q76_cluster_reps",
      s"""WITH q AS (SELECT doc_id,
        |    round(0.3 * least(len(tok) / 100.0, 1.0)
        |        + 0.3 * (len(list_distinct(tok))::double / len(tok))
        |        + 0.4 * (1.0 - len(list_filter(tok, x -> x IN ($swList)))::double / len(tok)),
        |      6) AS score
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tok
        |        FROM documents)),
        |lab AS (SELECT doc_id, cast(doc_id - doc_id % 5 AS BIGINT) AS cluster, score
        |  FROM q),
        |r AS (SELECT cluster, doc_id, score, row_number() OVER (
        |    PARTITION BY cluster ORDER BY score DESC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY cluster) AS n_docs
        |  FROM lab)
        |SELECT cluster, doc_id AS rep_id, score AS rep_score, n_docs
        |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextHash.tokens(col("text")).as("tok"))
      val scored = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("tok")).as("score"))
      // q60's edge structure: chains inside each 5-block of doc_ids
      val ids = scored.select("doc_id")
      val e = ids.select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
        .filter(col("src") % 5 =!= 4)
        .join(ids.select(col("doc_id").as("dst")), Seq("dst"))
      val clusters = Components.connectedComponents(e)
      val labeled = scored
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster"),
          col("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("score").desc, col("doc_id").asc)
      labeled
        .withColumn("rn", row_number().over(w))
        .withColumn("n_docs", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster")))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("doc_id").as("rep_id"),
          col("score").as("rep_score"), col("n_docs"))
    }
  }

  /** q77 — deterministic training-shard export (the global shuffle a
    * pretraining run applies after curation): shard = portable hash of
    * doc_id mod 8, within-shard order from an independent hash family.
    * The gate pins shard balance, token totals, AND the order-key range
    * per shard (min/max ord), proving both hash families reproduce. */
  val q77_shard_export = Q(
    "q77_shard_export",
    """WITH a AS (SELECT doc_id,
      |    ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard,
      |    ('0x' || substr(md5(cast(doc_id AS VARCHAR) || '#1'), 1, 15))::BIGINT AS ord,
      |    len(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, cast(sum(tok) AS BIGINT) AS n_tokens,
      |  min(ord) AS min_ord, max(ord) AS max_ord
      |FROM a GROUP BY shard""".stripMargin) { (s, dir) =>
    Corpus.shardAssign(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("long").as("tok")),
      "doc_id", nShards = 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
        min("ord").as("min_ord"), max("ord").as("max_ord"))
  }

  /** q79 — per-domain document cap (RefinedWeb/CCNet host-level guard):
    * keep the 5 highest-value docs per `source` (value = length, doc_id
    * tie-break), so no mirror-heavy domain dominates the corpus mixture.
    * One hash shuffle on the domain key; hot domains hit the same AQE
    * skew handling as ingest dedup (Corpus.domainCap scaladoc). */
  val q79_domain_cap = Q(
    "q79_domain_cap",
    """SELECT doc_id, source, n_chars FROM (
      |  SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 5""".stripMargin) { (s, dir) =>
    Corpus.domainCap(
      Tables.load(s, dir, "documents").select("doc_id", "source", "n_chars"),
      "source", cap = 5,
      priority = Seq(col("n_chars").desc, col("doc_id").asc))
  }

  /** q88 — leakage-free dataset split: documents are split train/val/test
    * as a pure function of their DUP-CLUSTER label (q60's connected
    * components on the Spark side; the oracle uses the fixture's dense-id
    * arithmetic shortcut for the same labels), so near-duplicates can
    * never straddle splits — the contamination channel a per-doc random
    * split leaves open. Both engines hash the identical cluster labels
    * through the portable md5 hash, so split membership is pinned
    * cross-engine, not just the sizes. */
  val q88_leakage_split = Q(
    "q88_leakage_split",
    """WITH c AS (SELECT doc_id,
      |    cast(doc_id - doc_id % 5 AS BIGINT) AS cluster FROM documents),
      |b AS (SELECT doc_id, cluster,
      |    CASE WHEN ('0x' || substr(md5(cluster::VARCHAR), 1, 15))::BIGINT % 10 = 8
      |        THEN 'val'
      |      WHEN ('0x' || substr(md5(cluster::VARCHAR), 1, 15))::BIGINT % 10 = 9
      |        THEN 'test'
      |      ELSE 'train' END AS split
      |  FROM c)
      |SELECT split, count(DISTINCT cluster) AS n_clusters, count(*) AS n_docs
      |FROM b GROUP BY split""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    // q60's dup-cluster labeling: chain edges inside each 5-block, general
    // connected-components computation (labels = block min id)
    val e = docs.select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
      .filter(col("src") % 5 =!= 4)
      .join(docs.select(col("doc_id").as("dst")), Seq("dst"))
    val labeled = docs
      .join(Components.connectedComponents(e).withColumnRenamed("id", "doc_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster"))
    Corpus.clusterSplit(labeled, "cluster")
      .groupBy("split")
      .agg(countDistinct("cluster").as("n_clusters"), count(lit(1)).as("n_docs"))
  }

  val all: Seq[Q] = Seq(
    q71_line_dedup, q72_bloom_decontam, q73_sequence_packing,
    q74_chunk_spans, q75_weighted_sample, q76_cluster_reps, q77_shard_export,
    q79_domain_cap, q88_leakage_split)
}
