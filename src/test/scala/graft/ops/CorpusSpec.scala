package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators: line dedup semantics, Bloom filter
  * exactness (prefilter must equal the exact semi-join), distributed
  * prefix-sum packing vs the naive global window, chunk-span arithmetic,
  * weighted-sample determinism.
  */
class CorpusSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("text", StringType, true)))

  test("lineDedup drops corpus-repeated lines, keeps order, counts both sides") {
    val df = mkDf(docSchema,
      Row(1L, "alpha\nshared line\nbeta"),
      Row(2L, "shared line\ngamma"),
      Row(3L, "delta\nepsilon"),
      Row(4L, "")) // single empty line, unique only if no other doc is empty
    val out = Corpus.lineDedup(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha\nbeta", 2L, 1L)))      // shared line dropped, order kept
    assert(out(2L) == (("gamma", 1L, 1L)))
    assert(out(3L) == (("delta\nepsilon", 2L, 0L)))   // nothing repeated
    assert(out(4L) == (("", 1L, 0L)))                 // unique empty line survives
  }

  test("lineDedup with all lines dropped yields empty text, n_kept 0") {
    val df = mkDf(docSchema,
      Row(1L, "same"), Row(2L, "same"), Row(3L, "same"))
    val out = Corpus.lineDedup(df, "doc_id", "text").collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getString(1) == "" && r.getLong(2) == 0L && r.getLong(3) == 1L))
  }

  test("bloomBuild/bloomMightContain: no false negatives, measurable selectivity") {
    val members = (0L until 200L).map(i => i * 7919L + 13L).toArray
    val bits = Corpus.bloomBuild(members, mBits = 1 << 12, k = 3)
    val probe = mkDf(
      StructType(Seq(StructField("h", LongType, false))),
      ((members.toSeq ++ (100000L until 102000L).map(_ * 104729L)).map(Row(_))): _*)
    val pos = probe.filter(Corpus.bloomMightContain(col("h"), bits, 1 << 12, 3))
      .collect().map(_.getLong(0)).toSet
    assert(members.forall(pos.contains), "bloom dropped a true member (false negative)")
    // 4096 bits / 200 keys / k=3 → fp rate ~2%; allow generous slack
    assert(pos.size - members.length < 400,
      s"bloom passed ${pos.size - members.length} of 2000 non-members — filter is not filtering")
  }

  test("bloomDecontaminate equals the exact semi-join") {
    val mk = (ids: Seq[(Long, Long)]) => mkDf(
      StructType(Seq(StructField("doc_id", LongType, false),
        StructField("h", LongType, false))),
      ids.map { case (d, h) => Row(d, h) }: _*)
    val corpus = mk(Seq(10L -> 1L, 10L -> 2L, 10L -> 2L, 11L -> 3L, 12L -> 4L, 12L -> 1L))
    val bench = mk(Seq(0L -> 1L, 0L -> 2L, 1L -> 9L))
    val got = Corpus.bloomDecontaminate(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact: doc 10 shares {1,2}, doc 12 shares {1}; doc 11 clean
    assert(got == Map(10L -> 2L, 12L -> 1L))
  }

  test("globalTokenOffsets/packSequences match the naive global window") {
    val rows = (1L to 500L).map(i => Row(i, (i * 2654435761L % 97L) + 1L))
    val docs = mkDf(StructType(Seq(StructField("id", LongType, false),
      StructField("tok", LongType, false))), rows: _*).repartition(7)
    val naive = docs
      .withColumn("__start",
        sum("tok").over(org.apache.spark.sql.expressions.Window.orderBy("id")) - col("tok"))
      .select("id", "__start").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Corpus.globalTokenOffsets(docs, "id", "tok", numParts = 5)
      .select("id", "__start").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == naive)

    val packed = Corpus.packSequences(docs, "id", "tok", budget = 256L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // sequences partition the docs: doc counts and token sums add back up
    assert(packed.values.map(_._1).sum == 500L)
    assert(packed.values.map(_._2).sum == rows.map(_.getLong(1)).sum)
    // every doc's first token lands in its sequence's budget window
    val seqOf = naive.map { case (id, st) => id -> st / 256L }
    assert(seqOf.values.toSet == packed.keySet)
  }

  test("chunkSpans covers every token, stride arithmetic exact") {
    val docs = mkDf(StructType(Seq(StructField("id", LongType, false),
      StructField("tok", IntegerType, false))),
      Row(1L, 100), Row(2L, 32), Row(3L, 33), Row(4L, 1), Row(5L, 24))
    val out = Corpus.chunkSpans(docs, "id", "tok", window = 32, stride = 24)
      .groupBy("id").agg(count(lit(1)).as("n"), max(col("start") + col("n_chunk_tokens")).as("hi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((5L, 100L)))  // starts 0,24,48,72,96; last chunk 4 tokens
    assert(out(2L) == ((2L, 32L)))   // 0 (full) + 24 (8 tokens)
    assert(out(3L) == ((2L, 33L)))
    assert(out(4L) == ((1L, 1L)))
    assert(out(5L) == ((1L, 24L)))   // stride == n → single chunk
  }

  test("chunkText slices match chunkSpans arithmetic and reassemble the doc") {
    val docs = mkDf(docSchema, Row(1L, (1 to 10).map("t" + _).mkString(" ")))
    val out = Corpus.chunkText(docs, "doc_id", "text", window = 4, stride = 4)
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(out.toSeq == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    // non-overlapping stride == window ⇒ concatenation restores the doc
    assert(out.mkString(" ") == (1 to 10).map("t" + _).mkString(" "))
    val overlapped = Corpus.chunkText(docs, "doc_id", "text", window = 4, stride = 2)
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(overlapped.head == "t1 t2 t3 t4" && overlapped(1) == "t3 t4 t5 t6")
  }

  test("writeShards: deterministic assignment, complete, balanced-ish") {
    val docs = mkDf(docSchema, (1L to 400L).map(i => Row(i, s"doc $i")): _*)
    val out = java.nio.file.Files.createTempDirectory("shards_").toString
    val manifest = Corpus.writeShards(docs, "doc_id", nShards = 8, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.keySet == (0L until 8L).toSet)
    assert(manifest.values.sum == 400L)
    assert(manifest.values.min > 20L, s"pathological shard skew: $manifest")
    // same input ⇒ same assignment (reproducible export)
    val again = Corpus.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = Corpus.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first)
    // the within-shard ord order must actually reach the files (a bare
    // ord-sort is eliminated by the partitioned write's own shard-sort)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { dir =>
      dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val ords = spark.read.parquet(f.getAbsolutePath)
          .select("ord").collect().map(_.getLong(0)).toSeq
        assert(ords == ords.sorted, s"${f.getName} rows not in ord order")
      }
    }
  }

  test("globalTokenOffsets with duplicate order keys keeps the tape length exact") {
    val docs = mkDf(StructType(Seq(StructField("k", LongType, false),
      StructField("tok", LongType, false))),
      (1L to 100L).map(i => Row(i / 10, 5L)): _*) // ten docs per key value
    val offs = Corpus.globalTokenOffsets(docs, "k", "tok", numParts = 4)
      .select("__start").collect().map(_.getLong(0)).sorted
    // ROWS frame: starts are exactly 0,5,10,...,495 — the RANGE default
    // would give every peer the same cum and double-count the tape
    assert(offs.toSeq == (0L until 100L).map(_ * 5L))
  }

  test("chunkSpans/chunkText emit no chunks for zero-token docs") {
    val spans = Corpus.chunkSpans(
      mkDf(StructType(Seq(StructField("id", LongType, false),
        StructField("tok", IntegerType, true))), Row(1L, 0), Row(2L, null), Row(3L, 3)),
      "id", "tok", window = 4, stride = 2).collect()
    assert(spans.map(_.getLong(0)).toSet == Set(3L))
  }

  test("lineDedup keeps NULL-text docs as empty rather than dropping them") {
    val out = Corpus.lineDedup(
      mkDf(docSchema, Row(1L, null), Row(2L, "x")), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(2L) == (("x", 1L)))
  }

  test("lineDedup with maxOcc=MaxValue is an identity on counts") {
    val df = mkDf(docSchema,
      Row(1L, "a\nb\na"), Row(2L, "a\nc"))
    val out = Corpus.lineDedup(df, "doc_id", "text", maxOcc = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a\nb\na", 3L, 0L)))
    assert(out(2L) == (("a\nc", 2L, 0L)))
  }

  test("packSequences treats NULL token counts as 0 (no null seq_id, no NPE)") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("tok", LongType, true)))
    val docs = mkDf(schema,
      Row(1L, 10L), Row(2L, null), Row(3L, 10L), Row(4L, null), Row(5L, 5L))
    val out = Corpus.packSequences(docs, "doc_id", "tok", budget = 20L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // tape: d1@0(10) d2@10(0) d3@10(10) d4@20(0) d5@20(5) → seq0 {1,2,3}, seq1 {4,5}
    assert(out.keySet == Set(0L, 1L), s"unexpected seq ids: ${out.keySet}")
    assert(out(0L) == ((3L, 20L)) && out(1L) == ((2L, 5L)))
  }

  test("lineDedup joins survivors with the caller's delimiter") {
    val df = mkDf(docSchema,
      Row(1L, "keep1|shared|keep2"), Row(2L, "shared|only"))
    val out = Corpus.lineDedup(df, "doc_id", "text",
      delimRegex = "\\|", joinDelim = "|").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "keep1|keep2") // original delimiter preserved
    assert(out(2L) == "only")
  }

  test("domainCap keeps at most cap docs per domain, priority-ordered") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("host", StringType, false),
      StructField("len", LongType, false)))
    val docs = mkDf(schema,
      (1L to 10L).map(i => Row(i, "big.com", i * 10)) ++
        Seq(Row(100L, "small.org", 5L)): _*)
    val out = Corpus.domainCap(docs, "host", cap = 3,
      priority = Seq(col("len").desc, col("doc_id").asc)).collect()
    val byHost = out.groupBy(_.getString(1))
    // top-3 by length for the hot host; the under-cap host is untouched
    assert(byHost("big.com").map(_.getLong(0)).sorted.toSeq == Seq(8L, 9L, 10L))
    assert(byHost("small.org").map(_.getLong(0)).toSeq == Seq(100L))
    assert(out.length == 4)
    assertThrows[IllegalArgumentException](
      Corpus.domainCap(docs, "host", cap = 0, priority = Seq(col("len"))))
  }

  test("weightedSample is deterministic and favors heavy docs") {
    val docs = mkDf(StructType(Seq(StructField("doc_id", LongType, false),
      StructField("w", LongType, false))),
      (1L to 400L).map(i => Row(i, if (i <= 200) 1000L else 1L)): _*)
    val a = Corpus.weightedSample(docs, "doc_id", "w", 50).collect().map(_.getLong(0)).toSet
    val b = Corpus.weightedSample(docs, "doc_id", "w", 50).collect().map(_.getLong(0)).toSet
    assert(a == b, "same inputs must select the same sample")
    val heavy = a.count(_ <= 200L)
    assert(heavy > 40, s"only $heavy of 50 sampled docs are from the 1000x-weighted half")
  }
}
