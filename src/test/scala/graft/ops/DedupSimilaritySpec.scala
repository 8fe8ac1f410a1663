package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-data operators: exact/fuzzy dedup and ANN behave as specified on
  * small controlled corpora (the oracle-hash queries q30-q35 check engine
  * parity; these check semantics).
  */
class DedupSimilaritySpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("id", LongType, false), StructField("text", StringType, true)))

  test("exact dedup: whitespace/case variants collapse, min id kept") {
    val df = mkDf(docSchema,
      Row(1L, "Hello  World"), Row(2L, "hello world"), Row(3L, " HELLO WORLD "),
      Row(4L, "different"))
    val out = Dedup.exact(df, "id", "text").orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 3L), (4L, 1L)))
  }

  test("minhash LSH: identical docs collide in every band; disjoint docs don't") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (31 to 60).map(i => s"w$i").mkString(" ")
    val df = mkDf(docSchema, Row(1L, words), Row(2L, words), Row(3L, other))
    val pairs = Dedup.minhashCandidates(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((1L, 2L)))
  }

  test("pq ANN: codebook members reconstruct exactly; non-members snap to nearest") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, false),
      StructField("embedding", ArrayType(DoubleType, false), false)))
    val members = Seq(
      Row(1L, Seq(1.0, 0.0, 0.0, 0.0)), Row(2L, Seq(0.0, 1.0, 0.0, 0.0)),
      Row(3L, Seq(0.0, 0.0, 1.0, 1.0)), Row(4L, Seq(1.0, 1.0, 1.0, 0.0)))
    // non-member: subspace (0.9, 0.1) snaps to (1,0) [cid 1]; (0,0) ties
    // cids 1 and 2 -> min cid; reconstruction = (1,0,0,0)
    val corpus = mkDf(schema, (members :+ Row(9L, Seq(0.9, 0.1, 0.0, 0.0))): _*)
    val cbs = Similarity.pqCodebooks(
      mkDf(schema, members: _*), "vec_id", "embedding", m = 2, dsub = 2, ks = 4)
    val q = corpus.filter(col("vec_id") === 1L)
    val scope = new CacheScope
    val out = Similarity.pqTopK(corpus, q, cbs, "vec_id", "embedding", k = 4,
        scope = scope)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    // ADC scores vs (1,0,0,0): v4 -> 1, v9 (recon (1,0,0,0)) -> 1 (tie,
    // nid asc), v2 -> 0, v3 -> 0 (tie, nid asc)
    assert(out == Seq((1, 4L), (2, 9L), (3, 2L), (4, 3L)))
    assert(scope.size === 3, "m encode broadcasts + the ADC table broadcast owned")
    scope.release() // broadcasts unpersist with the caches
    assert(scope.size === 0)
  }

  test("pq ADC plan is O(1) in m·ks·dsub at ks=256 and codegen'd") {
    // production-shaped codebooks: ks=256 × m=4 × dsub=8 = 8192 doubles.
    // The old typedLit-map ADC embedded all of them as plan literals; the
    // broadcast AdcScore kernel must keep the plan tree bounded. dim=32
    // (not larger) so the synthetic array-building cast chain stays under
    // the session's codegen.hugeMethodLimit — the fixture must not evict
    // the stage from codegen before the kernel is even measured.
    val dim = 32
    val corpus = spark.range(300).select(col("id").as("vec_id"),
      array((0 until dim).map(i =>
        ((col("id") * 13 + lit(i)) % 19).cast("double")): _*).as("embedding"))
    val cbs = Similarity.pqCodebooks(
      corpus, "vec_id", "embedding", m = 4, dsub = 8, ks = 256)
    val q = corpus.filter(col("vec_id") === 7L)
    val out = Similarity.pqTopK(corpus, q, cbs, "vec_id", "embedding", k = 3)
    // materialize FIRST — via collect(), which executes THIS
    // queryExecution (count() would build its own): under AQE the codegen
    // stage markers only appear on the final adaptive plan
    assert(out.collect().length === 3)
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.length < 40000,
      s"plan string is ${planStr.length} chars — ADC LUTs are leaking into the plan")
    assert(planStr.contains("adc_score"))
    assert(planStr.linesIterator.exists(l =>
      l.contains("adc_score") && l.trim.stripPrefix("+- ").startsWith("*(")),
      "ADC scoring must stay inside whole-stage codegen; plan:\n" +
        planStr.linesIterator.map(_.take(120)).mkString("\n"))
  }

  test("CacheScope: operator caches release once the result materializes") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = mkDf(docSchema, Row(1L, words), Row(2L, words), Row(3L, "x " * 20))
    val scope = new CacheScope
    val pairs = Dedup.minhashCandidates(df, "id", "text", scope = scope)
    pairs.collect() // materialize — caches are live and owned
    val owned = scope.frames
    assert(owned.size === 2, "band table + occupancy join should be owned")
    assert(owned.forall(_.storageLevel.useMemory), "caches live before release")
    scope.release()
    assert(owned.forall(_.storageLevel === org.apache.spark.storage.StorageLevel.NONE),
      "release() must unpersist every owned cache")
    assert(scope.size === 0)
    // the unmanaged default tracks nothing (session-lifetime behavior)
    assert(CacheScope.unmanaged.size === 0)
  }

  test("minhash LSH hot bucket: star pairs, linear in occupancy, connectivity kept") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    // 200 identical docs: every band bucket has occupancy 200 (> cap 64)
    val rows = (1L to 200L).map(i => Row(i, words))
    val df = mkDf(docSchema, rows: _*)
    val pairs = Dedup.minhashCandidates(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // star around the min-id representative: 199 pairs, not C(200,2)=19900
    assert(pairs.length === 199)
    assert(pairs.forall(_._1 == 1L))
    assert(pairs.map(_._2).sorted === (2L to 200L))
    // below the cap the clique semantics are unchanged
    val small = mkDf(docSchema, (1L to 10L).map(i => Row(i, words)): _*)
    val cliq = Dedup.minhashCandidates(small, "id", "text").count()
    assert(cliq === 45) // C(10,2)
  }

  test("incremental dedup == full-corpus candidates restricted to cross pairs") {
    import graft.ops.TextHash.tokens
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (31 to 60).map(i => s"w$i").mkString(" ")
    val corpus = mkDf(docSchema, Row(1L, words), Row(2L, other), Row(3L, words))
    val shard = mkDf(docSchema, Row(10L, words), Row(11L, "zz " * 20))
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), tokens(col("text")).as("tok"))
    val incr = Dedup.incrementalCandidates(toks(shard), Dedup.bandTable(toks(corpus)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // shard doc 10 duplicates corpus docs 1 and 3; doc 11 matches nothing
    assert(incr === Set((10L, 1L), (10L, 3L)))
    // parity with the full pipeline: its cross-boundary pairs, reoriented
    val full = Dedup.minhashCandidates(
        corpus.unionByName(shard), "id", "text", maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a >= 10L) != (b >= 10L) }
      .map { case (a, b) => if (a >= 10L) (a, b) else (b, a) }.toSet
    assert(incr === full)
  }

  test("incremental dedup hot corpus bucket: rep pair only, linear in occupancy") {
    import graft.ops.TextHash.tokens
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    // 100 identical corpus docs: every bucket occupancy 100 > cap 64
    val corpus = mkDf(docSchema, (1L to 100L).map(i => Row(i, words)): _*)
    val shard = mkDf(docSchema, Row(500L, words))
    def toks(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), tokens(col("text")).as("tok"))
    val pairs = Dedup.incrementalCandidates(toks(shard), Dedup.bandTable(toks(corpus)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((500L, 1L))) // only the min-id representative
  }

  test("repeatedSpanCoverage: interval-union arithmetic on shared prefixes") {
    import graft.ops.TextHash.tokens
    val shared = (1 to 10).map(i => s"t$i")
    val d1 = (shared ++ (11 to 20).map(i => s"x$i")).mkString(" ")
    val d2 = (shared ++ (11 to 20).map(i => s"y$i")).mkString(" ")
    val d3 = ((1 to 8) ++ (1 to 8)).map(i => s"v$i").mkString(" ") // 8-span twice
    val d4 = (21 to 40).map(i => s"z$i").mkString(" ")             // no repeats
    val df = mkDf(docSchema, Row(1L, d1), Row(2L, d2), Row(3L, d3), Row(4L, d4))
      .select(col("id"), tokens(col("text")).as("tok"))
    val cov = Dedup.repeatedSpanCoverage(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // docs 1/2: 10-token shared prefix -> grams at 3 positions, union = 10;
    // doc 3: identical grams at p0 and p8, union = 8 + 8 = whole doc;
    // doc 4 has no repeated span and is absent
    assert(cov === Map(1L -> 10L, 2L -> 10L, 3L -> 16L))
  }

  test("simhash: identical token bags share fingerprints") {
    val df = mkDf(docSchema, Row(1L, "a b c d e f g h"), Row(2L, "a b c d e f g h"),
      Row(3L, "q r s t u v w x"))
    val fp = Dedup.simhashFingerprints(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("jaccard: exact overlap arithmetic on distinct token sets") {
    val df = mkDf(docSchema, Row(1L, "a b c d"), Row(2L, "x"))
      .filter(col("id") === 1L)
      .select(Dedup.jaccard(
        split(col("text"), " "), array(lit("a"), lit("b"))).as("j"))
    assert(df.collect()(0).getDouble(0) === 0.5) // |{a,b}| / |{a,b,c,d}|
  }

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType, false),
    StructField("embedding", ArrayType(FloatType), true)))

  private def vec(xs: Double*) = xs.map(_.toFloat)

  test("brute-force ANN: rank 1 is the true nearest neighbor by cosine") {
    val df = mkDf(vecSchema,
      Row(0L, vec(1, 0, 0)), Row(1L, vec(0.9, 0.1, 0)),
      Row(2L, vec(0, 1, 0)), Row(3L, vec(-1, 0, 0)))
    val out = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 0L),
      "vec_id", "embedding", 3).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
  }

  test("IVF ANN with exhaustive probe equals brute force exactly") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 60L).map(i => Row(i, vec(Seq.fill(8)(rnd.nextGaussian()): _*)))
    val df = mkDf(vecSchema, rows: _*)
    val q = df.filter(col("vec_id") < 3L)
    val cent = df.filter(col("vec_id") >= 55L) // 5 centroids
    // probing EVERY list makes IVF an exact search — results must match
    val ivf = Similarity.ivfTopK(df, q, cent, "vec_id", "embedding", k = 5, nprobe = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf === brute)
  }

  test("IVF recall curve: monotone non-decreasing in nprobe, 1.0 at nprobe=nlists") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 80L).map(i => Row(i, vec(Seq.fill(8)(rnd.nextGaussian()): _*)))
    val df = mkDf(vecSchema, rows: _*)
    val q = df.filter(col("vec_id") < 4L)
    val cent = df.filter(col("vec_id") >= 72L) // 8 centroids
    val exact = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recalls = Seq(1, 2, 4, 8).map { np =>
      val hits = Similarity.ivfTopK(df, q, cent, "vec_id", "embedding",
        k = 10, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        .intersect(exact).size
      np -> hits.toDouble / exact.size
    }
    // probing a superset of lists can only add candidates → recall is
    // monotone; probing ALL lists is exhaustive search → recall pins to 1
    recalls.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (nprobe=$np1) to $r2 (nprobe=$np2)")
    }
    assert(recalls.last._2 === 1.0, "exhaustive probe must recover the exact ranking")
  }

  test("int8 quantization: codes bounded, scale-invariant, zero-safe, recall high") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 40L).map(i => Row(i, vec(Seq.fill(8)(rnd.nextGaussian()): _*))) :+
      Row(40L, vec(0, 0, 0, 0, 0, 0, 0, 0))
    val df = mkDf(vecSchema, rows: _*)
    val quant = df.select(col("vec_id"),
      Similarity.quantizeInt8(col("embedding").cast("array<double>")).as("qv"))
    val codes = quant.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, qv) <- codes) {
      assert(qv.forall(x => x == math.floor(x)), s"non-integer code for $id")
      assert(qv.forall(x => x >= -127.0 && x <= 127.0), s"code out of range for $id")
      if (id < 40L) assert(qv.exists(x => math.abs(x) == 127.0),
        s"max component of $id must hit +-127")
    }
    assert(codes(40L).forall(_ == 0.0)) // zero vector -> zero codes, no NaN
    // top-1 neighbor survives quantization for every query (int8 on
    // 8-dim gaussians: quantization error ~0.4% per component)
    val q = df.filter(col("vec_id") < 5L)
    val exact = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = Similarity.bruteForceTopK(
        quant, quant.filter(col("vec_id") < 5L), "vec_id", "qv", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact === approx)
  }

  test("two-stage ANN with full-corpus shortlist equals brute force exactly") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 40L).map(i => Row(i, vec(Seq.fill(8)(rnd.nextGaussian()): _*)))
    val df = mkDf(vecSchema, rows: _*)
    val q = df.filter(col("vec_id") < 3L)
    // shortlist covers the whole corpus -> the coarse stage filters
    // nothing and the exact rerank must reproduce brute force
    val ts = Similarity.projectedRerankTopK(df, q, "vec_id", "embedding",
        k = 5, projDim = 4, shortlist = 39, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ts === brute)
  }

  test("LSH ANN: results are a subset of brute-force, same relative order") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i => Row(i, vec(Seq.fill(8)(rnd.nextGaussian()): _*)))
    val df = mkDf(vecSchema, rows: _*)
    val q = df.filter(col("vec_id") < 2L)
    val brute = Similarity.bruteForceTopK(df, q, "vec_id", "embedding", 39)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._3).map(_._2).toSeq }
    val lsh = Similarity.lshTopK(df, q, "vec_id", "embedding", 10, bits = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    for ((qid, rank, nid) <- lsh) {
      val bruteOrder = brute(qid)
      assert(bruteOrder.contains(nid))
      // LSH ranks must preserve brute-force relative order within the bucket
      val prev = lsh.filter(t => t._1 == qid && t._2 < rank).map(_._3)
      for (p <- prev) assert(bruteOrder.indexOf(p) < bruteOrder.indexOf(nid))
    }
  }
}
