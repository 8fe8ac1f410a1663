package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators not fully exercised by the oracle gate, plus
  * O3's native df.sample form (seeded: deterministic within Spark).
  */
class TextAnalysisSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, false), StructField("text", StringType, true)))

  test("rollingFingerprint: order-sensitive, stable, bounded to 32 bits") {
    val df = mkDf(schema, Row(1L, "a b c"), Row(2L, "c b a"), Row(3L, "a b c"))
      .select(col("id"), TextHash.tokens(col("text")).as("tok"))
      .withColumn("hs",
        expr("transform(tok, t -> cast(conv(substring(md5(t),1,15),16,10) as bigint))"))
      .select(col("id"), TextAnalysis.rollingFingerprint("hs").as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(3L))      // same order -> same fingerprint
    assert(fp(1L) !== fp(2L))      // reversed order -> different (bag ops wouldn't see this)
    assert(fp.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("redactPii: email/IP/phone replaced everywhere, clean text untouched") {
    val df = mkDf(schema,
      Row(1L, "mail a.b+c@ex-1.org and d@e.io, host 192.168.0.1, call +1 (555) 123-4567"),
      Row(2L, "no pii here, just v1.2 and the year 1995"),
      Row(3L, null),
      Row(4L, "revenue grew from 2019-2020, up 1 000 000 units; bare 555-000-4321"),
      Row(5L, "ts 1691234567890 and order 12345678901234 stay intact"))
      .select(col("id"), TextAnalysis.redactPii(col("text")).as("red"))
    val red = df.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(red(1L).get === "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE>")
    assert(red(2L).get === "no pii here, just v1.2 and the year 1995")
    assert(red(3L).isEmpty) // null propagates, never throws
    // year ranges and spaced quantities are NOT phones; a bare 3-3-4 is
    assert(red(4L).get === "revenue grew from 2019-2020, up 1 000 000 units; bare <PHONE>")
    // solid digit runs (epoch millis, order ids) are never half-redacted:
    // mandatory group separators forbid mid-run matches
    assert(red(5L).get === "ts 1691234567890 and order 12345678901234 stay intact")
  }

  test("markerCount counts literal occurrences by length arithmetic") {
    val df = mkDf(schema, Row(1L, "<IP> x <IP> y <EMAIL>"), Row(2L, "none"))
      .select(col("id"),
        TextAnalysis.markerCount(col("text"), "<IP>").as("n_ip"),
        TextAnalysis.markerCount(col("text"), "<EMAIL>").as("n_em"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m === Map(1L -> ((2L, 1L)), 2L -> ((0L, 0L))))
  }

  test("dupBigramRatio: 0 for all-distinct bigrams, rises with repetition") {
    val df = mkDf(schema,
      Row(1L, "a b c d e"),             // 4 bigrams, all distinct
      Row(2L, "a b a b a b"),           // 5 bigrams, 2 distinct
      Row(3L, "x y"))                   // single bigram
      .select(col("id"), TextHash.tokens(col("text")).as("tok"))
      .select(col("id"), TextAnalysis.dupBigramRatio("tok").as("rep"))
    val rep = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(1L) === 0.0)
    assert(rep(2L) === 0.6) // 1 - 2/5
    assert(rep(3L) === 0.0)
  }

  test("langId picks the dominant stopword profile; und below floor") {
    val df = mkDf(schema,
      Row(1L, "the cat and the dog of a house"),
      Row(2L, "der hund und die katze und das haus"),
      Row(3L, "xyzzy qwerty asdf"))
      .select(col("id"), TextAnalysis.langId(TextHash.tokens(col("text"))).as("l"))
    val l = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(l === Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("qualityScore in [0,1]; diverse long text beats repetitive stopword text") {
    val good = (1 to 120).map(i => s"tok$i").mkString(" ")
    val bad = Seq.fill(40)("the a").mkString(" ")
    val df = mkDf(schema, Row(1L, good), Row(2L, bad))
      .select(col("id"), TextAnalysis.qualityScore(TextHash.tokens(col("text"))).as("q"))
    val q = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("O3: native df.sample with seed is deterministic and proportionate") {
    val df = spark.range(10000).toDF("id")
    val a = df.sample(withReplacement = false, 0.1, seed = 7).collect().map(_.getLong(0))
    val b = df.sample(withReplacement = false, 0.1, seed = 7).collect().map(_.getLong(0))
    assert(a.toSeq === b.toSeq)           // seeded -> reproducible
    assert(a.length > 700 && a.length < 1300) // ~10%
  }

  test("zlib canary: the deflate output q89's golden ratios were derived on") {
    // q89's oracle pins corpus_ratio goldens produced by the JDK
    // Deflater at level 6. Deflate output is deterministic for a given
    // zlib build but NOT across builds, so a JDK upgrade can flip the
    // q89 gate with zero code change. This canary pins one known
    // deflate result: if IT fails while the operator logic is untouched,
    // the cause is zlib drift — re-derive the q89 golden VALUES — not a
    // regression in compressionRatio.
    val canary = "the quick brown fox jumps over the lazy dog " * 8
    val schema = StructType(Seq(
      StructField("id", LongType, false), StructField("text", StringType, true)))
    val out = TextAnalysis.compressionRatio(
      mkDf(schema, Row(1L, canary)), "id", "text").collect().head
    assert(out.getInt(1) === 352)
    assert(out.getInt(2) === 56,
      "zlib drift: the JDK's deflate byte count changed — re-derive the " +
        "q89 golden corpus_ratio VALUES (this is environment, not a code bug)")
  }

  test("rareTokenFlags: corpus-relative rarity, exact integer threshold") {
    // LM over the whole corpus: "the"x4, "cat"x2, "dog"x2, singletons
    // "sat","mat","ran","xq","zz","qqq". minCount=2: singletons are rare.
    val docs = mkDf(schema,
      Row(1L, "the cat sat"),        // rare: sat -> 1/3 (33% > 25 -> flag)
      Row(2L, "the cat mat"),        // rare: mat -> 1/3 flag
      Row(3L, "the dog ran"),        // rare: ran -> 1/3 flag
      Row(4L, "the dog"),            // rare: 0/2 -> clean
      Row(5L, "xq zz qqq"))          // rare: 3/3 flag
    val out = TextAnalysis.rareTokenFlags(docs, "id", "text",
      minCount = 2L, ratioPct = 25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((3L, 1L, true)))
    assert(out(2L) === ((3L, 1L, true)))
    assert(out(3L) === ((3L, 1L, true)))
    assert(out(4L) === ((2L, 0L, false)))
    assert(out(5L) === ((3L, 3L, true)))
    // the threshold is exact cross-multiplication: 1/3 at exactly 34%
    // does NOT flag (100 > 102 false), at 33% it DOES (100 > 99)
    val edge = TextAnalysis.rareTokenFlags(docs, "id", "text", 2L, 34)
      .filter(col("id") === 1L).head
    assert(!edge.getBoolean(3))
  }

  test("rareTokenFlagsBroadcast == rareTokenFlags (common-set inversion " +
      "is exact), plans map-side, and overflows the budget crisply") {
    // a corpus where common/rare straddle minCount exactly (counts 1, 2,
    // 3) so any off-by-one in the inversion (miss == rare iff c <
    // minCount) flips a flag
    val docs = mkDf(schema,
      Row(1L, "the cat sat"), Row(2L, "the cat mat"),
      Row(3L, "the dog ran"), Row(4L, "the dog"),
      Row(5L, "xq zz qqq"), Row(6L, ""), Row(7L, null))
    for (minCount <- Seq(1L, 2L, 3L, 4L); pct <- Seq(0, 25, 33, 34, 100)) {
      val exact = TextAnalysis.rareTokenFlags(docs, "id", "text",
        minCount, pct).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      val bcast = TextAnalysis.rareTokenFlagsBroadcast(docs, "id", "text",
        minCount, pct).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert(bcast === exact, s"minCount=$minCount pct=$pct")
    }
    // the production plan: the flag pass joins the common set BROADCAST —
    // no shuffle of token occurrences on the token key anywhere in the
    // flag-side plan (the only exchange left is the per-doc partial agg)
    val plan = TextAnalysis.rareTokenFlagsBroadcast(docs, "id", "text", 2L, 25)
      .queryExecution.executedPlan
    def findShuffles(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findShuffles(a.executedPlan)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        Seq(e.outputPartitioning.toString) ++ e.children.flatMap(findShuffles)
      case other => other.children.flatMap(findShuffles) ++
        other.subqueries.flatMap(findShuffles)
    }
    val shuffles = findShuffles(plan)
    assert(!shuffles.exists(_.contains("__tok")),
      s"flag pass still shuffles on the token key: $shuffles")
    // budget overflow fails crisply with the remedies, never silently
    val e = intercept[IllegalStateException] {
      TextAnalysis.rareTokenFlagsBroadcast(docs, "id", "text",
        minCount = 1L, ratioPct = 25, maxCommonTokens = 3)
    }
    assert(e.getMessage.contains("minCount"), e.getMessage)
    assert(e.getMessage.contains("rareTokenFlags"), e.getMessage)
  }
}
