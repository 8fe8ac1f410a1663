package graft.functions

import graft.SparkSpec
import graft.ops.TextHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native text-hash expressions vs the composable HOF/md5-hex forms:
  * identical values (the portability contract the DuckDB oracle relies
  * on), edge cases, codegen. */
class TextHashOpsSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "áé ñ unicode tokens räksmörgås 日本語 mixed in"),
      (4L, "one two three"),
      (5L, "single")
    ).toDF("id", "text").withColumn("tok", TextHash.tokens(col("text")))
  }

  test("shingle hashes native == md5-hex chain (mod32 and 60-bit)") {
    // the HOF chain needs size(tok) >= n (ANSI array index); the native
    // form handles short docs itself (empty array, separate test below)
    val hof = docs.filter(size(col("tok")) >= 3)
      .withColumn("sh", TextHash.shingles("tok", 3))
      .withColumn("hof", TextHash.shingleHashes("sh"))
    val both = hof.withColumn("nat",
      columns.shingleHashes(col("tok"), 3, mod32 = true))
    assert(both.filter(expr("hof != nat")).count() === 0)
    // 60-bit single-token form vs direct md5 conv
    val h60 = docs
      .withColumn("hof",
        expr("transform(tok, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
      .withColumn("nat", columns.shingleHashes(col("tok"), 1, mod32 = false))
    assert(h60.filter(expr("hof != nat")).count() === 0)
  }

  test("minhash signature native == HOF permutation minima") {
    val base = docs.filter(size(col("tok")) >= 3)
      .withColumn("hs", columns.shingleHashes(col("tok"), 3, mod32 = true))
    val both = base
      .withColumn("hof", TextHash.minhashSignature("hs", 8))
      .withColumn("nat", columns.minhashSig(col("hs"), 8,
        TextHash.minhashP, TextHash.minhashABase, TextHash.minhashBBase))
    assert(both.filter(expr("hof != nat")).count() === 0)
  }

  test("simhash native == per-bit aggregate votes") {
    val base = docs
      .withColumn("hs", columns.shingleHashes(col("tok"), 1, mod32 = false))
    val both = base
      .withColumn("hof", TextHash.simhash("hs", 16))
      .withColumn("nat", columns.simhash(col("hs"), 16))
    assert(both.filter(expr("hof != nat")).count() === 0)
  }

  test("fewer tokens than n yields empty hash array") {
    val out = docs.filter(col("id") === 5L)
      .select(columns.shingleHashes(col("tok"), 3, mod32 = true).as("h"))
      .collect()
    assert(out.head.getSeq[Long](0).isEmpty)
  }
}
