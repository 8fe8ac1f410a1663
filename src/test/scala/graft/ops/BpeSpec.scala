package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge-loop trainer: greedy non-overlapping merge semantics,
  * deterministic argmax tie-breaks, convergence stop.
  */
class BpeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("tok", ArrayType(StringType, true), true)))

  private def toks(rows: Seq[Seq[String]]) =
    mkDf(schema, rows.map(r => Row(r)): _*)

  test("merge pass is greedy left-to-right non-overlapping") {
    val out = toks(Seq(Seq("a", "a", "a")))
      .select(graft.functions.columns.mergeAdjacentPair(col("tok"), "a", "a"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("a a", "a")) // NOT three overlapping merges
  }

  test("trainer finds the hand-computed merge sequence") {
    // corpus: "x y" appears 3 times, "y z" twice (one occurrence consumed
    // by the step-1 merge), then ("x y", "z") twice in step 2
    val corpus = Seq(
      Seq("x", "y", "z"),
      Seq("x", "y", "z"),
      Seq("x", "y"),
      Seq("y", "z"))
    val m = Bpe.trainMerges(toks(corpus), steps = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "x", "y", 3L)))
    assert(m(1) == ((2, "x y", "z", 2L)))
    // after step 2 the corpus is [xyz, xyz, xy, yz]-shaped single/leftover
    // tokens: the only remaining adjacent pair ("y","z") occurs once < 2
    assert(m.length == 2, s"expected convergence after 2 merges, got ${m.toSeq}")
  }

  test("applyMerges replays training-order passes (encode side)") {
    val corpus = Seq(Seq("x", "y", "z"), Seq("y", "z"))
    val out = Bpe.applyMerges(toks(corpus), Seq(("x", "y"), ("x y", "z")))
      .collect().map(_.getSeq[String](0)).toSeq
    // first pass merges (x,y); second merges the RESULT with z — order
    // matters: applying ("x y", "z") first would be a no-op
    assert(out == Seq(Seq("x y z"), Seq("y", "z")))
  }

  test("argmax ties break by (left, right) ascending") {
    // "a b" and "b c" both occur twice; (a, b) < (b, c)
    val corpus = Seq(Seq("a", "b"), Seq("a", "b"), Seq("b", "c"), Seq("b", "c"))
    val m = Bpe.trainMerges(toks(corpus), steps = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(m.head == (("a", "b")))
  }

  test("null elements pass through unmerged; null array row is ignored") {
    val df = mkDf(schema, Row(Seq("a", null, "a", "a")), Row(null))
    val out = df.select(
      graft.functions.columns.mergeAdjacentPair(col("tok"), "a", "a"))
      .collect()
    assert(out(0).getSeq[String](0) == Seq("a", null, "a a"))
    assert(out(1).isNullAt(0))
  }
}
