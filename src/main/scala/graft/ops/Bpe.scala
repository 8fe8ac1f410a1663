package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE merge-loop TRAINER over word-token arrays — the full
  * iterative form of q85's single merge step (count pairs → merge the
  * argmax → repeat). Tokenizer training is exactly this loop; the
  * distributed part per step is ONE narrow adjacent-pair explode + ONE
  * hash-count shuffle carrying (left, right, 1) rows, plus a narrow
  * codegen'd merge projection (`MergeAdjacentPair`) — the same shapes at
  * 100 TB (a production trainer samples the corpus and caps pair
  * cardinality; both are plain filters on this lineage). Only the argmax
  * row (one pair + its count) rides to the driver per step.
  *
  * Determinism: the winning pair is argmax by (count DESC, left ASC,
  * right ASC) — a total order — and the merge pass is greedy
  * left-to-right non-overlapping, so the merge table is a pure function
  * of the corpus (gate-grade; the q95 oracle pins it).
  */
object Bpe {

  private val mergeSchema = StructType(Seq(
    StructField("step", IntegerType, false),
    StructField("left", StringType, false),
    StructField("right", StringType, false),
    StructField("n", LongType, false)))

  /** APPLY a trained merge table to a corpus — the tokenizer's encode
    * side: the merge passes run in training order (BPE's defining
    * invariant), each a narrow codegen'd projection, so applying m
    * merges is m stacked per-row passes with zero shuffles. */
  def applyMerges(toks: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(toks) { case (df, (l, r)) =>
      df.withColumn("tok",
        graft.functions.columns.mergeAdjacentPair(col("tok"), l, r))
    }

  /** Adjacent (left, right) pairs of a token-array column. */
  private def pairsOf(df: DataFrame): DataFrame =
    df.filter(size(col("tok")) >= 2)
      .select(explode(expr(
        "transform(slice(tok, 1, size(tok) - 1), (x, i) -> struct(x AS l, tok[i + 1] AS r))"))
        .as("p"))
      .select(col("p.l").as("left"), col("p.r").as("right"))

  /** Run `steps` merge iterations over `toks` (column `tok`:
    * array<string>); returns the merge table (step, left, right, n) —
    * the artifact a tokenizer ships. Stops early when no pair reaches
    * `minCount`. */
  def trainMerges(toks: DataFrame, steps: Int, minCount: Long = 2L): DataFrame = {
    require(steps > 0, s"steps=$steps must be positive")
    val spark = toks.sparkSession
    // cache the evolving corpus: each step reads it twice (count + merge);
    // per-step frames are released as soon as the next is materialized
    var cur = Balance(toks).select(col("tok")).cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val top = pairsOf(cur)
        .groupBy("left", "right")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("left").asc, col("right").asc)
        .limit(1)
        .collect()
      top.headOption match {
        case None => done = true // no pair frequent enough — converged
        case Some(r) =>
          val (l, rt, n) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += Row(step, l, rt, n)
          val next = cur
            .withColumn("tok",
              graft.functions.columns.mergeAdjacentPair(col("tok"), l, rt))
            .cache()
          next.count() // materialize so the old cache can release NOW
          cur.unpersist(blocking = false)
          cur = next
          step += 1
      }
    }
    cur.unpersist(blocking = false)
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(merges.toSeq: _*)),
      mergeSchema)
  }
}
