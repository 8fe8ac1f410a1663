package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join: pairs of rows with the same key
  * whose timestamps lie within `windowSec` of each other.
  *
  * The naive formulation is a theta join (`|a.ts - b.ts| <= w`) — a
  * per-key cross product that explodes at scale. The scale-safe shape
  * bins timestamps into window-sized buckets, explodes ONE side to its
  * bucket ± 1, equi-joins on (key, bucket) — so Catalyst plans a hash
  * join — and applies the exact range predicate as a post-filter.
  * Candidate work is bounded by bucket occupancy, never |key group|².
  */
object RangeJoin {

  /** Self-pairs (a.id < b.id) within `windowSec`, as (key, a_id, b_id).
    * Microsecond-exact arithmetic keeps the predicate engine-portable. */
  def selfPairsWithin(df: DataFrame, key: String, tsCol: String,
      idCol: String, windowSec: Long): DataFrame = {
    val wUs = windowSec * 1000000L
    val base = df.select(col(key), col(idCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__b", expr(s"__us DIV $wUs"))
    val probe = base
      .withColumn("__pb", explode(array(col("__b") - 1, col("__b"), col("__b") + 1)))
      .select(col(key), col(idCol).as("a_id"), col("__us").as("a_us"), col("__pb"))
    val build = base.select(col(key), col(idCol).as("b_id"),
      col("__us").as("b_us"), col("__b"))
    probe.join(build, probe(key) === build(key) && col("__pb") === col("__b"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("a_us") - col("b_us")) <= wUs)
      .select(probe(key), col("a_id"), col("b_id"))
  }
}
