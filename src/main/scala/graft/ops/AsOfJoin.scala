package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-store primitive Spark lacks
  * natively: for each left row, the single latest right row with
  * `right.ts <= left.ts` per key (no future leakage).
  *
  * Implemented by composition (SURVEY §2 custom-operator preference (a)):
  * union both sides, one hash shuffle on the key, and a running
  * `last(ignoreNulls)` window — rights sort before lefts at equal ts so
  * at-or-before is inclusive. Never builds the range cross product; cost
  * is sort-within-key, identical to the dedup window's shape, so it
  * scales exactly like W1 at 100 TB (skewed keys → same mitigations).
  */
object AsOfJoin {

  /** @param rightVal right column whose latest value is attached (must be
    *                 non-null in right rows — nulls mean "no match")
    * @param as       output column name for the matched value */
  def lastAtOrBefore(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVal: String,
      as: String): DataFrame = {
    val rvType = right.schema(rightVal).dataType.sql
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__rv", lit(null).cast(rvType))
      .withColumn("__side", lit(1))
    val r = right.select(
      col(key), col(rightTs).as("__ts"), col(rightVal).as("__rv"),
      lit(0).as("__side"))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // __rv in the ordering: deterministic when several right rows share
    // (key, ts) — the largest value wins
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn(as, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq :+ col(as): _*)
  }
}
