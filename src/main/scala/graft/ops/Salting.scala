package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (brief: "skewed keys → salting or AQE
  * skew-join"). AQE's skew handling covers joins; SALTED AGGREGATION
  * covers the other hot path — a groupBy where one key holds a large
  * fraction of all rows (e.g. dedup on a default PK value, or event
  * counts for one viral user). Two-stage shape:
  *
  *   stage 1: group by (key, salt)  — the hot key's rows spread over
  *            `salts` partitions, partial results stay small
  *   stage 2: group by key          — combines `salts` partials per key
  *
  * Both stages are hash aggregations with map-side partials; total work
  * is unchanged, worst-partition size drops by ~`salts`.
  */
object Salting {

  /** Deterministic salt derived from stable row content (never rand() —
    * retries/speculative tasks must salt identically). */
  def saltFrom(c: Column, salts: Int): Column = pmod(hash(c), lit(salts))

  /** Salted distributed count per key. `saltSource` must be a column
    * that spreads the hot key's rows (e.g. the row's unique id). */
  def saltedCount(df: DataFrame, keyCol: String, saltSource: Column,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltFrom(saltSource, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("n"))

  /** Salted sum, same two-stage shape. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      saltSource: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltFrom(saltSource, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("total"))
}
