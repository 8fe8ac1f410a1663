package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q53's session-gap rule at the 30-minute boundary: the comparison is
  * microsecond-exact (unix_micros), matching the oracle's
  * `> INTERVAL 30 MINUTE`. A cast-to-long (whole-second truncation)
  * would misclassify sub-second gaps around the boundary — the round-2
  * advice regression this pins down. */
class SessionGapSpec extends SparkSpec {

  test("gap classification at the 1800s boundary with sub-second components") {
    val schema = StructType(Seq(
      StructField("user_id", LongType, false),
      StructField("event_id", LongType, false),
      StructField("ts", TimestampType, false)))
    def ts(micros: Long) = new java.sql.Timestamp(micros / 1000) {
      setNanos(((micros % 1000000) * 1000).toInt)
    }
    val base = 1700000000000000L // micros
    val df = mkDf(schema,
      Row(1L, 1L, ts(base)),
      Row(1L, 2L, ts(base + 1800000000L)),      // exactly 30 min -> SAME session
      Row(1L, 3L, ts(base + 3600000001L)),      // 1800.000001s after #2 -> NEW session
      Row(2L, 4L, ts(base)),
      Row(2L, 5L, ts(base + 1799999999L)))      // 1µs under -> SAME session
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val out = df
      .withColumn("new_s",
        when(lag("ts", 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_s").over(w))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
    // the truncating form would (wrongly) call event #3 same-session:
    // floor-second gap = 1800 which is NOT > 1800
    val truncated = df
      .withColumn("new_s",
        when(lag("ts", 1).over(w).isNull ||
          col("ts").cast("long") - lag("ts", 1).over(w).cast("long") > 1800L, 1L)
          .otherwise(0L))
      .groupBy("user_id").agg(sum("new_s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truncated(1L) === 1L) // demonstrates the bug the fix removes
  }
}
