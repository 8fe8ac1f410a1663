package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Event-time windowed aggregation with a watermark over a streaming
  * source (brief: "watermarks + windowed aggs") — the streaming-analytics
  * capability on top of the reference's append-only CDC parity.
  */
class StreamingWindowSpec extends SparkSpec {

  test("tumbling event-time window counts with watermark, append mode") {
    val base = Files.createTempDirectory("sw_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    // events: (event_time, user) as JSON lines across two files
    Files.write(Paths.get(src, "a.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:00:10","user":"u1"}""",
      """{"ts":"2024-01-01 10:00:20","user":"u2"}""",
      """{"ts":"2024-01-01 10:01:05","user":"u1"}"""))
    Files.write(Paths.get(src, "b.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:01:30","user":"u3"}""",
      """{"ts":"2024-01-01 10:05:00","user":"u1"}""")) // advances watermark past minute 1

    val stream = spark.readStream.option("maxFilesPerTrigger", 1).text(src)
      .select(
        to_timestamp(get_json_object(col("value"), "$.ts")).as("ts"),
        get_json_object(col("value"), "$.user").as("user"))
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // append mode emits only windows sealed by the watermark:
    // 10:00 (2 events) and 10:01 (2 events); 10:05 stays open
    val out = spark.read.parquet(s"$base/out")
      .select(col("w.start").cast("string").as("start"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "2024-01-01 10:00:00" -> 2L,
      "2024-01-01 10:01:00" -> 2L))
  }
}
