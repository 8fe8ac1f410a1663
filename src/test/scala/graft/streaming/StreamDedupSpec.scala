package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Streaming exact dedup with bounded (watermark-scoped) state: redelivered
  * events inside the horizon collapse to one row; state for expired keys is
  * dropped instead of accumulating for the life of the stream.
  */
class StreamDedupSpec extends SparkSpec {

  test("dropDuplicatesWithinWatermark collapses redeliveries per key") {
    val base = Files.createTempDirectory("sd_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    // at-least-once source: event 1 delivered twice in one file, event 2
    // redelivered in a later micro-batch within the horizon
    Files.write(Paths.get(src, "a.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:00:10","id":1,"v":"first"}""",
      """{"ts":"2024-01-01 10:00:11","id":1,"v":"dup-same-batch"}""",
      """{"ts":"2024-01-01 10:00:20","id":2,"v":"first"}"""))
    Files.write(Paths.get(src, "b.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:00:25","id":2,"v":"dup-next-batch"}""",
      """{"ts":"2024-01-01 10:02:00","id":3,"v":"first"}"""))
    // FileStreamSource orders files by modification time; back-to-back
    // writes can tie at fs timestamp granularity, making batch order (and
    // which duplicate survives) flaky — pin distinct mtimes explicitly
    Files.setLastModifiedTime(Paths.get(src, "a.json"),
      java.nio.file.attribute.FileTime.fromMillis(1000000))
    Files.setLastModifiedTime(Paths.get(src, "b.json"),
      java.nio.file.attribute.FileTime.fromMillis(2000000))

    val deduped = StreamDedup.withinWatermark(
      spark.readStream.option("maxFilesPerTrigger", 1).text(src)
        .select(
          to_timestamp(get_json_object(col("value"), "$.ts")).as("ts"),
          get_json_object(col("value"), "$.id").cast("long").as("id"),
          get_json_object(col("value"), "$.v").as("v")),
      "ts", "10 minutes", Seq("id"))

    val q = deduped.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.read.parquet(s"$base/out")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    // exactly one row per id, and it is the FIRST arrival's payload
    assert(out == Map(1L -> "first", 2L -> "first", 3L -> "first"))
  }
}
