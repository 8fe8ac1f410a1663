package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** flatMapGroupsWithState sessionization: gap-closed sessions emitted via
  * event-time timeout; open sessions stay in state.
  */
class SessionizeSpec extends SparkSpec {

  test("gap-based sessions close on event-time timeout; counts and bounds exact") {
    val base = Files.createTempDirectory("sess_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    // u1: burst at 10:00 (3 events in 30s), next event 10:10 -> session closed
    // u2: single event 10:00, silent -> closed by watermark advance
    // watermark driver: late event at 10:30 pushes watermark past all timeouts
    Files.write(Paths.get(src, "a.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:00:00","user":"u1"}""",
      """{"ts":"2024-01-01 10:00:10","user":"u1"}""",
      """{"ts":"2024-01-01 10:00:30","user":"u1"}""",
      """{"ts":"2024-01-01 10:00:05","user":"u2"}"""))
    Files.write(Paths.get(src, "b.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:10:00","user":"u1"}""",
      """{"ts":"2024-01-01 10:30:00","user":"u3"}"""))

    import spark.implicits._
    val events = spark.readStream.option("maxFilesPerTrigger", 1).text(src)
      .select(
        to_timestamp(get_json_object(col("value"), "$.ts")).as("ts"),
        get_json_object(col("value"), "$.user").as("user"))
      .as[SessionEvent]

    val q = Sessionize.byGap(events, gapMs = 120000L) // 2-minute gap
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.read.parquet(s"$base/out")
      .select(col("user"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    // u1 burst closed (3 events); u2 closed; u1's 10:10 single-event
    // session closed too (timeout 10:12 < final watermark 10:29).
    // u3's 10:30 session stays open in state (timeout past watermark).
    assert(out === Set(
      ("u1", "2024-01-01 10:00:00", "2024-01-01 10:00:30", 3),
      ("u1", "2024-01-01 10:10:00", "2024-01-01 10:10:00", 1),
      ("u2", "2024-01-01 10:00:05", "2024-01-01 10:00:05", 1)))
  }
}
