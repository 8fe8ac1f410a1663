package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Watermark-bounded STATE is the difference between a streaming job
  * that runs forever and one that OOMs a week in: every stateful
  * operator here claims its state tracks the WATERMARK WINDOW, not the
  * stream's length. This spec measures it — the same windowed-agg
  * pipeline drains a stream and a 4× longer stream (same event cadence,
  * same watermark), and the state-store row count reported by the final
  * `StreamingQueryProgress` must stay FLAT (the open tail of windows),
  * while total input provably 4×'d. A state leak (missing watermark,
  * wrong output mode, state never evicted) fails this loudly.
  */
class StateBoundednessSpec extends SparkSpec {

  /** Drain a windowed agg over `minutes` of synthetic events (4/min,
    * strictly ordered so the watermark advances deterministically);
    * returns (input rows, state rows at the final micro-batch). */
  private def run(minutes: Int): (Long, Long) = {
    val base = Files.createTempDirectory("state_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    // one file per 10 minutes keeps multi-batch state carry real without
    // a per-minute trigger storm
    (0 until minutes).grouped(10).zipWithIndex.foreach { case (chunk, fi) =>
      val lines = chunk.flatMap { m =>
        (0 until 4).map { j =>
          val ts = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
            .plusMinutes(m.toLong).plusSeconds(j * 13L)
          s"""{"ts":"${ts.toString.replace('T', ' ')}","user":"u${j % 3}"}"""
        }
      }
      Files.write(Paths.get(src, f"ev_$fi%04d.json"),
        java.util.Arrays.asList(lines: _*))
    }
    val stream = spark.readStream.option("maxFilesPerTrigger", 1).text(src)
      .select(
        to_timestamp(get_json_object(col("value"), "$.ts")).as("ts"),
        get_json_object(col("value"), "$.user").as("user"))
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "1 minute").as("w"), col("user"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progs = q.recentProgress.filter(_.stateOperators.nonEmpty)
    val in = progs.map(_.numInputRows).sum
    val stateRows = progs.last.stateOperators.map(_.numRowsTotal).sum
    (in, stateRows)
  }

  test("windowed-agg state tracks the watermark window, not stream length") {
    val (in1, state1) = run(40)
    val (in4, state4) = run(160)
    assert(in4 === in1 * 4, s"input must 4x ($in1 -> $in4)")
    assert(state1 > 0L, "no state measured — the probe is vacuous")
    // flat within noise: the open tail is (watermark delay + trigger
    // granularity) of windows × 3 users, identical for both lengths
    assert(state4 <= state1 * 2,
      s"state grew with stream length ($state1 -> $state4) — a leak at " +
        "100 TB stream volumes; watermark eviction is not bounding it")
  }
}
