package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** State-backend portability: the same stateful pipelines produce
  * IDENTICAL results on the RocksDB state store provider as on the
  * default HDFS-backed in-memory one.
  *
  * Why this matters at 100 TB: a watermarked join/agg/dedup holds its
  * state on the executors, and at production stream volumes that state
  * does not fit JVM heaps — RocksDB is the public scale answer (off-heap
  * state on local disk with incremental checkpointing). Spark selects
  * the backend purely by conf, so result-parity here is what licenses
  * every streaming operator in this library to run on the scale-grade
  * backend unchanged. Each pipeline uses a FRESH checkpoint per backend
  * (state formats are not interchangeable across providers).
  */
class RocksDbStateSpec extends SparkSpec {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[A](provider: Option[String])(f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    provider match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
    try f
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def drain(df: DataFrame, base: String): DataFrame = {
    val q = df.writeStream
      .format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$base/out")
  }

  private def writeEvents(src: String): Unit = {
    Files.createDirectories(Paths.get(src))
    // two files so maxFilesPerTrigger=1 forces multi-batch state carry
    Files.write(Paths.get(src, "a.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:00:10","user":"u1","kind":"click"}""",
      """{"ts":"2024-01-01 10:00:20","user":"u2","kind":"click"}""",
      """{"ts":"2024-01-01 10:00:40","user":"u1","kind":"purchase"}""",
      """{"ts":"2024-01-01 10:01:05","user":"u1","kind":"click"}""",
      """{"ts":"2024-01-01 10:01:05","user":"u1","kind":"click"}""")) // dup row
    Files.write(Paths.get(src, "b.json"), java.util.Arrays.asList(
      """{"ts":"2024-01-01 10:01:30","user":"u3","kind":"click"}""",
      """{"ts":"2024-01-01 10:02:00","user":"u2","kind":"purchase"}""",
      """{"ts":"2024-01-01 10:30:00","user":"u1","kind":"click"}""")) // advances wm
  }

  private def readEvents(src: String): DataFrame =
    spark.readStream.option("maxFilesPerTrigger", 1).text(src)
      .select(
        to_timestamp(get_json_object(col("value"), "$.ts")).as("ts"),
        get_json_object(col("value"), "$.user").as("user"),
        get_json_object(col("value"), "$.kind").as("kind"))

  private def windowedAgg(src: String, base: String): Map[String, Long] =
    drain(
      readEvents(src)
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 minute").as("w"))
        .agg(count(lit(1)).as("n")),
      base)
      .select(col("w.start").cast("string"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def intervalJoin(src: String, base: String): Set[(String, String, String)] = {
    val purchases = readEvents(src).filter(col("kind") === "purchase")
      .select(col("user").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = readEvents(src).filter(col("kind") === "click")
      .select(col("user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    drain(
      purchases.join(clicks,
        expr("p_user = user AND c_ts >= p_ts - INTERVAL 5 MINUTES AND c_ts < p_ts")),
      base)
      .select(col("p_user"), col("p_ts").cast("string"), col("c_ts").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  private def dedup(src: String, base: String): Set[(String, String)] =
    drain(
      readEvents(src)
        .withWatermark("ts", "1 minute")
        .dropDuplicates("user", "ts"),
      base)
      .select(col("user"), col("ts").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  private def parity[A](run: (String, String) => A): (A, A) = {
    val root = Files.createTempDirectory("rocks_spec_").toString
    val src = s"$root/src"; writeEvents(src)
    val default = withProvider(None)(run(src, s"$root/default"))
    val rocks = withProvider(Some(RocksDb))(run(src, s"$root/rocks"))
    (default, rocks)
  }

  test("windowed agg: RocksDB state store matches the default backend") {
    val (a, b) = parity(windowedAgg)
    assert(a.nonEmpty, "pipeline emitted nothing — parity would be vacuous")
    assert(a === b)
  }

  test("stream-stream interval join: RocksDB matches the default backend") {
    val (a, b) = parity(intervalJoin)
    assert(a.nonEmpty, "pipeline emitted nothing — parity would be vacuous")
    assert(a === b)
  }

  private def sessions(src: String, base: String): Set[(String, String, String, Int)] = {
    import spark.implicits._
    drain(
      Sessionize.byGap(
        readEvents(src).select(col("user"), col("ts")).as[SessionEvent],
        gapMs = 10 * 60 * 1000L).toDF(),
      base)
      .select(col("user"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("events"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
  }

  test("flatMapGroupsWithState sessionizer: RocksDB matches the default backend") {
    // the CUSTOM-state path (GroupState + EventTimeTimeout) — arbitrary
    // user state serialized into the store, not a built-in operator
    val (a, b) = parity(sessions)
    assert(a.nonEmpty, "pipeline emitted nothing — parity would be vacuous")
    assert(a === b)
  }

  test("watermarked dedup: RocksDB matches the default backend, dup dropped") {
    val (a, b) = parity(dedup)
    assert(a.nonEmpty)
    assert(a === b)
    // the duplicated (u1, 10:01:05) row survives exactly once
    assert(a.count(_ == ("u1", "2024-01-01 10:01:05")) === 1)
  }
}
