package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst can push filters
  * and prune columns into the scan — callers should select/filter on the
  * returned DataFrame and let the optimizer do the rest.
  */
object Tables {
  /** Every table the driver generates, at each scale factor. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by default.
    // Read nanos as Long and truncate to microseconds — the same truncation
    // DuckDB applies when it reads the file, so oracle results line up.
    // (Set once here only if the caller's session didn't already set it —
    // GraftSession does; the driver's own session may not. The DIV 1000
    // truncation equals ns→µs flooring because the fixtures are post-epoch.)
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Register every table as a temp view named after itself, so the same
    * SQL text runs on Spark and on the DuckDB oracle. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
