package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Normalize the events `ts` column to session-zoned TimestampType,
    * whatever physical type the fixture was written with. Driver fixtures
    * have shipped as parquet TIMESTAMP(NANOS) (read as Long under
    * `nanosAsLong`) and, since round 9, as timestamp[us] (read as
    * TIMESTAMP_NTZ). Schema-driven so a future regeneration changes
    * behavior here, not in 25 downstream queries:
    *  - LongType (nanos-as-long): floor-truncate ns→µs, same as DuckDB's
    *    read of the nanos file, so oracle results line up.
    *  - TIMESTAMP_NTZ: cast to TimestampType. Session TZ is UTC
    *    (GraftSession), so wall-clock values are unchanged and match
    *    DuckDB's naive read of the µs file.
    *  - TimestampType already: pass through.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // nanosAsLong lets a TIMESTAMP(NANOS) fixture read at all (Spark
    // rejects it by default); harmless for µs fixtures. Set once here if
    // the caller's session didn't already (GraftSession does; the
    // driver's own session may not).
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Register every table as a temp view named after itself, so the same
    * SQL text runs on Spark and on the DuckDB oracle. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
