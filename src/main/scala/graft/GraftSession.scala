package graft

import org.apache.spark.sql.SparkSession

/** One place to build the engine's SparkSession so every entry point
  * (Verify, Bench, tests) runs with the same scale-oriented config.
  *
  * - AQE on: join-strategy switching (broadcast only when the runtime size
  *   is actually small) + skew-join splitting replace hardcoded hints.
  * - shuffle.partitions sized to the local core count; on a real cluster
  *   AQE coalesces post-shuffle partitions so the static value matters less.
  * - nanosAsLong set once here (events.ts is parquet TIMESTAMP(NANOS),
  *   which Spark rejects by default) instead of per-read mutation.
  */
object GraftSession {
  def build(appName: String, cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def fromEnv(appName: String): SparkSession =
    build(appName, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
}
