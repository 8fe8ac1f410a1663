package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    ev.printSchema()
    ev.select("event_id", "ts").orderBy("event_id").show(3, false)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    emb.printSchema()
    spark.stop()
  }
}
