package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium envelope `{before, after, op, ts_ms}` decoding (SURVEY.md
  * §2.9; consumer behavior /root/reference/tools/kafka_to_clickhouse.py:
  * 57-110 — only `after` used, deletes skipped).
  *
  * `from_json` is permissive by default: unknown fields are ignored and
  * missing fields are NULL, which is exactly the schema-drift tolerance
  * the reference needs (SURVEY.md §7 hard parts).
  */
object CdcEnvelope {

  def envelopeSchema(afterSchema: StructType): StructType = StructType(Seq(
    StructField("before", afterSchema, true),
    StructField("after", afterSchema, true),
    StructField("op", StringType, true),
    StructField("ts_ms", LongType, true)))

  /** Parse the raw JSON `value` column into a typed `e` envelope struct. */
  def decode(df: DataFrame, afterSchema: StructType): DataFrame =
    df.withColumn("e", from_json(col("value"), envelopeSchema(afterSchema)))

  /** Upsert images: rows with an `after` image and op != 'd' (parity
    * mode — the reference silently drops deletes), flattened to
    * after.* + op + ts_ms. */
  def upserts(decoded: DataFrame): DataFrame =
    decoded
      .filter(col("e.after").isNotNull && (col("e.op").isNull || col("e.op") =!= "d"))
      .select(col("e.after.*"), col("e.op").as("op"), col("e.ts_ms").as("ts_ms"))

  /** Delete keys: (before.*, ts_ms) of op='d' rows — used only by the
    * improved (flag-gated) delete-applying mode. */
  def deletes(decoded: DataFrame): DataFrame =
    decoded
      .filter(col("e.op") === "d" && col("e.before").isNotNull)
      .select(col("e.before.*"), col("e.ts_ms").as("ts_ms"))

  /** One-liner for schema-typed parity decode over a batch of raw values. */
  def decodeParity(df: DataFrame, afterSchema: StructType): DataFrame =
    upserts(decode(df, afterSchema))

  /** M2 — infer the `after` schema from sample envelope messages
    * (tools/kafka_to_clickhouse.py:53-95 creates the table from the first
    * JSON message): Spark's JSON inference over the samples, then the
    * `after` struct is the table schema. */
  def inferAfterSchema(spark: org.apache.spark.sql.SparkSession,
      sampleValues: Seq[String]): StructType = {
    import spark.implicits._
    val full = spark.read.json(spark.createDataset(sampleValues)).schema
    full.find(_.name == "after").map(_.dataType) match {
      case Some(st: StructType) => st
      case _ => sys.error("no 'after' struct in sampled envelopes")
    }
  }
}
