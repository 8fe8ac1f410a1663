package graft.streaming

import graft.ingest.{Ingest, Maintenance}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming CDC path (SURVEY.md §2.9, §3.2): raw layer +
  * typed upsert layer, driven by checkpointed `foreachBatch` so delivery
  * is effectively exactly-once into the target table.
  *
  * Source-agnostic: any streaming DataFrame with a string `value` column
  * works — Kafka (`readStream.format("kafka")` with the topic-per-table
  * layout the reference generates) or, in this sandbox, the file `text`
  * source for deterministic micro-batch tests.
  *
  * Scale notes: each micro-batch merge shuffles only on the PK (the same
  * window as batch staging dedup); the target rewrite is the
  * parquet-sandbox stand-in for a transactional MERGE — on a real
  * deployment `upsertBatch` body becomes `DeltaTable.merge` and
  * everything else is unchanged.
  */
object CdcStream {

  /** Raw layer (gen_pipeline.py:295-299 MV shape): processing-time
    * `ingested_at` + untouched JSON `value`. */
  def rawLayer(stream: DataFrame): DataFrame =
    stream.select(current_timestamp().as("ingested_at"), col("value"))

  /** Snapshot bootstrap (snapshot.mode=initial): load the batch image as
    * version 0 so any streamed change (ts_ms > 0) supersedes it. */
  def bootstrap(spark: SparkSession, snapshot: DataFrame, targetDir: String): Unit =
    snapshot
      .withColumn("op", lit("r"))
      .withColumn("ts_ms", lit(0L))
      .write.mode(SaveMode.Overwrite).parquet(targetDir)

  /** Merge one (micro-)batch of raw envelope values into the typed
    * target: decode → latest-per-PK against the existing table →
    * atomic staging swap. Deletes are dropped in parity mode and applied
    * when `applyDeletes` (improved mode, SURVEY.md §2.9). */
  def upsertBatch(spark: SparkSession, batch: DataFrame, afterSchema: StructType,
      pk: Seq[String], targetDir: String, applyDeletes: Boolean = false,
      cleanMeta: Option[graft.schema.TableMeta] = None): Unit = {
    val decoded = CdcEnvelope.decode(batch, afterSchema)
    // same cleaning layer as batch ingest (streamed rows must not bypass
    // D/N/T normalization — the reference's stream path diverging from its
    // batch path was one of its bugs, SURVEY.md §2.9 NULL note)
    val ups = cleanMeta match {
      case Some(m) => graft.clean.TableCleaner.clean(CdcEnvelope.upserts(decoded), m)
      case None => CdcEnvelope.upserts(decoded)
    }
    val existing =
      if (Maintenance.exists(spark, targetDir)) spark.read.parquet(targetDir)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), ups.schema)
    val merged = Ingest.dedupLatest(
      existing.unionByName(ups, allowMissingColumns = true),
      pk, Some("ts_ms"))
    val result =
      if (applyDeletes) {
        // one delete row per PK (the newest): multiple deletes for a key in
        // a batch must not fan the left join out into duplicate survivors,
        // and a row must be compared against the NEWEST delete only
        val dels = CdcEnvelope.deletes(decoded)
          .groupBy(pk.map(col): _*)
          .agg(max("ts_ms").as("__del_ts"))
        merged.join(dels, pk, "left")
          .filter(col("__del_ts").isNull || col("__del_ts") < col("ts_ms"))
          .drop("__del_ts")
      } else merged
    val staging = targetDir + "__staging"
    result.write.mode(SaveMode.Overwrite).parquet(staging)
    Maintenance.stagingSwap(spark, staging, targetDir)
  }

  /** The typed-layer streaming query: checkpointed foreachBatch upsert.
    * With Trigger.AvailableNow it drains the backlog and stops — the
    * deterministic shape the tests use; production would use a continuous
    * processing-time trigger. */
  def typedUpsertQuery(stream: DataFrame, afterSchema: StructType, pk: Seq[String],
      targetDir: String, checkpointDir: String,
      applyDeletes: Boolean = false,
      cleanMeta: Option[graft.schema.TableMeta] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch.sparkSession, batch, afterSchema, pk, targetDir,
          applyDeletes, cleanMeta)
      }
      .start()

  /** The raw-layer streaming query: append-only parquet sink. */
  def rawLayerQuery(stream: DataFrame, targetDir: String,
      checkpointDir: String): StreamingQuery =
    rawLayer(stream).writeStream
      .option("checkpointLocation", checkpointDir)
      .option("path", targetDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start()
}
