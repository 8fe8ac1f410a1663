package graft.streaming

import graft.ingest.Ingest
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
  * Scale notes: each micro-batch is ONE batch-sized appended delta part
  * (bytes written ∝ batch, never ∝ target — the ReplacingMergeTree
  * insert model). Duplicates and delete tombstones collapse in
  * `finalView` (SELECT ... FINAL: one PK-hash shuffle) and physically in
  * `optimizeFinal` (OPTIMIZE FINAL — scheduled maintenance, off the
  * per-batch path). Version collapse also makes replayed batches
  * idempotent in the final view: a re-appended part carries identical
  * (pk, ts_ms) rows, which latest-per-key folds away. On a deployment
  * with a transactional format `upsertBatch` becomes `DeltaTable.merge`
  * and everything else is unchanged.
  */
object CdcStream {

  /** Raw layer (gen_pipeline.py:295-299 MV shape): processing-time
    * `ingested_at` + untouched JSON `value`. */
  def rawLayer(stream: DataFrame): DataFrame =
    stream.select(current_timestamp().as("ingested_at"), col("value"))

  /** Snapshot bootstrap (snapshot.mode=initial): load the batch image as
    * version 0 so any streamed change (ts_ms > 0) supersedes it. The
    * image lands as generation 1 of a manifest-committed target, so the
    * whole typed layer — bootstrap, per-batch delta parts, OPTIMIZE — is
    * object-store-safe end to end (ManifestCommit scaladoc). */
  def bootstrap(spark: SparkSession, snapshot: DataFrame, targetDir: String): Unit = {
    val dataDir = graft.ingest.ManifestCommit.newDataDir(targetDir)
    snapshot
      .withColumn("op", lit("r"))
      .withColumn("ts_ms", lit(0L))
      .write.mode(SaveMode.Overwrite).parquet(dataDir)
    graft.ingest.ManifestCommit.commitReplace(spark, targetDir, Seq(dataDir),
      op = "bootstrap")
    ()
  }

  /** INSERT one (micro-)batch of raw envelope values as a delta part of
    * the typed target: decode → clean → append. Deletes are dropped in
    * parity mode; in improved mode (`applyDeletes`) they append as
    * TOMBSTONE rows (op='d', key from the `before` image) that
    * `finalView`/`optimizeFinal` apply — the ReplacingMergeTree
    * (ver, is_deleted) model. The old form re-read and rewrote the whole
    * target every batch: O(target) write amplification, a non-starter
    * for a 100 TB table taking small CDC batches. */
  def upsertBatch(spark: SparkSession, batch: DataFrame, afterSchema: StructType,
      pk: Seq[String], targetDir: String, applyDeletes: Boolean = false,
      cleanMeta: Option[graft.schema.TableMeta] = None,
      txn: Option[(String, Long)] = None): Unit = {
    val decoded = CdcEnvelope.decode(batch, afterSchema)
    // same cleaning layer as batch ingest (streamed rows must not bypass
    // D/N/T normalization — the reference's stream path diverging from its
    // batch path was one of its bugs, SURVEY.md §2.9 NULL note). Tombstones
    // are cleaned too so their PK representation matches the upserts'.
    def clean(df: DataFrame) = cleanMeta match {
      case Some(m) => graft.clean.TableCleaner.clean(df, m)
      case None => df
    }
    val ups = clean(CdcEnvelope.upserts(decoded))
    val delta =
      if (applyDeletes) {
        val tombs = clean(CdcEnvelope.deletes(decoded).withColumn("op", lit("d")))
        ups.unionByName(tombs, allowMissingColumns = true)
      } else ups
    // INSERT = one manifest-committed delta dir per micro-batch: written
    // invisibly, made live by one atomic manifest append — a crash mid-
    // batch leaves the previous generation served and an orphan dir for
    // pruneOrphans, never a torn table.
    val dataDir = graft.ingest.ManifestCommit.newDataDir(targetDir)
    delta.write.mode(SaveMode.Overwrite).parquet(dataDir)
    // txn makes the append idempotent under checkpoint replay: a crash
    // between this commit and the checkpoint write re-runs the batch,
    // and the manifest's recorded (writer, batchId) rejects the dup —
    // exactly-once table contents, not just at-least-once + collapse
    graft.ingest.ManifestCommit.commitAppend(spark, targetDir, dataDir, txn = txn)
    ()
  }

  /** SELECT ... FINAL over the typed target: latest-per-key across all
    * parts (delete tombstones win ts_ms ties, as the newest-delete rule
    * requires), then tombstoned keys drop out. One PK-hash shuffle. */
  def finalView(spark: SparkSession, targetDir: String, pk: Seq[String]): DataFrame = {
    val all = graft.ingest.ManifestCommit.read(spark, targetDir)
    val tagged = all.withColumn("__del",
      when(col("op") === "d", lit(1)).otherwise(lit(0)))
    Ingest.dedupLatest(tagged, pk, Some("ts_ms"), tieBreak = Seq("__del"))
      .filter(col("__del") === 0)
      .drop("__del")
  }

  /** OPTIMIZE FINAL: physically collapse the parts (and purge
    * tombstones) into one generation via an atomic manifest replace.
    * Scheduled maintenance — the
    * reference runs it post-ingest (tools/ingest_runner.py:1782-1787). */
  def optimizeFinal(spark: SparkSession, targetDir: String, pk: Seq[String]): Unit = {
    val dataDir = graft.ingest.ManifestCommit.newDataDir(targetDir)
    finalView(spark, targetDir, pk)
      .write.mode(SaveMode.Overwrite).parquet(dataDir)
    graft.ingest.ManifestCommit.commitReplace(spark, targetDir, Seq(dataDir), op = "compact")
    ()
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // writer id = the checkpoint path: stable across restarts of THIS
        // query, distinct between different queries sharing a target
        upsertBatch(batch.sparkSession, batch, afterSchema, pk, targetDir,
          applyDeletes, cleanMeta, txn = Some((checkpointDir, batchId)))
      }
      .start()

  /** Topic→table routing rule (tools/kafka_to_clickhouse.py:163-169):
    * Debezium topics follow `<server>.<db>.<table>`, so the table is the
    * LAST dot segment when the name has ≥3 segments; anything shorter
    * falls back to the whole topic with dots folded to underscores. */
  def tableForTopic(topic: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val parts = split(topic, "\\.")
    when(size(parts) >= 3, element_at(parts, -1))
      .otherwise(regexp_replace(topic, "\\.", "_"))
  }

  /** Multi-topic demux: ONE consumer/stream serving N typed tables
    * (tools/kafka_to_clickhouse.py:155-187 subscribes to every matching
    * topic and routes each message by its topic name). The stream
    * carries (topic, value) — exactly the Kafka source's columns, so the
    * file stand-in and a real `format("kafka")` source are
    * interchangeable here. Each micro-batch is cached ONCE and split by
    * inferred table; each slice appends as that table's delta part
    * through the same `upsertBatch` path as a single-table stream.
    * Topics that resolve to a table not in `tables` are skipped (the
    * reference logs-and-continues on unroutable messages). At scale the
    * demux is a single narrow pass per table over one cached batch —
    * no per-message driver loop, no second consumer. */
  def routedUpsertQuery(stream: DataFrame,
      tables: Map[String, (StructType, Seq[String])], targetRoot: String,
      checkpointDir: String, applyDeletes: Boolean = false,
      cleanMeta: Map[String, graft.schema.TableMeta] = Map.empty): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val routed = batch.withColumn("__table", tableForTopic(col("topic"))).persist()
        try tables.foreach { case (table, (afterSchema, pk)) =>
          val slice = routed.filter(col("__table") === table).select("value")
          // per-table idempotence: each target table records the shared
          // (checkpoint, batchId), so a replay that already landed in
          // SOME tables before the crash skips exactly those
          upsertBatch(batch.sparkSession, slice, afterSchema, pk,
            s"$targetRoot/$table", applyDeletes, cleanMeta.get(table),
            txn = Some((checkpointDir, batchId)))
        } finally { routed.unpersist(); () }
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
