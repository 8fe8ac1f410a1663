package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Streaming CDC path with deterministic file-source micro-batches:
  * snapshot bootstrap + streamed envelope upserts must converge to the
  * same table a batch ingest of the final images produces (SURVEY.md
  * §2.9; envelope shape FIXTURES.md §5).
  */
class CdcStreamSpec extends SparkSpec {

  private val afterSchema = StructType(Seq(
    StructField("id", LongType, true),
    StructField("nombre", StringType, true)))

  private def writeBatch(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), String.join("\n", lines: _*).getBytes)

  private def env(id: Long, nombre: String, op: String, tsMs: Long): String =
    if (op == "d")
      s"""{"before":{"id":$id,"nombre":null},"after":null,"op":"d","ts_ms":$tsMs}"""
    else
      s"""{"before":null,"after":{"id":$id,"nombre":"$nombre"},"op":"$op","ts_ms":$tsMs}"""

  private def runStream(srcDir: String, target: String, ckpt: String,
      applyDeletes: Boolean): Unit = {
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .text(srcDir)
    val q = CdcStream.typedUpsertQuery(
      stream, afterSchema, Seq("id"), target, ckpt, applyDeletes)
    q.awaitTermination()
  }

  /** The documented read surface for the appended-parts target:
    * SELECT ... FINAL (latest-per-key, tombstones applied). */
  private def tableOf(target: String): Map[Long, String] =
    CdcStream.finalView(spark, target, Seq("id")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("nombre")).toMap

  test("parity mode: snapshot + stream converge; deletes are dropped (reference behavior)") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/typed"; val ckpt = s"$base/ckpt"

    // snapshot.mode=initial: batch image first
    import scala.jdk.CollectionConverters._
    val snap = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(1L, "uno"), org.apache.spark.sql.Row(2L, "dos")).asJava,
      afterSchema)
    CdcStream.bootstrap(spark, snap, target)

    writeBatch(src, "b1.json", Seq(
      env(1L, "uno_v2", "u", 100), env(3L, "tres", "c", 101)))
    writeBatch(src, "b2.json", Seq(
      env(1L, "uno_v3", "u", 200), env(2L, null, "d", 201)))
    runStream(src, target, ckpt, applyDeletes = false)

    // delete of id=2 is DROPPED in parity mode -> snapshot row survives
    assert(tableOf(target) === Map(1L -> "uno_v3", 2L -> "dos", 3L -> "tres"))
  }

  test("improved mode: deletes applied when newer than the surviving row") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/typed"; val ckpt = s"$base/ckpt"

    writeBatch(src, "b1.json", Seq(
      env(1L, "uno", "c", 100), env(2L, "dos", "c", 100)))
    writeBatch(src, "b2.json", Seq(
      env(2L, null, "d", 200),       // delete id=2 (newer -> applied)
      env(3L, "tres", "c", 201)))
    runStream(src, target, ckpt, applyDeletes = true)
    assert(tableOf(target) === Map(1L -> "uno", 3L -> "tres"))
  }

  test("improved mode: multiple deletes for one PK in a batch — no fan-out, newest delete wins") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/typed"; val ckpt = s"$base/ckpt"

    // regression (round-2 advice): two deletes for id=1 in ONE batch must
    // not duplicate survivors via the join, and a row NEWER than the
    // newest delete must survive even though an OLDER delete row exists
    writeBatch(src, "b1.json", Seq(
      env(1L, "uno", "c", 100),
      env(1L, null, "d", 150),       // older delete
      env(1L, "uno_v2", "u", 300),   // re-created after the deletes
      env(1L, null, "d", 200),       // newest delete (but < 300)
      env(2L, "dos", "c", 100),
      env(2L, null, "d", 150),
      env(2L, null, "d", 250)))      // id=2: newest delete wins -> gone
    runStream(src, target, ckpt, applyDeletes = true)
    assert(tableOf(target) === Map(1L -> "uno_v2"))
    // OPTIMIZE FINAL purges the collapsed duplicates AND the tombstones
    // physically — the plain read then shows exactly one survivor
    CdcStream.optimizeFinal(spark, target, Seq("id"))
    val rows = graft.ingest.ManifestCommit.read(spark, target).collect()
    assert(rows.length === 1, s"expected exactly one survivor, got ${rows.toSeq}")
  }

  test("raw layer: append-only (ingested_at, value) with every envelope kept") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    writeBatch(src, "b1.json", Seq(
      env(1L, "uno", "c", 100), env(1L, null, "d", 101)))
    val q = CdcStream.rawLayerQuery(
      spark.readStream.text(src), s"$base/raw", s"$base/ckpt_raw")
    q.awaitTermination()
    val raw = spark.read.parquet(s"$base/raw")
    assert(raw.columns.toSeq === Seq("ingested_at", "value"))
    assert(raw.count() === 2) // deletes kept in raw (parity with MV shape)
  }

  test("schema drift: unknown fields ignored, missing fields NULL (permissive from_json)") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/typed"; val ckpt = s"$base/ckpt"
    writeBatch(src, "b1.json", Seq(
      // extra column the table schema doesn't know yet
      """{"before":null,"after":{"id":1,"nombre":"uno","nueva_col":"x"},"op":"c","ts_ms":100}""",
      // missing known column
      """{"before":null,"after":{"id":2},"op":"c","ts_ms":101}"""))
    runStream(src, target, ckpt, applyDeletes = false)
    assert(tableOf(target) === Map(1L -> "uno", 2L -> null))
  }

  test("schema drift: column added mid-stream via widened schema on restart") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/typed"; val ckpt = s"$base/ckpt"
    // phase 1: original schema
    writeBatch(src, "b1.json", Seq(env(1L, "uno", "c", 100)))
    runStream(src, target, ckpt, applyDeletes = false)
    // upstream ALTER adds `extra`; the consumer restarts with the WIDENED
    // schema (the reference's fix_clickhouse_schemas repair step) and the
    // same checkpoint — old delta parts are NOT rewritten
    val widened = StructType(afterSchema.fields :+
      StructField("extra", StringType, true))
    writeBatch(src, "b2.json", Seq(
      """{"before":null,"after":{"id":2,"nombre":"dos","extra":"x"},"op":"c","ts_ms":200}""",
      """{"before":null,"after":{"id":1,"nombre":"uno_v2","extra":"y"},"op":"u","ts_ms":201}"""))
    CdcStream.typedUpsertQuery(
      spark.readStream.text(src), widened, Seq("id"), target, ckpt)
      .awaitTermination()
    val rows = CdcStream.finalView(spark, target, Seq("id")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("nombre"), r.getAs[String]("extra"))).toMap
    // latest-per-key collapses ACROSS the schema boundary; the pre-drift
    // part reads back with extra = NULL via mergeSchema
    assert(rows === Map(1L -> ("uno_v2", "y"), 2L -> ("dos", "x")))
  }

  test("cleanMeta: streamed rows pass through the same D/N/T cleaning as batch ingest") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/typed"; val ckpt = s"$base/ckpt"
    val schemaWithDate = StructType(Seq(
      StructField("id", LongType, true), StructField("fecha", StringType, true)))
    writeBatch(src, "b1.json", Seq(
      """{"before":null,"after":{"id":1,"fecha":"0000-00-00"},"op":"c","ts_ms":100}""",
      """{"before":null,"after":{"id":2,"fecha":"2021-03-15"},"op":"c","ts_ms":101}"""))
    val meta = graft.schema.TableMeta("t", Seq(
      graft.schema.ColumnMeta("id", "bigint", nullable = false, isPk = true),
      graft.schema.ColumnMeta("fecha", "datetime")))
    val q = CdcStream.typedUpsertQuery(
      spark.readStream.text(src), schemaWithDate, Seq("id"), target, ckpt,
      applyDeletes = false, cleanMeta = Some(meta))
    q.awaitTermination()
    val rows = graft.ingest.ManifestCommit.read(spark, target).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[java.sql.Timestamp]("fecha"))).toMap
    assert(rows(1L).isEmpty) // zero-date -> NULL, typed as timestamp
    assert(rows(2L).exists(_.toString.startsWith("2021-03-15")))
  }

  test("crash-replay of a committed micro-batch cannot double-append (txn dedup)") {
    import org.apache.spark.sql.functions.lit
    val base = Files.createTempDirectory("cdc_spec_").toString
    val target = s"$base/typed"
    val batch = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(env(1L, "v1", "c", 100L))),
      StructType(Seq(StructField("value", StringType, true))))
    // simulate foreachBatch delivering batch 0, then a crash BETWEEN the
    // manifest commit and the checkpoint write → the engine re-delivers
    // the SAME (checkpoint, batchId)
    CdcStream.upsertBatch(spark, batch, afterSchema, Seq("id"), target,
      txn = Some(("ckpt-A", 0L)))
    CdcStream.upsertBatch(spark, batch, afterSchema, Seq("id"), target,
      txn = Some(("ckpt-A", 0L)))
    val m = graft.ingest.ManifestCommit.readManifest(spark, target).get
    assert(m.dirs.size === 1, "replayed batch must not add a second delta part")
    // raw part count proves exactly-once CONTENTS, not just collapse
    assert(graft.ingest.ManifestCommit.read(spark, target).count() === 1L)
    // the next batch id commits normally
    CdcStream.upsertBatch(spark, batch.withColumn("value", lit(
      env(2L, "v2", "c", 200L))), afterSchema, Seq("id"), target,
      txn = Some(("ckpt-A", 1L)))
    assert(graft.ingest.ManifestCommit.readManifest(spark, target).get.dirs.size === 2)
  }

  test("checkpointed restart does not reprocess already-drained files") {
    val base = Files.createTempDirectory("cdc_spec_").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val target = s"$base/typed"; val ckpt = s"$base/ckpt"
    writeBatch(src, "b1.json", Seq(env(1L, "uno", "c", 100)))
    runStream(src, target, ckpt, applyDeletes = false)
    // restart with NO new files: state must be unchanged, no failure
    runStream(src, target, ckpt, applyDeletes = false)
    assert(tableOf(target) === Map(1L -> "uno"))
    writeBatch(src, "b2.json", Seq(env(1L, "uno_v2", "u", 200)))
    runStream(src, target, ckpt, applyDeletes = false)
    assert(tableOf(target) === Map(1L -> "uno_v2"))
  }
}
