package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** DDL / maintenance operators M1-M8 (SURVEY.md §2.8) re-expressed for a
  * parquet/file-based lakehouse layout. On a deployment with a
  * transactional table format these become the format's native DDL; the
  * semantics (idempotence, atomic swap, compaction, nullable-by-default)
  * are what the reference encodes and what is preserved here.
  */
object Maintenance {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Number of data files under a table dir (hidden/_metadata excluded) —
    * the part count that drives Replacing-table compaction policy. */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val it = f.listFiles(new Path(path), true)
    var n = 0
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** M1 — create-from-reflected-schema: materialize an empty table with
    * the exact schema (idempotent; M8's DROP-then-CREATE becomes
    * overwrite-empty). */
  def createFromSchema(spark: SparkSession, path: String, schema: StructType): Unit =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** M3 — truncate-before-load: drop the table dir (the subsequent
    * overwrite write recreates it; tools/ingest_runner.py:1722-1727). */
  def truncate(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** M4 — atomic staging swap (RENAME TABLE final→old, tmp→final; DROP
    * old — tools/ingest_runner.py:1529-1592), as filesystem renames:
    * rename is atomic per-directory on HDFS-like filesystems, so readers
    * see either the old or the new table, never a partial one. */
  def stagingSwap(spark: SparkSession, stagingPath: String, finalPath: String): Unit = {
    val f = fs(spark, finalPath)
    val staging = new Path(stagingPath)
    val fin = new Path(finalPath)
    val old = new Path(finalPath + "__old")
    if (f.exists(old)) f.delete(old, true)
    if (f.exists(fin)) {
      if (!f.rename(fin, old)) sys.error(s"swap: cannot rename $fin -> $old")
    }
    if (!f.rename(staging, fin)) sys.error(s"swap: cannot rename $staging -> $fin")
    f.delete(old, true)
    ()
  }

  /** M5 — OPTIMIZE/compaction: rewrite a table dir into ~`targetMB`-sized
    * files (small-file compaction after incremental loads). */
  def optimizeCompact(spark: SparkSession, path: String, targetMB: Int = 128): Unit = {
    val f = fs(spark, path)
    val bytes = f.getContentSummary(new Path(path)).getLength
    val parts = math.max(1, (bytes / (targetMB.toLong << 20)).toInt)
    val df = spark.read.parquet(path)
    val staging = path + "__compact"
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(staging)
    stagingSwap(spark, staging, path)
  }

  /** M5 companion — OPTIMIZE FINAL for a Replacing target: physically
    * collapse latest-per-key across delta parts and rewrite as
    * ~`targetMB`-sized files via atomic swap
    * (tools/ingest_runner.py:1782-1787 runs exactly this after ingest).
    * O(target) by nature — runs on a maintenance schedule, never on the
    * per-batch write path. */
  def compactFinal(spark: SparkSession, path: String, keys: Seq[String],
      version: Option[String], tieBreak: Seq[String] = Nil,
      targetMB: Int = 128): Unit = {
    val f = fs(spark, path)
    val bytes = f.getContentSummary(new Path(path)).getLength
    val parts = math.max(1, (bytes / (targetMB.toLong << 20)).toInt)
    val collapsed = Ingest.readFinal(spark, path, keys, version, tieBreak)
    val staging = path + "__compact"
    collapsed.repartition(parts).write.mode(SaveMode.Overwrite).parquet(staging)
    stagingSwap(spark, staging, path)
  }

  /** M5 hygiene — remove crash leftovers of the swap/compact protocol: a
    * job killed between the staging write and the rename leaves
    * `<table>__staging` / `<table>__compact` / `<table>__old` (and batch
    * ingest's `.staging_<table>`) directories holding a full table copy
    * each. They are write-scratch by construction — the LIVE table never
    * has these names — so deleting them is always safe and reclaims the
    * space before the next load doubles it again. Returns the paths
    * removed. */
  def vacuumScratch(spark: SparkSession, tableRoot: String): Seq[String] = {
    val f = fs(spark, tableRoot)
    val root = new Path(tableRoot)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.endsWith("__staging") || n.endsWith("__compact") ||
          n.endsWith("__old") || n.startsWith(".staging_")
      }
      .map { p => f.delete(p, true); p.toString }
  }

  /** M6 — schema-relax: every non-PK field nullable
    * (tools/fix_clickhouse_schemas.py:73-166). Our reflected schemas are
    * already nullable-by-default for non-PK; this normalizes external ones. */
  def relaxSchema(schema: StructType): StructType =
    StructType(schema.fields.map { field =>
      val isPk = field.metadata.contains("pk") && field.metadata.getBoolean("pk")
      if (isPk) field else field.copy(nullable = true)
    })

  /** M7/M8 — idempotent view (re)registration is Views.register*. */
}
