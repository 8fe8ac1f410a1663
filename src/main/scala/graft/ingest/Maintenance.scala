package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
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
    * see either the old or the new table, never a partial one.
    * `oldPath` overrides the parking name for the displaced dir — the
    * per-partition compactor needs a dot-prefixed one, because its
    * targets are `__yyyymm=` dirs and a default `<dir>__old` sibling
    * CONTAINS '=' and would be picked up by partition discovery as a
    * bogus partition value. */
  def stagingSwap(spark: SparkSession, stagingPath: String, finalPath: String,
      oldPath: Option[String] = None): Unit = {
    val f = fs(spark, finalPath)
    val staging = new Path(stagingPath)
    val fin = new Path(finalPath)
    val old = new Path(oldPath.getOrElse(finalPath + "__old"))
    if (f.exists(old)) f.delete(old, true)
    if (f.exists(fin)) {
      if (!f.rename(fin, old)) sys.error(s"swap: cannot rename $fin -> $old")
    }
    if (!f.rename(staging, fin)) sys.error(s"swap: cannot rename $staging -> $fin")
    f.delete(old, true)
    ()
  }

  /** Shared compaction writer: the SAME physical layout the ingest write
    * path establishes — local sort on the sorting key (parquet row-group
    * min/max → key-range skipping) + PK parquet bloom filters (point-probe
    * row-group skipping). A compaction that dropped these would silently
    * degrade the table's read path after the first OPTIMIZE — the skipping
    * structures are 'decisive at 100 TB' precisely on the big compacted
    * tables. */
  private def writeCompacted(df: DataFrame, parts: Int, sortingKey: Seq[String],
      bloomKeys: Seq[String], staging: String): Unit = {
    val sortKey = sortingKey.filter(df.columns.contains)
    val base = df.repartition(parts)
    val sorted =
      if (sortKey.nonEmpty) base.sortWithinPartitions(sortKey.map(col): _*) else base
    val bloomOpts = bloomKeys.filter(df.columns.contains)
      .map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap
    sorted.write.mode(SaveMode.Overwrite).options(bloomOpts).parquet(staging)
  }

  /** M5 — OPTIMIZE/compaction: rewrite a table dir into ~`targetMB`-sized
    * files (small-file compaction after incremental loads), preserving the
    * ingest layout when the caller supplies the keys. */
  def optimizeCompact(spark: SparkSession, path: String, targetMB: Int = 128,
      sortingKey: Seq[String] = Nil, bloomKeys: Seq[String] = Nil): Unit = {
    val f = fs(spark, path)
    val bytes = f.getContentSummary(new Path(path)).getLength
    val parts = math.max(1, (bytes / (targetMB.toLong << 20)).toInt)
    val staging = path + "__compact"
    writeCompacted(spark.read.parquet(path), parts, sortingKey, bloomKeys, staging)
    stagingSwap(spark, staging, path)
  }

  /** M5 companion — OPTIMIZE FINAL for a Replacing target: physically
    * collapse latest-per-key across delta parts and rewrite as
    * ~`targetMB`-sized files via atomic swap
    * (tools/ingest_runner.py:1782-1787 runs exactly this after ingest).
    * O(target) by nature — runs on a maintenance schedule, never on the
    * per-batch write path. `sortingKey` re-establishes the ingest write
    * path's local sort; PK bloom filters are always rebuilt from `keys`. */
  def compactFinal(spark: SparkSession, path: String, keys: Seq[String],
      version: Option[String], tieBreak: Seq[String] = Nil,
      targetMB: Int = 128, sortingKey: Seq[String] = Nil): Unit = {
    val f = fs(spark, path)
    val bytes = ManifestCommit.resolvePaths(spark, path)
      .map(p => f.getContentSummary(new Path(p)).getLength).sum
    val parts = math.max(1, (bytes / (targetMB.toLong << 20)).toInt)
    val collapsed = Ingest.readFinal(spark, path, keys, version, tieBreak)
    if (ManifestCommit.isManifestTable(spark, path)) {
      // manifest-committed target: write the merged generation to a fresh
      // dir, then one atomic manifest replace retires every delta dir —
      // no directory rename anywhere (object-store-safe)
      val dataDir = ManifestCommit.newDataDir(path)
      writeCompacted(collapsed,
        parts, if (sortingKey.nonEmpty) sortingKey else keys, keys, dataDir)
      ManifestCommit.commitReplace(spark, path, Seq(dataDir), op = "compact")
    } else {
      val staging = path + "__compact"
      writeCompacted(collapsed,
        parts, if (sortingKey.nonEmpty) sortingKey else keys, keys, staging)
      stagingSwap(spark, staging, path)
    }
  }

  /** M5 companion for month-partitioned Replacing targets: compact each
    * `__yyyymm=` partition directory independently, preserving the
    * partition layout a flat compactFinal rewrite would drop. Correct wrt
    * FINAL semantics: the globally-latest version of a key is also the
    * latest within its own partition, so per-partition collapse never
    * drops it; duplicates of a key ACROSS partitions still collapse at
    * read via readFinal — the same contract as ClickHouse, where merges
    * never cross partition boundaries. Scratch dirs are dot-prefixed and
    * '='-free so partition discovery can never see them (a `<dir>__old`
    * sibling would parse as partition value "<month>__old").
    *
    * Cold partitions are SKIPPED: a partition is rewritten only when its
    * data-file count exceeds max(`minPartFiles`, its ideal compacted file
    * count bytes/targetMB). On a years-deep log table only the hot months
    * (the ones accumulating delta parts) pay the rewrite — O(hot months)
    * per compaction, not O(whole table). ClickHouse merges have the same
    * shape: background merges pick fragmented parts, never re-merge a
    * partition already at its target part count. */
  def compactFinalPartitioned(spark: SparkSession, path: String,
      keys: Seq[String], version: Option[String], tieBreak: Seq[String] = Nil,
      targetMB: Int = 128, sortingKey: Seq[String] = Nil,
      minPartFiles: Int = 0): Unit = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .foreach { st =>
        val pdir = st.getPath
        val month = pdir.getName.substring(pdir.getName.indexOf('=') + 1)
        val bytes = f.getContentSummary(pdir).getLength
        val parts = math.max(1, (bytes / (targetMB.toLong << 20)).toInt)
        if (dataFileCount(spark, pdir.toString) > math.max(minPartFiles, parts)) {
          val collapsed = Ingest.readFinal(spark, pdir.toString, keys, version, tieBreak)
          val staging = new Path(root, s".staging_compact_$month").toString
          writeCompacted(collapsed,
            parts, if (sortingKey.nonEmpty) sortingKey else keys, keys, staging)
          stagingSwap(spark, staging, pdir.toString,
            oldPath = Some(new Path(root, s".old_compact_$month").toString))
        }
      }
  }

  /** M5 hygiene — remove crash leftovers of the swap/compact protocol: a
    * job killed between the staging write and the rename leaves
    * `<table>__staging` / `<table>__compact` / `<table>__old` (and batch
    * ingest's `.staging_<table>`, the per-partition compactor's
    * `.old_compact_<month>`) directories holding a full table copy each.
    * They are write-scratch by construction — the LIVE table never has
    * these names — so deleting them reclaims the space before the next
    * load doubles it again. `minAgeMs` guards IN-FLIGHT scratch: a
    * concurrent ingestAll/compactFinal is actively writing dirs with
    * these same names, and a vacuum racing it would delete live scratch
    * mid-swap. Freshness is judged by the NEWEST mtime anywhere under the
    * scratch dir (recursive max), not the dir entry itself: directory
    * mtime only updates when a direct child is created/renamed, so a
    * slow single-file write or a long commit pause would let the dir
    * entry age past the cutoff while the writer is still alive. Crash
    * leftovers are by definition old everywhere; 15 minutes is far above
    * any single staging write. Pass 0 only when no loads can be running.
    * Object-store caveat: S3-style stores don't maintain directory
    * mtimes at all and object timestamps are commit-time — the recursive
    * form still works there (file timestamps exist), but a writer that
    * has not yet committed its FIRST object is invisible; on such stores
    * run vacuum only from the ingest scheduler's quiescent window.
    * Returns the paths removed. */
  def vacuumScratch(spark: SparkSession, tableRoot: String,
      minAgeMs: Long = 15 * 60 * 1000L): Seq[String] = {
    val f = fs(spark, tableRoot)
    val root = new Path(tableRoot)
    if (!f.exists(root)) return Nil
    val cutoff = System.currentTimeMillis() - minAgeMs
    def newestMtime(p: Path): Long = {
      var newest = f.getFileStatus(p).getModificationTime
      val it = f.listFiles(p, true)
      while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
      newest
    }
    f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .filter { st =>
        val n = st.getPath.getName
        (n.endsWith("__staging") || n.endsWith("__compact") ||
          n.endsWith("__old") || n.startsWith(".staging_") ||
          n.startsWith(".old_compact_")) &&
          newestMtime(st.getPath) <= cutoff
      }
      .map { st => f.delete(st.getPath, true); st.getPath.toString }
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
