package graft.ingest

import graft.ingest.ManifestCommit.ColStats
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** MERGE INTO over a manifest-committed table — the copy-on-write upsert
  * the reference expresses as ReplacingMergeTree INSERT + `FINAL` collapse
  * (tools/ingest_runner.py:1598-1789 rewrites whole tables through the
  * staging swap; a lakehouse deployment needs row-level merge without the
  * full rewrite). Public Delta/Iceberg MERGE semantics:
  *
  *   - matched (target key = source key): DELETE when `deleteWhen` holds
  *     on the source row, otherwise UPDATE (the source row replaces the
  *     target row);
  *   - not matched: INSERT the source row (unless `insertUnmatched` is
  *     off, or it is a delete of an absent key — a no-op).
  *
  * Copy-on-write is DIR-level, arbitrated by the manifest's commit-time
  * column stats: a live data dir whose `keys.head` [min, max] range
  * provably contains NO source key is never read, never rewritten, and
  * survives the commit byte-identical — on a 100 TB table a merge that
  * touches one hot range costs O(touched dirs + source), not O(table).
  * The affected-dir test is EXACT (one aggregate over the source counting
  * keys inside each dir's range — a single job, one long per dir on the
  * driver), not a min/max-overlap approximation, so a source whose key
  * span straddles a cold dir without actually containing any of its keys
  * still skips it. Dirs without stats on `keys.head` are always rewritten
  * (stats are an optimization, never a correctness gate — same contract
  * as `ManifestCommit.resolvePruned`).
  *
  * The rewrite itself is ONE null-safe full-outer join between the
  * touched dirs and the source on `keys` — survivors, updates, deletes
  * and inserts all fall out of the join sides, so the merge costs one
  * shuffle of (touched ∪ source), with per-action counts metered by
  * `observe` on the same pass (no second job). Unmatched-ness only needs
  * the touched dirs: a source key outside every live dir's range cannot
  * match anywhere by construction.
  *
  * Commit is optimistic-concurrency: the new live set (kept dirs + one
  * new dir) replaces the generation this merge READ via
  * `expectedGen` CAS — a concurrent writer landing in between raises
  * `ConcurrentCommitException` and the caller re-reads and retries.
  * History is preserved (`pruneDisplaced = false`), so time travel and
  * `ChangeFeed.diff` see the merge as one generation step.
  *
  * Contract: `source` carries every target column and is UNIQUE on
  * `keys` (enforced with one cheap aggregate — a duplicate-key source
  * makes "the source row" ill-defined, the same reason the reference's
  * collapse requires a version order).
  */
object MergeInto {

  final case class MergeResult(
      gen: Long,
      dirsTotal: Int,
      dirsRewritten: Int,
      updated: Long,
      deleted: Long,
      inserted: Long,
      survivors: Long)

  def merge(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keys: Seq[String],
      deleteWhen: Option[Column] = None,
      insertUnmatched: Boolean = true,
      evolveSchema: Boolean = false): MergeResult = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val m = ManifestCommit.readManifest(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root is not a manifest-committed table"))

    val live = ManifestCommit.read(spark, root)
    val tCols = live.columns.toSeq
    require(tCols.forall(source.columns.contains),
      s"source must carry every target column; missing " +
        tCols.filterNot(source.columns.contains).mkString(","))
    // schema evolution (the reference's fixer relaxes schemas mid-stream,
    // tools/fix_clickhouse_schemas.py:73-166): NEW source columns append
    // to the table schema. Only the rewritten dir materializes them;
    // cold dirs stay byte-identical and null-fill at read through the
    // manifest's recorded union schema (explicit-schema parquet read —
    // no planning-time footer sweep). Without the flag, extra source
    // columns are dropped, the pre-evolution contract.
    val extraCols: Seq[String] =
      if (evolveSchema) source.columns.toSeq.filterNot(tCols.contains) else Nil
    val outCols = tCols ++ extraCols

    // ---- ONE aggregate over the source: key uniqueness AND the exact
    // affected-dir counts ride the same pass (they scan the same frame —
    // two jobs here is pure sequential-latency waste on a merge gate)
    val pruneCol = keys.head
    val dirRange: Seq[(String, Option[ColStats])] =
      m.dirs.map(d => d -> m.stats.getOrElse(d, Nil).find(_.col == pruneCol))
    val statless = dirRange.collect { case (d, None) => d }
    val ranged = dirRange.collect { case (d, Some(cs)) => (d, cs) }
    val rangeAggs = ranged.map { case (_, cs) =>
      val c = source.col(pruneCol)
      val in =
        if (cs.kind == "num")
          c.cast(DecimalType(38, 6)).between(
            lit(new java.math.BigDecimal(cs.min)), lit(new java.math.BigDecimal(cs.max)))
        else c.cast(StringType).between(lit(cs.min), lit(cs.max))
      sum(when(in, 1L).otherwise(0L))
    }
    val aggRow = source.agg(count(lit(1)).as("n"),
      (countDistinct(keys.head, keys.tail: _*).as("d") +: rangeAggs): _*)
      .collect()(0)
    require(aggRow.getLong(0) == aggRow.getLong(1),
      s"source is not unique on (${keys.mkString(",")}): " +
        s"${aggRow.getLong(0)} rows, ${aggRow.getLong(1)} distinct keys")
    val touched: Set[String] = statless.toSet ++
      ranged.zipWithIndex.collect {
        case ((d, _), i) if !aggRow.isNullAt(i + 2) && aggRow.getLong(i + 2) > 0 => d
      }
    val keptDirs = m.dirs.filterNot(touched)

    // ---- one full-outer join: survivors + updates + deletes + inserts
    val tgt = extraCols.foldLeft(
      (if (touched.isEmpty) live.limit(0)
       // DV-aware subset read: a touched dir's deletion vector must be
       // applied here, or the rewrite would resurrect deleted rows
       else ManifestCommit.readDirsOf(spark, root, m, m.dirs.filter(touched)))
        .select(tCols.map(col): _*)) { (d, c) =>
        // target rows predate the new column → null (Delta/Iceberg
        // evolution semantics); the cast pins the source's exact type
        d.withColumn(c, lit(null).cast(source.schema(c).dataType))
      }
      .withColumn("__t", lit(true))
    val src = source
      .withColumn("__del", deleteWhen.getOrElse(lit(false)))
      .select((outCols.map(col) :+ col("__del")): _*)
      .withColumn("__s", lit(true))
    val cond = keys.map(k => tgt(k) <=> src(k)).reduce(_ && _)
    val joined = tgt.join(src, cond, "full_outer")

    val action = when(src("__s").isNull, lit("keep"))
      .when(tgt("__t").isNull,
        when(!src("__del") && lit(insertUnmatched), lit("insert"))
          .otherwise(lit("skip")))
      .when(src("__del"), lit("delete"))
      .otherwise(lit("update"))

    // preserve kept dirs' stats; the SAME cols for the new dir are
    // metered by observe on the write pass itself — no post-write
    // dirStats re-read of the dir we just produced
    val statCols = m.stats.values.flatten.map(_.col).toSeq.distinct match {
      case Nil => keys
      case cs => cs
    }
    val realStatCols = statCols.filterNot(_ == ManifestCommit.RowCountStat)
    val wantRows = statCols.contains(ManifestCommit.RowCountStat)

    // observe BEFORE the filter so deleted/skipped rows are still metered
    // on the same single pass that writes the output; stat min/max are
    // conditional on the row being WRITTEN (a deleted row's values must
    // not widen the new dir's pruning range)
    val written =
      col("__action") =!= "delete" && col("__action") =!= "skip"
    val obs = Observation()
    val statAggs = realStatCols.flatMap(c => Seq(
      min(when(written, col(c))).as(s"__mn_$c"),
      max(when(written, col(c))).as(s"__mx_$c")))
    val out = joined
      .select((outCols.map(c => when(action === "keep", tgt(c)).otherwise(src(c)).as(c)) :+
        action.as("__action")): _*)
      .observe(obs,
        sum(when(col("__action") === "update", 1L).otherwise(0L)).as("updated"),
        (Seq(
          sum(when(col("__action") === "delete", 1L).otherwise(0L)).as("deleted"),
          sum(when(col("__action") === "insert", 1L).otherwise(0L)).as("inserted"),
          sum(when(col("__action") === "keep", 1L).otherwise(0L)).as("survivors")) ++
          statAggs): _*)
      .filter(written)
      .drop("__action")

    val newDir = ManifestCommit.newDataDir(root)
    out.write.parquet(newDir)

    val metrics = obs.get
    def metric(name: String): Long = metrics.get(name) match {
      case Some(v: java.lang.Long) => v.longValue()
      case Some(v) if v != null => v.toString.toLong
      case _ => 0L
    }
    val (upd, del, ins, keep) =
      (metric("updated"), metric("deleted"), metric("inserted"), metric("survivors"))

    val newStats =
      if (upd + ins + keep == 0L) Nil
      else realStatCols.flatMap { c =>
        ManifestCommit.colStatsOf(c, out.schema(c).dataType,
          metrics.get(s"__mn_$c").orNull, metrics.get(s"__mx_$c").orNull)
      } ++ (if (wantRows)
        Seq(ColStats(ManifestCommit.RowCountStat, "num",
          (upd + ins + keep).toString, (upd + ins + keep).toString))
      else Nil)
    val keptStats = m.stats.view.filterKeys(keptDirs.contains).toMap
    val newName = new org.apache.hadoop.fs.Path(newDir).getName
    // every merge records the (possibly evolved) union schema: readers of
    // this generation plan with it explicitly, so cold dirs that predate
    // an evolved column null-fill without any footer sweep. Nullability
    // is forced — a cold dir has no values for an evolved column.
    val unionSchema = org.apache.spark.sql.types.StructType(
      out.schema.fields.map(_.copy(nullable = true)))
    val committed = ManifestCommit.commitReplace(
      spark, root, keptDirs :+ newName,
      pruneDisplaced = false,
      stats = keptStats ++
        (if (newStats.nonEmpty) Map(newName -> newStats) else Map.empty),
      expectedGen = Some(m.gen),
      schema = Some(unionSchema),
      op = "merge",
      // kept dirs keep their deletion vectors; touched dirs' DVs were
      // materialized into the rewrite and must not carry over
      dvs = m.dvs.view.filterKeys(keptDirs.contains).toMap)

    MergeResult(committed.gen, m.dirs.size, m.dirs.size - keptDirs.size,
      upd, del, ins, keep)
  }

  final case class DeleteResult(
      gen: Long,
      dirsTotal: Int,
      dvsWritten: Int,
      deleted: Long)

  /** MERGE-ON-READ delete (public Delta deletion-vector / Iceberg
    * delete-file idea): subtract `keys` (a DataFrame holding exactly the
    * key columns) from the table WITHOUT rewriting any data dir. For
    * each dir the manifest's stats prove affected, the keys actually
    * present in that dir (one broadcast semi-join per touched dir — the
    * key set is small by the nature of a delete) are unioned into a NEW
    * immutable `_dv_*` file and the manifest repoints. Cost is
    * O(touched dirs × delete keys), never O(table) — the copy-on-write
    * worst case this exists for is a SPARSE delete scattered across
    * every dir, where `merge` would rewrite the whole table.
    *
    * Reads apply DVs as per-dir anti-joins; `OPTIMIZE`/compaction and a
    * later `merge` of a dv'd dir materialize the subtraction and drop
    * the DV. Time travel is exact: each generation references its own
    * immutable dv files. */
  def deleteWhere(
      spark: SparkSession,
      root: String,
      keys: DataFrame): DeleteResult = {
    val keyCols = keys.columns.toSeq
    require(keyCols.nonEmpty, "deleteWhere requires at least one key column")
    val m = ManifestCommit.readManifest(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root is not a manifest-committed table"))
    val distinctKeys = keys.distinct().cache()
    try {
      // exact affected-dir test on keyCols.head — same contract as merge
      val pruneCol = keyCols.head
      val dirRange: Seq[(String, Option[ColStats])] =
        m.dirs.map(d => d -> m.stats.getOrElse(d, Nil).find(_.col == pruneCol))
      val statless = dirRange.collect { case (d, None) => d }
      val ranged = dirRange.collect { case (d, Some(cs)) => (d, cs) }
      val touched: Seq[String] = statless ++ (if (ranged.isEmpty) Nil else {
        val aggs = ranged.map { case (_, cs) =>
          val c = distinctKeys.col(pruneCol)
          val in =
            if (cs.kind == "num")
              c.cast(DecimalType(38, 6)).between(
                lit(new java.math.BigDecimal(cs.min)), lit(new java.math.BigDecimal(cs.max)))
            else c.cast(StringType).between(lit(cs.min), lit(cs.max))
          sum(when(in, 1L).otherwise(0L))
        }
        val row = distinctKeys.agg(aggs.head, aggs.tail: _*).collect()(0)
        ranged.zipWithIndex.collect {
          case ((d, _), i) if !row.isNullAt(i) && row.getLong(i) > 0 => d
        }
      })

      // per-dir DV builds are INDEPENDENT small jobs (semi-join + count +
      // tiny write) — submit them from concurrent threads so their
      // scheduling gaps overlap, the same latency shape (and fix) as
      // Similarity.pqTrainCodebooks' subspace trainers
      val results: Seq[(String, String, Long)] = if (touched.isEmpty) Nil else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(touched.size, 8))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(touched.map { d => Future {
          // keys actually present among the dir's LIVE rows (existing DV
          // applied first, so re-deleting an already-deleted key is a no-op)
          val liveDir = ManifestCommit.readDirsOf(spark, root, m, Seq(d))
          val present = liveDir.join(broadcast(distinctKeys), keyCols, "left_semi")
            .select(keyCols.map(col): _*).distinct()
          val newlyDeleted = present.count()
          if (newlyDeleted == 0L) (d, "", 0L)
          else {
            val dvDf = m.dvs.get(d) match {
              case Some(old) => spark.read.parquet(s"$root/$old")
                .unionByName(present).distinct()
              case None => present
            }
            val dvName = s"_dv_${java.util.UUID.randomUUID().toString.replace("-", "").take(16)}"
            dvDf.coalesce(1).write.parquet(s"$root/$dvName")
            (d, dvName, newlyDeleted)
          }
        } }), Duration.Inf)
        finally pool.shutdown()
      }
      val totalDeleted = results.map(_._3).sum
      val newDvs = results.collect { case (d, dv, n) if n > 0L => d -> dv }.toMap

      val committed =
        if (newDvs.isEmpty) m // nothing present anywhere: no commit needed
        else ManifestCommit.commitReplace(spark, root, m.dirs,
          pruneDisplaced = false,
          stats = m.stats,
          expectedGen = Some(m.gen),
          schema = m.tableSchema,
          op = "delete",
          dvs = m.dvs ++ newDvs)
      DeleteResult(committed.gen, m.dirs.size, newDvs.size, totalDeleted)
    } finally distinctKeys.unpersist()
  }
}
