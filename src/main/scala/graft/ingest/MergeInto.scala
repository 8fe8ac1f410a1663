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

  /** Largest ranged-dir count for which the exact affected-dir test rides
    * per-dir conditional-sum columns inside ONE aggregate. Beyond it the
    * plan itself becomes O(dirs) expressions — at 10k+ dirs codegen and
    * analysis choke on a 10k-column aggregate long before any data moves
    * — so the test goes two-stage: a free driver-side [srcMin, srcMax]
    * overlap prune over the manifest stats first, then the exact per-dir
    * counts only over the overlap SURVIVORS. A hot-band source on a
    * range-laid-out table survives to a handful of dirs (exact, one
    * small aggregate); a scattered source that overlaps more than the
    * cap falls back to overlap-based pruning — still CORRECT (rewriting
    * an overlap-only dir preserves its rows through the merge join; the
    * cost is I/O, not answers), and exactly the public Delta/Iceberg
    * min-max merge-pruning contract. */
  private val MaxExactRangeDirs = 512

  private def inRangeSum(df: DataFrame, keyCol: String,
      cs: ColStats): org.apache.spark.sql.Column = {
    val c = df.col(keyCol)
    val in =
      if (cs.kind == "num")
        c.cast(DecimalType(38, 6)).between(
          lit(new java.math.BigDecimal(cs.min)), lit(new java.math.BigDecimal(cs.max)))
      else c.cast(StringType).between(lit(cs.min), lit(cs.max))
    sum(when(in, 1L).otherwise(0L))
  }

  /** Two-stage exact-or-overlap affected-dir test (see
    * [[MaxExactRangeDirs]]): candidates by stats overlap with the
    * source's own key range, then exact counts when few enough. */
  private def exactOrOverlapTouched(src: DataFrame, keyCol: String,
      ranged: Seq[(String, ColStats)],
      srcRange: Option[ColStats]): Set[String] = {
    val candidates = srcRange match {
      case None => Nil // empty source: nothing touched
      case Some(sr) =>
        ranged.filter { case (_, cs) => cs.overlaps(Some(sr.min), Some(sr.max)) }
    }
    if (candidates.isEmpty) Set.empty
    else if (candidates.size > MaxExactRangeDirs) candidates.map(_._1).toSet
    else {
      val aggs = candidates.map { case (_, cs) => inRangeSum(src, keyCol, cs) }
      val row = src.agg(aggs.head, aggs.tail: _*).collect()(0)
      candidates.zipWithIndex.collect {
        case ((d, _), i) if !row.isNullAt(i) && row.getLong(i) > 0 => d
      }.toSet
    }
  }

  final case class MergeResult(
      gen: Long,
      dirsTotal: Int,
      dirsRewritten: Int,
      updated: Long,
      deleted: Long,
      inserted: Long,
      survivors: Long)

  /** `retries`: bounded AUTO-retry on an irreconcilable concurrent commit
    * — each attempt re-reads the manifest and re-runs the whole merge
    * (the OCC loop every production writer needs; the rebase in
    * `commitReconciled` already absorbs COMMUTING interleaves without
    * re-running, so a retry only fires when the conflict is real). The
    * aborted attempt's staged dir is reclaimed eagerly, not left for
    * `pruneOrphans`. Default 0 preserves throw-on-conflict.
    *
    * `unmatchedDeleteInserts`: what an UNMATCHED source row with a true
    * `deleteWhen` means. The programmatic default (false) treats it as a
    * delete of an absent key — a no-op (the delete-feed shape q147's
    * replication applies). SQL MERGE passes true: matched-clause
    * conditions never apply to unmatched rows there, so such a row falls
    * through to WHEN NOT MATCHED INSERT. */
  def merge(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keys: Seq[String],
      deleteWhen: Option[Column] = None,
      insertUnmatched: Boolean = true,
      evolveSchema: Boolean = false,
      retries: Int = 0,
      unmatchedDeleteInserts: Boolean = false): MergeResult = {
    var attempt = 0
    while (attempt < retries.max(0)) {
      try return mergeOnce(spark, root, source, keys, deleteWhen,
        insertUnmatched, evolveSchema, unmatchedDeleteInserts)
      catch {
        case _: ManifestCommit.ConcurrentCommitException => attempt += 1
      }
    }
    mergeOnce(spark, root, source, keys, deleteWhen, insertUnmatched,
      evolveSchema, unmatchedDeleteInserts) // final attempt propagates its conflict
  }

  private def mergeOnce(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keys: Seq[String],
      deleteWhen: Option[Column],
      insertUnmatched: Boolean,
      evolveSchema: Boolean,
      unmatchedDeleteInserts: Boolean = false): MergeResult = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val m = ManifestCommit.readManifest(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root is not a manifest-committed table"))

    // the target's schema comes from the MANIFEST when recorded — building
    // a frame over every live dir just to learn the column set forces an
    // InMemoryFileIndex listing of ALL of them (measured: the dominant
    // cost of a hot-band merge at 16k dirs, a driver-side listing job
    // before any real work). Unrecorded-schema tables keep the
    // read-through-manifest fallback (mergeSchema footer sweep — correct,
    // just slower; the same readDirsOf contract as everywhere else).
    val tSchema: org.apache.spark.sql.types.StructType =
      m.tableSchema.getOrElse(
        ManifestCommit.readDirsOf(spark, root, m, m.dirs).schema)
    val tCols = tSchema.fieldNames.toSeq
    require(tCols.forall(source.columns.contains),
      s"source must carry every target column; missing " +
        tCols.filterNot(source.columns.contains).mkString(","))
    // schema evolution (the reference's fixer relaxes schemas mid-stream,
    // tools/fix_clickhouse_schemas.py:73-166): NEW source columns append
    // to the table schema. Only the rewritten dir materializes them;
    // cold dirs stay byte-identical and null-fill at read through the
    // manifest's recorded union schema (explicit-schema parquet read —
    // no planning-time footer sweep). Without the flag, extra source
    // columns are dropped, the pre-evolution contract. `__graft_`-prefixed
    // columns are RESERVED engine helpers (the SQL MERGE delete-clause
    // carrier) and never evolve onto the table.
    val extraCols: Seq[String] =
      if (evolveSchema) source.columns.toSeq.filterNot(tCols.contains)
        .filterNot(_.startsWith("__graft_"))
      else Nil
    val outCols = tCols ++ extraCols

    // ---- ONE aggregate over the source: key uniqueness, the source's
    // own key range + null witness (the rebase DISJOINTNESS proof against
    // dirs a concurrent commit adds — see commitReconciled below), AND —
    // when the dir count keeps the plan small — the exact per-dir
    // affected counts, all on the same pass (a second job here is pure
    // sequential-latency waste on a merge gate)
    val pruneCol = keys.head
    val dirRange: Seq[(String, Option[ColStats])] =
      m.dirs.map(d => d -> m.stats.getOrElse(d, Nil).find(_.col == pruneCol))
    val statless = dirRange.collect { case (d, None) => d }
    val ranged = dirRange.collect { case (d, Some(cs)) => (d, cs) }
    val few = ranged.size <= MaxExactRangeDirs
    val rangeAggs =
      if (few) ranged.map { case (_, cs) => inRangeSum(source, pruneCol, cs) }
      else Nil
    val aggRow = source.agg(count(lit(1)).as("n"),
      ((countDistinct(keys.head, keys.tail: _*).as("d") +: rangeAggs) ++ Seq(
        min(source.col(pruneCol)), max(source.col(pruneCol)),
        sum(when(source.col(pruneCol).isNull, 1L).otherwise(0L)))): _*)
      .collect()(0)
    require(aggRow.getLong(0) == aggRow.getLong(1),
      s"source is not unique on (${keys.mkString(",")}): " +
        s"${aggRow.getLong(0)} rows, ${aggRow.getLong(1)} distinct keys")
    val nR = rangeAggs.size
    val srcEmpty = aggRow.getLong(0) == 0L
    val srcRange = ManifestCommit.colStatsOf(pruneCol,
      source.schema(pruneCol).dataType,
      aggRow.get(nR + 2), aggRow.get(nR + 3))
    val srcHasNullKey =
      !aggRow.isNullAt(nR + 4) && aggRow.getLong(nR + 4) > 0L
    val touched: Set[String] = statless.toSet ++ (
      if (srcEmpty) Set.empty[String]
      // stats cannot witness null keys, and the merge join is null-SAFE
      // (<=>): a null-keyed source row may match a null-keyed target row
      // in ANY dir, so every ranged dir must be read — conservative,
      // never wrong (the old conditional-sum test silently matched null
      // keys nowhere and could duplicate a null-keyed row)
      else if (srcHasNullKey) ranged.map(_._1).toSet
      else if (few)
        ranged.zipWithIndex.collect {
          case ((d, _), i) if !aggRow.isNullAt(i + 2) && aggRow.getLong(i + 2) > 0 => d
        }.toSet
      else exactOrOverlapTouched(source, pruneCol, ranged, srcRange))
    val keptDirs = m.dirs.filterNot(touched)
    // a concurrently-added dir is provably untouched by this merge when
    // its recorded key range cannot overlap the source's (null keys defeat
    // range proofs — the <=> join matches them; no stats = no proof)
    val disjointFromSource: (String, Seq[ColStats]) => Boolean = (_, stats) =>
      srcEmpty || (!srcHasNullKey && srcRange.exists(sr =>
        stats.find(_.col == pruneCol).exists(cs =>
          !cs.overlaps(Some(sr.min), Some(sr.max)))))

    // ---- one full-outer join: survivors + updates + deletes + inserts
    val tgt = extraCols.foldLeft(
      (if (touched.isEmpty)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), tSchema)
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
        when((lit(unmatchedDeleteInserts) || !src("__del")) && lit(insertUnmatched),
          lit("insert")).otherwise(lit("skip")))
      .when(src("__del"), lit("delete"))
      .otherwise(lit("update"))

    // preserve kept dirs' stats; the SAME cols for the new dir are
    // metered by observe on the write pass itself — no post-write
    // dirStats re-read of the dir we just produced
    val statCols = m.stats.values.flatten.map(s => ManifestCommit.baseStatCol(s.col)).toSeq.distinct match {
      case Nil => keys
      case cs => cs
    }
    val realStatCols = statCols.filterNot(ManifestCommit.PseudoStats)
    val wantRows = statCols.contains(ManifestCommit.RowCountStat)

    // observe BEFORE the filter so deleted/skipped rows are still metered
    // on the same single pass that writes the output; stat min/max are
    // conditional on the row being WRITTEN (a deleted row's values must
    // not widen the new dir's pruning range)
    val written =
      col("__action") =!= "delete" && col("__action") =!= "skip"
    val obs = Observation()
    // a stat "column" may be a slice-component EXPRESSION text (bucket
    // components of a composite slice) — re-parse those with expr()
    def statCol(c: String, cols: Seq[String]) =
      if (cols.contains(c)) col(c) else org.apache.spark.sql.functions.expr(c)
    val statAggs = realStatCols.flatMap(c => Seq(
      min(when(written, statCol(c, outCols))).as(s"__mn_$c"),
      max(when(written, statCol(c, outCols))).as(s"__mx_$c"),
      // non-null counter, same pass — observe-computed stats stay
      // interchangeable with a dirStats re-read (MergeIntoSpec pins it)
      count(when(written, statCol(c, outCols))).as(s"__nn_$c")))
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
    // logical->physical rename under a column mapping (no-op otherwise);
    // stats were observed on the logical frame above, so keys stay logical
    ManifestCommit.toPhysicalNames(spark, root, out).write.parquet(newDir)

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
        val dt =
          if (out.columns.contains(c)) out.schema(c).dataType
          else out.select(org.apache.spark.sql.functions.expr(c))
            .schema.head.dataType
        ManifestCommit.colStatsOf(c, dt,
          metrics.get(s"__mn_$c").orNull, metrics.get(s"__mx_$c").orNull)
          .toSeq :+ ColStats(ManifestCommit.nnStat(c), "num",
            metrics.get(s"__nn_$c").map(_.toString).getOrElse("0"),
            metrics.get(s"__nn_$c").map(_.toString).getOrElse("0"))
      } ++ (if (wantRows)
        Seq(ColStats(ManifestCommit.RowCountStat, "num",
          (upd + ins + keep).toString, (upd + ins + keep).toString))
      else Nil) ++
        // exact on-disk bytes for the rewritten dir ([[BytesStat]])
        Seq(ManifestCommit.dirBytesStat(spark, newDir))
    val newName = new org.apache.hadoop.fs.Path(newDir).getName
    // every merge records the (possibly evolved) union schema: readers of
    // this generation plan with it explicitly, so cold dirs that predate
    // an evolved column null-fill without any footer sweep. Nullability
    // is forced — a cold dir has no values for an evolved column.
    val unionSchema = org.apache.spark.sql.types.StructType(
      out.schema.fields.map(_.copy(nullable = true)))
    // rebasing commit: touched dirs are both the read set (pinned — a
    // concurrent rewrite of one means this output is stale) and the
    // displaced set; kept dirs' stats and DVs (including concurrent
    // repoints on dirs this merge never read) carry from the CURRENT
    // generation; a disjoint concurrent append grafts in
    // CHECK constraints are proven on the STAGED output — exactly the
    // rows that will serve reads, so delete-clause rows (never written)
    // and nondeterministic sources are handled soundly; a violation
    // deletes the staged dir and refuses the merge before any commit
    if (upd + ins + keep > 0)
      ManifestCommit.validateWrittenChecks(spark, root, m.checks,
        Seq(newName), "MERGE")
    val committed =
      try ManifestCommit.commitReconciled(
        spark, root, base = m,
        displaced = m.dirs.filter(touched),
        added = Seq(newName),
        addedStats =
          if (newStats.nonEmpty) Map(newName -> newStats) else Map.empty,
        schema = Some(unionSchema),
        op = "merge",
        pinned = touched,
        disjoint = disjointFromSource,
        // Some even when the read set was empty — a concurrent ADD
        // CONSTRAINT must fail this commit's CAS, not adopt its rows
        expectedChecks = Some(m.checks))
      catch {
        case e: ManifestCommit.ConcurrentCommitException =>
          // the staged rewrite can never be referenced — reclaim it now
          // (a retried merge re-stages from the new generation) instead
          // of leaving it to pruneOrphans' freshness window
          new org.apache.hadoop.fs.Path(newDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(newDir), true)
          throw e
      }

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
  /** `retries`: bounded auto-retry on concurrent-commit conflict, the
    * same OCC loop as [[merge]]; staged `_dv_*` files of an aborted
    * attempt are reclaimed eagerly. */
  def deleteWhere(
      spark: SparkSession,
      root: String,
      keys: DataFrame,
      retries: Int = 0): DeleteResult = {
    var attempt = 0
    while (attempt < retries.max(0)) {
      try return deleteWhereOnce(spark, root, keys)
      catch {
        case _: ManifestCommit.ConcurrentCommitException => attempt += 1
      }
    }
    deleteWhereOnce(spark, root, keys)
  }

  private def deleteWhereOnce(
      spark: SparkSession,
      root: String,
      keys: DataFrame): DeleteResult = {
    val keyCols = keys.columns.toSeq
    require(keyCols.nonEmpty, "deleteWhere requires at least one key column")
    val m = ManifestCommit.readManifest(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root is not a manifest-committed table"))
    val distinctKeys = keys.distinct().cache()
    try {
      // exact affected-dir test on keyCols.head — same contract (and same
      // two-stage high-dir-count shape) as merge; the delete set's own
      // range + null witness ride the same pass as the rebase
      // disjointness proof (commitReconciled below). Null delete keys
      // need no conservative widening here: the per-dir semi-join is
      // null-UNSAFE equality, so a null key deletes nothing by contract.
      val pruneCol = keyCols.head
      val dirRange: Seq[(String, Option[ColStats])] =
        m.dirs.map(d => d -> m.stats.getOrElse(d, Nil).find(_.col == pruneCol))
      val statless = dirRange.collect { case (d, None) => d }
      val ranged = dirRange.collect { case (d, Some(cs)) => (d, cs) }
      val few = ranged.size <= MaxExactRangeDirs
      val rangeAggs =
        if (few) ranged.map { case (_, cs) => inRangeSum(distinctKeys, pruneCol, cs) }
        else Nil
      val aggRow = distinctKeys.agg(count(lit(1)).as("n"),
        (rangeAggs ++ Seq(
          min(distinctKeys.col(pruneCol)), max(distinctKeys.col(pruneCol)),
          sum(when(distinctKeys.col(pruneCol).isNull, 1L).otherwise(0L)))): _*)
        .collect()(0)
      val nR = rangeAggs.size
      val keysEmpty = aggRow.getLong(0) == 0L
      val keyRange = ManifestCommit.colStatsOf(pruneCol,
        distinctKeys.schema(pruneCol).dataType,
        aggRow.get(nR + 1), aggRow.get(nR + 2))
      val hasNullKey =
        !aggRow.isNullAt(nR + 3) && aggRow.getLong(nR + 3) > 0L
      val touched: Seq[String] = statless ++ (
        if (keysEmpty) Nil
        else if (few)
          ranged.zipWithIndex.collect {
            case ((d, _), i) if !aggRow.isNullAt(i + 1) && aggRow.getLong(i + 1) > 0 => d
          }
        else exactOrOverlapTouched(distinctKeys, pruneCol, ranged, keyRange)
          .toSeq.sorted)
      val disjointFromKeys: (String, Seq[ColStats]) => Boolean = (_, stats) =>
        keysEmpty || (!hasNullKey && keyRange.exists(kr =>
          stats.find(_.col == pruneCol).exists(cs =>
            !cs.overlaps(Some(kr.min), Some(kr.max)))))

      // per-dir DV builds are INDEPENDENT small jobs (semi-join + count +
      // tiny write) — submit them from concurrent threads so their
      // scheduling gaps overlap, the same latency shape (and fix) as
      // Similarity.pqTrainCodebooks' subspace trainers
      val results: Seq[(String, String, Long, Long)] = if (touched.isEmpty) Nil else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(touched.size, 8))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        try Await.result(Future.sequence(touched.map { d => Future {
          // keys actually present among the dir's LIVE rows (existing DV
          // applied first, so re-deleting an already-deleted key is a no-op)
          val liveDir = ManifestCommit.readDirsOf(spark, root, m, Seq(d))
          val matched = liveDir.join(broadcast(distinctKeys), keyCols, "left_semi")
          // matched ROWS (not distinct keys) feed the dv-dead counter:
          // under key duplication within a dir one dv key kills several
          // rows, and the counter must track rows for live = rows − dead.
          // Both counts ride ONE aggregate (semi-joined rows always carry
          // fully non-null keys — null-unsafe equality — so countDistinct
          // equals present.count); a second count job per dir was pure
          // sequential latency on every delete gate.
          val cnt = matched.agg(count(lit(1)),
            countDistinct(keyCols.head, keyCols.tail: _*)).collect()(0)
          val matchedRows = cnt.getLong(0)
          val newlyDeleted = cnt.getLong(1)
          val present = matched.select(keyCols.map(col): _*).distinct()
          if (newlyDeleted == 0L) (d, "", 0L, 0L)
          else {
            val dvDf = m.dvs.get(d) match {
              case Some(old) => spark.read.parquet(ManifestCommit.dirAbs(root, old))
                .unionByName(present).distinct()
              case None => present
            }
            val dvName = s"_dv_${java.util.UUID.randomUUID().toString.replace("-", "").take(16)}"
            dvDf.coalesce(1).write.parquet(s"$root/$dvName")
            (d, dvName, newlyDeleted, matchedRows)
          }
        } }), Duration.Inf)
        finally pool.shutdown()
      }
      val totalDeleted = results.map(_._3).sum
      val newDvs = results.collect { case (d, dv, n, _) if n > 0L => d -> dv }.toMap
      // exact dead-row counters ride the same commit so COUNT(*) stays
      // manifest-only through merge-on-read deletes: new dead = prior
      // dead + rows newly killed. A dir whose prior dv PREDATES the
      // counter (dv present, no counter) is left unstamped — a partial
      // counter would make tableRowCount WRONG instead of unavailable
      val statUpdates: Map[String, Seq[ColStats]] =
        results.collect { case (d, _, n, rows) if n > 0L &&
            (m.dvs.get(d).isEmpty ||
              m.stats.getOrElse(d, Nil).exists(_.col == ManifestCommit.DvDeadStat)) =>
          val prior = m.stats.getOrElse(d, Nil)
          val dead = prior.find(_.col == ManifestCommit.DvDeadStat)
            .map(_.min.toLong).getOrElse(0L) + rows
          d -> (prior.filterNot(_.col == ManifestCommit.DvDeadStat) :+
            ColStats(ManifestCommit.DvDeadStat, "num", dead.toString, dead.toString))
        }.toMap

      val committed =
        if (newDvs.isEmpty) m // nothing present anywhere: no commit needed
        // rebasing commit: nothing is displaced — the delete only REPOINTS
        // deletion vectors on the dirs it read (pinned: a concurrent
        // rewrite or DV repoint of one invalidates the union this delete
        // computed); concurrent appends graft when their key range proves
        // them free of the deleted keys
        else try ManifestCommit.commitReconciled(spark, root, base = m,
          displaced = Nil,
          added = Nil,
          dvUpdates = newDvs,
          schema = m.tableSchema,
          op = "delete",
          pinned = touched.toSet,
          disjoint = disjointFromKeys,
          statUpdates = statUpdates)
        catch {
          case e: ManifestCommit.ConcurrentCommitException =>
            // staged dv files of the aborted attempt are unreachable —
            // reclaim eagerly (a retry rebuilds them from the new gen)
            val f = new org.apache.hadoop.fs.Path(root)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            newDvs.values.foreach(v =>
              f.delete(new org.apache.hadoop.fs.Path(root, v), true))
            throw e
        }
      DeleteResult(committed.gen, m.dirs.size, newDvs.size, totalDeleted)
    } finally distinctKeys.unpersist()
  }

  // ---- predicate DML: DELETE/UPDATE WHERE <arbitrary condition> ----
  // The SQL DML surface (DELETE FROM / UPDATE graft.<name>) and any
  // programmatic caller that has a PREDICATE rather than a key set.
  // Copy-on-write at dir granularity, three-stage like everything else
  // in this family:
  //   1. candidates by manifest stats (StatsPredicate bounds + bloom
  //      points — O(stats-matching dirs), cold dirs never read);
  //   2. exact matched-dir test: ONE job over the plain candidates with
  //      the dir identity recovered from the file path (a candidate the
  //      predicate doesn't actually touch survives byte-identical);
  //      dv'd candidates are conservatively affected (their read goes
  //      through the DV anti-join, where per-file attribution is lost);
  //   3. affected dirs rewritten into one new dir (deletes drop matching
  //      rows; updates rewrite them in place), metered by observe on the
  //      write pass, committed via the REBASING commit with the
  //      stats-disjointness proof for concurrently-added dirs.

  final case class RowOpResult(
      gen: Long,
      dirsTotal: Int,
      dirsRewritten: Int,
      rowsAffected: Long)

  /** Delete every row satisfying `cond`. `cond` must reference table
    * columns by NAME (unresolved), e.g. `col("x") % 97 === 0`. */
  def deleteRows(spark: SparkSession, root: String, cond: Column,
      retries: Int = 0): RowOpResult =
    rowOpRetrying(retries) {
      rowOp(spark, root, cond, "delete",
        (df, c) => df.filter(!coalesce(c, lit(false))))
    }

  /** Predicate-scoped OVERWRITE (the public Delta `replaceWhere` idea):
    * atomically delete every row satisfying `cond` and insert `data` —
    * the idempotent backfill primitive (`REPLACE WHERE day = D` re-lands
    * one day without touching the rest of a 100-TB table). Scale shape:
    * only stats-overlapping dirs are even READ (cold dirs never listed),
    * a witness pass drops candidates that turn out to hold no matching
    * rows, survivors rewrite once, and the new rows land in the table's
    * own recorded layout. The staged insert is validated to CONFORM to
    * `cond` (rows outside the replaced range are refused — Delta's
    * contract, and what makes the op idempotent) and against CHECK
    * constraints; delete + insert are ONE commit, CAS-rebased only onto
    * concurrent commits provably disjoint from the predicate. */
  def replaceWhere(spark: SparkSession, root: String, data: DataFrame,
      cond: Column, retries: Int = 0): RowOpResult =
    rowOpRetrying(retries) {
      rowOp(spark, root, cond, "replace_where",
        (df, c) => df.filter(!coalesce(c, lit(false))), insert = Some(data))
    }

  /** Update `assignments` (name → expression over the row's own columns)
    * on every row satisfying `cond`; other rows and columns unchanged. */
  def updateRows(spark: SparkSession, root: String,
      assignments: Seq[(String, Column)], cond: Column,
      retries: Int = 0): RowOpResult = {
    assignments.foreach { case (n, rhs) =>
      requireDeterministic(s"update assignment $n", rhs) }
    rowOpRetrying(retries) {
      rowOp(spark, root, cond, "update", { (df, c) =>
        val hit = coalesce(c, lit(false))
        // all assignment RHS evaluate against the PRE-update row (SQL
        // UPDATE semantics: SET a = b, b = a swaps)
        val cols = df.columns.toSeq.map { name =>
          assignments.find(_._1 == name) match {
            case Some((_, rhs)) =>
              when(hit, rhs.cast(df.schema(name).dataType))
                .otherwise(df.col(name)).as(name)
            case None => df.col(name)
          }
        }
        df.select(cols: _*)
      })
    }
  }

  private def rowOpRetrying(retries: Int)(f: => RowOpResult): RowOpResult = {
    var attempt = 0
    while (attempt < retries.max(0)) {
      try return f
      catch { case _: ManifestCommit.ConcurrentCommitException => attempt += 1 }
    }
    f
  }

  private def requireDeterministic(what: String, c: Column): Unit =
    require(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c).deterministic,
      s"$what must be deterministic — the matched-dir witness job and the " +
        "rewrite job evaluate it independently, so e.g. rand() < 0.1 would " +
        "apply to a different row set than was witnessed (the Spark/Delta " +
        "row-level DML contract rejects nondeterministic conditions)")

  private def rowOp(spark: SparkSession, root: String, cond: Column,
      op: String, transform: (DataFrame, Column) => DataFrame,
      insert: Option[DataFrame] = None): RowOpResult = {
    requireDeterministic(s"$op condition", cond)
    val m = ManifestCommit.readManifest(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root is not a manifest-committed table"))
    val tSchema = org.apache.spark.sql.types.StructType(
      m.tableSchema.getOrElse(
        ManifestCommit.readDirsOf(spark, root, m, m.dirs).schema)
        .fields.map(_.copy(nullable = true)))
    val names = tSchema.fieldNames.toSet
    val ex = StatsPredicate.extract(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(cond))
      .restrict(names)
    // bucket slice components prune point predicates exactly (same
    // derivation as the SQL read path — DML rewrites prune identically)
    val bucketBounds = ManifestCommit.bucketBoundsOf(
      m.slice, ex.points,
      c => tSchema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType))
    // extraOff = ex.disjoint: strict-aware disproof (open bounds,
    // or-groups, nullness counters); closed tuples carry bucket bounds
    var cand = ManifestCommit.prunedDirsOf(m,
      ex.bounds ++ bucketBounds, ex.orGroups, ex.disjoint)
    // bloom probes coerce to the COLUMN's type or skip (coerceExact):
    // the programmatic path carries UNRESOLVED literals, and a
    // wrong-typed probe reads false from every bloom — pruning dirs
    // whose rows DO match under SQL's own coercion (the
    // skipping-as-filter failure mode)
    def probeType(c: String) =
      tSchema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
    ex.points.foreach { case (c, v) =>
      if (cand.nonEmpty && cand.size <= 1024)
        probeType(c).flatMap(dt => ManifestCommit.coerceExact(v, dt))
          .foreach { cv =>
            cand = cand.filter(
              ManifestCommit.bloomDirsOf(spark, root, m, c, cv).toSet)
          }
    }
    // disjunctive per-value probe for IN / OR-of-equality predicates
    // (DELETE WHERE id IN (…) — the common point-DML shape); one bloom
    // open per dir for the whole list, entry skipped whole if any value
    // resists exact coercion
    ex.anyPoints.foreach { case (c, vs) =>
      if (cand.nonEmpty && cand.size <= 1024)
        probeType(c).foreach { dt =>
          val cvs = vs.map(v => ManifestCommit.coerceExact(v, dt))
          if (cvs.forall(_.isDefined))
            cand = cand.filter(ManifestCommit.bloomDirsOfAny(
              spark, root, m, c, cvs.flatten).toSet)
        }
    }
    if (cand.isEmpty && insert.isEmpty)
      return RowOpResult(m.gen, m.dirs.size, 0, 0L)

    // WHOLE-DIR FAST PATH for delete-shaped ops (round 18, the Delta
    // partition-delete idea): a candidate dir is dropped WITHOUT being
    // read — not even by the witness — when stats prove every row in it
    // satisfies the predicate:
    //  (a) extract(NOT cond) is DISJOINT from the dir's stats: no row
    //      can satisfy the predicate's negation, and
    //  (b) every column the predicate REFERENCES is proven null-free
    //      there (`__nn_c == __rows`) — min/max bounds speak only for
    //      non-null values, and a row where the predicate evaluates
    //      NULL satisfies neither side and must be KEPT, so without the
    //      no-nulls witness the drop would destroy it.
    // A DV'd dir stays eligible: its file-level counters include dead
    // rows, and "every file row matches" implies every LIVE row does.
    // `DELETE FROM t WHERE month = X` on a month-sliced table is then
    // ZERO Spark jobs — a pure metadata commit. UPDATE gains nothing
    // (it must rewrite the rows anyway) and stays on the witness path.
    val fastEligible = op == "delete" || op == "replace_where"
    val refCols: Set[String] =
      if (!fastEligible) Set.empty
      else org.apache.spark.sql.graftbridge.ColumnBridge.expression(cond)
        .collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts.length == 1 => a.name
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
            a.name
        }.flatMap(n => tSchema.fieldNames.find(_.equalsIgnoreCase(n))).toSet
    lazy val exNot = StatsPredicate.extract(
      org.apache.spark.sql.catalyst.expressions.Not(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(cond)))
      .restrict(names)
    def statN(d: String, c: String): Option[Long] =
      m.stats.getOrElse(d, Nil).find(_.col == c)
        .flatMap(s => scala.util.Try(s.min.toLong).toOption)
    def fullCover(d: String): Boolean = {
      val st = m.stats.getOrElse(d, Nil)
      val rows = statN(d, ManifestCommit.RowCountStat)
      refCols.nonEmpty && rows.isDefined && exNot.disjoint(st) &&
        refCols.forall(c =>
          statN(d, ManifestCommit.nnStat(c)).contains(rows.get))
    }
    val (covered, candRest) =
      if (fastEligible) cand.partition(fullCover) else (Nil, cand)
    val coveredMatched: Long = covered.map(d =>
      statN(d, ManifestCommit.RowCountStat).getOrElse(0L) -
        (if (m.dvs.contains(d))
           statN(d, ManifestCommit.DvDeadStat).getOrElse(0L)
         else 0L)).sum

    // exact matched-dir witness on the plain candidates, one job per
    // layout group (hive-nested converted dirs scan apart from flat
    // ones — mixing the two in one read raises "conflicting directory
    // structures")
    val (dvCand, plainCand) = candRest.partition(m.dvs.contains)
    // the witness identifies dirs by the data-dir BASENAME from the file
    // path ([[ManifestCommit.dirIdCol]], nesting-proof) — map back to
    // the manifest's entry string (a clone's external entries are
    // absolute; UUID basenames are unique across roots)
    val byBase = plainCand.map(d =>
      new org.apache.hadoop.fs.Path(ManifestCommit.dirAbs(root, d)).getName -> d).toMap
    // under a column mapping the files carry PHYSICAL names: the witness
    // reads them and aliases back to logical, so `cond` (logical names)
    // resolves — a logical-schema read would null-fill a renamed column
    // and the DML would silently match nothing
    val eff: Map[String, String] = tSchema.fieldNames.toSeq
      .flatMap(n => m.colmap.get(n).filter(_ != n).map(n -> _)).toMap
    val physT =
      if (eff.isEmpty) tSchema
      else org.apache.spark.sql.types.StructType(tSchema.fields.map(f =>
        f.copy(name = eff.getOrElse(f.name, f.name))))
    def logicalize(df: DataFrame): DataFrame =
      if (eff.isEmpty) df
      else df.select((tSchema.fields.toIndexedSeq.map(f =>
        col(eff.getOrElse(f.name, f.name)).as(f.name)) :+ col("__dir")): _*)
    val matchedPlain: Seq[String] = plainCand
      .groupBy(d => ManifestCommit.partSuffixOf(m, d)
        .map(_.split('/').map(_.takeWhile(_ != '=')).mkString(",")))
      .toSeq.flatMap {
        case (None, g) =>
          logicalize(spark.read.schema(physT)
            .parquet(g.map(ManifestCommit.dirAbs(root, _)): _*)
            .withColumn("__dir", ManifestCommit.dirIdCol))
            .filter(cond)
            .select("__dir").distinct().collect().map(_.getString(0)).toSeq
        case (Some(_), g) =>
          logicalize(ManifestCommit.readNestedPaths(spark,
            g.map(d => ManifestCommit.dirAbs(root, d) ->
              ManifestCommit.partSuffixOf(m, d).get),
            Some(physT), keepDirId = true))
            .filter(cond)
            .select("__dir").distinct().collect().map(_.getString(0)).toSeq
      }.flatMap(byBase.get)
    val witnessed = (matchedPlain ++ dvCand).sorted
    val affected = (witnessed ++ covered).sorted
    if (affected.isEmpty && insert.isEmpty)
      return RowOpResult(m.gen, m.dirs.size, 0, 0L)

    val sliceComps =
      m.slice.map(ManifestCommit.sliceComponents(_).toSet).getOrElse(Set.empty)
    val statCols = m.stats.values.flatten.map(s => ManifestCommit.baseStatCol(s.col)).toSeq.distinct
      .filter(c => c == ManifestCommit.RowCountStat ||
        (!ManifestCommit.PseudoStats(c) && (names(c) || sliceComps(c))))
    // the survivor rewrite reads ONLY the witnessed dirs — fully-covered
    // dirs are displaced whole, their row counts folded in from stats
    val (delAdded, matched): (Seq[String], Long) =
      if (witnessed.isEmpty) (Nil, coveredMatched)
    else {
      val src = ManifestCommit.readDirsOf(spark, root, m, witnessed, Some(tSchema))
      val obs = Observation()
      val out = transform(src.observe(obs,
        sum(when(coalesce(cond, lit(false)), 1L).otherwise(0L)).as("matched"),
        count(lit(1)).as("total")), cond)
      val newDir = ManifestCommit.newDataDir(root)
      // logical->physical rename under a column mapping (no-op otherwise)
      ManifestCommit.toPhysicalNames(spark, root, out).write.parquet(newDir)
      val row = obs.get
      val hit = Option(row("matched")).map(_.asInstanceOf[Long]).getOrElse(0L)
      val total = row("total").asInstanceOf[Long]
      val written = if (op == "delete" || op == "replace_where") total - hit else total
      val added =
        if (written == 0L) { // everything in the affected set deleted
          new org.apache.hadoop.fs.Path(newDir).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(newDir), true)
          Nil
        } else Seq(newDir)
      // UPDATE can move a row OUT of a CHECK constraint: the staged
      // rewrite is validated byte-for-byte before commit (DELETE only
      // removes rows and needs no proof)
      if (op == "update")
        ManifestCommit.validateWrittenChecks(spark, root, m.checks, added, "UPDATE")
      (added, hit + coveredMatched)
    }
    // REPLACE WHERE's insert side: the new rows land in the table's own
    // layout (sliced when one is recorded), are proven to CONFORM to the
    // predicate on the staged bytes (the Delta replaceWhere contract —
    // post-write, so a nondeterministic source can't smuggle a row the
    // validation never saw), and ride the SAME atomic commit as the
    // delete — no reader ever sees the range half-replaced.
    val insDirs: Seq[(String, Seq[ManifestCommit.ColStats])] = insert match {
      case None => Nil
      case Some(data) =>
        val aligned = data.select(tSchema.fields.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        val written = m.slice match {
          case Some(sl) => ManifestCommit.writeSliced(spark, root, aligned,
            org.apache.spark.sql.functions.expr(sl), statCols)
          case None =>
            val d = ManifestCommit.newDataDir(root)
            ManifestCommit.toPhysicalNames(spark, root, aligned).write.parquet(d)
            Seq(d -> (if (statCols.isEmpty) Nil
                      else ManifestCommit.dirStats(spark, d, statCols,
                        colmap = m.colmap)))
        }
        val staged = written.map(_._1)
        if (staged.nonEmpty) {
          def reclaim(dirs: Seq[String]): Unit = {
            val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            dirs.foreach(d => f.delete(new org.apache.hadoop.fs.Path(
              ManifestCommit.dirAbs(root, d)), true))
          }
          // a REFUSED insert must leave NO staged bytes behind — the
          // delete-side survivor rewrite (delAdded) is equally
          // uncommitted and equally orphaned without cleanup
          try {
            // read the staged bytes back under LOGICAL names so `cond`
            // resolves (files carry physical names under a column mapping)
            val df0 = spark.read.parquet(staged.map(
              ManifestCommit.dirAbs(root, _)): _*)
            val dfL = m.colmap.foldLeft(df0) { case (d, (log, phys)) =>
              if (log != phys) d.withColumnRenamed(phys, log) else d }
            val bad = dfL.filter(!coalesce(cond, lit(false))).limit(1).count()
            if (bad > 0) {
              reclaim(staged)
              throw new IllegalArgumentException(
                s"REPLACE WHERE to $root: written data does not conform to " +
                  "the replace predicate — nothing was committed")
            }
            // validateWrittenChecks reclaims `staged` itself on violation
            ManifestCommit.validateWrittenChecks(spark, root, m.checks,
              staged, "REPLACE WHERE")
          } catch {
            case e: Throwable =>
              reclaim(delAdded)
              throw e
          }
        }
        written
    }
    val added = delAdded ++ insDirs.map(_._1)
    val stats = delAdded.map(d =>
      d -> (if (statCols.isEmpty) Nil
            else ManifestCommit.dirStats(spark, d, statCols,
              colmap = m.colmap))).toMap ++ insDirs.toMap
    val committed = ManifestCommit.commitReconciled(spark, root, m,
      displaced = affected, added = added, addedStats = stats,
      schema = m.tableSchema, op = op, pinned = affected.toSet,
      disjoint = (_, st) => ex.disjoint(st),
      // inserting rows must CAS against concurrent constraint changes,
      // exactly like SQL INSERT (a concurrent ADD CONSTRAINT validated
      // only the rows visible to it)
      expectedChecks =
        if (op == "update" || insert.isDefined) Some(m.checks) else None)
    RowOpResult(committed.gen, m.dirs.size, affected.size, matched)
  }
}
