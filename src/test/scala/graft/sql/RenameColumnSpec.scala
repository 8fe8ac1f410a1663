package graft.sql

import graft.SparkSpec
import graft.ingest.{ChangeFeed, ManifestCommit, MergeInto, Optimize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** `ALTER TABLE graft.t RENAME COLUMN a TO b` — the column-mapping
  * contract: an O(metadata) commit (cold dirs keep their bytes under the
  * physical name), reads project under the new name with pruning and
  * pushdown intact, writers land physical names, time travel serves each
  * generation's own names, and the guards refuse every rename that would
  * corrupt a standing contract. */
class RenameColumnSpec extends SparkSpec {

  private var n = 0
  private def uniq(p: String): String = { n += 1; s"${p}_ren_$n" }

  /** Month-sliced table: ids 0..99, month = Jan for id<50 else Feb, so
    * `v` (= id) ranges are DISJOINT per dir — pruning on v is testable.
    * Stats on ts, v, id + row counter. */
  private def mkTable(): (String, String) = {
    val root = Files.createTempDirectory("graft_rename_").toString + "/t"
    val df = spark.range(0, 100).toDF("id")
      .withColumn("ts", when(col("id") < 50,
        lit("2024-01-10 00:00:00")).otherwise(lit("2024-02-10 00:00:00"))
        .cast("timestamp"))
      .withColumn("v", col("id"))
    val slice = expr("date_format(ts, 'yyyyMM')")
    val dirs = ManifestCommit.writeSliced(spark, root, df, slice,
      Seq("ts", "v", "id", ManifestCommit.RowCountStat))
    ManifestCommit.commitReplace(spark, root, dirs.map(_._1),
      pruneDisplaced = false, stats = dirs.toMap,
      schema = Some(org.apache.spark.sql.types.StructType(
        df.schema.fields.map(_.copy(nullable = true)))),
      op = "create", slice = Some("date_format(ts, 'yyyyMM')"))
    val name = uniq("rentab")
    GraftSql.register(name, root)
    (root, name)
  }

  private def scannedDirs(df: DataFrame, root: String): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).filter(_.contains(root))
              .flatMap(_.split("/").filter(s =>
                s.startsWith("data_") && !s.contains("=")).lastOption)
          case _ => Nil
        }
    }.flatten.distinct.size

  test("rename is O(metadata): new name reads, old name fails, dirs untouched") {
    val (root, name) = mkTable()
    val dirsBefore = ManifestCommit.readManifest(spark, root).get.dirs
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    val m = ManifestCommit.readManifest(spark, root).get
    assert(m.dirs === dirsBefore, "rename must not touch data dirs")
    assert(m.op === Some("rename_column"))
    assert(m.colmap === Map("amount" -> "v"))
    // new name serves the old values
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$name`")
      .head.getLong(0) === (0L until 100L).sum)
    // old name fails crisply at analysis
    val e = intercept[Exception](
      spark.sql(s"SELECT sum(v) FROM graft.`$name`").collect())
    assert(e.getMessage.contains("v") || e.getMessage.contains("UNRESOLVED"),
      e.getMessage)
    // DESCRIBE / SHOW CREATE carry the new name only
    val create = spark.sql(s"SHOW CREATE TABLE graft.`$name`")
      .head.getString(0)
    assert(create.contains("`amount`") && !create.contains("`v`"), create)
  }

  test("pruning and pushdown on the renamed column survive (pinned from the plan)") {
    val (root, name) = mkTable()
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    // per-dir stats re-keyed: [0,49] vs [50,99] on `amount`
    val m = ManifestCommit.readManifest(spark, root).get
    m.dirs.foreach { d =>
      assert(m.stats(d).exists(_.col == "amount"), m.stats(d).toString)
      assert(!m.stats(d).exists(_.col == "v"), m.stats(d).toString)
    }
    val probe = spark.sql(
      s"SELECT sum(amount) FROM graft.`$name` WHERE amount <= 10")
    assert(scannedDirs(probe, root) === 1, "stats pruning on renamed column")
    assert(probe.head.getLong(0) === (0L to 10L).sum)
    // parquet-level pushdown: the physical name rides the pushed filter
    // (read from the scan node's metadata — the plan's toString
    // truncates long filter lists)
    def scanFilters(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scanFilters(a.executedPlan)
        case fs: org.apache.spark.sql.execution.FileSourceScanExec =>
          Seq(fs.metadata.getOrElse("PushedFilters", ""))
        case other => other.children.flatMap(scanFilters)
      }
    val pushed = scanFilters(probe.queryExecution.executedPlan).mkString(" ")
    assert(pushed.contains("LessThanOrEqual(v,10)"),
      s"filter not pushed to the scan under the physical name: $pushed")
  }

  test("writers after a rename land PHYSICAL names; mixed old/new dirs read as one") {
    val (root, name) = mkTable()
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    val genBefore = ManifestCommit.readManifest(spark, root).get.gen
    val src = uniq("rensrc")
    spark.range(100, 120).toDF("id")
      .withColumn("ts", lit("2024-03-05 00:00:00").cast("timestamp"))
      .withColumn("amount", col("id") * 10)
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO graft.`$name` SELECT id, ts, amount FROM $src")
    val m = ManifestCommit.readManifest(spark, root).get
    assert(m.gen === genBefore + 1)
    val newDirs = m.dirs.filterNot(
      ManifestCommit.readManifestAt(spark, root, genBefore).get.dirs.toSet)
    assert(newDirs.size === 1)
    // the new dir's FILES carry the physical name `v`, not `amount`
    val physCols = spark.read.parquet(
      ManifestCommit.dirAbs(root, newDirs.head)).columns.toSet
    assert(physCols.contains("v") && !physCols.contains("amount"), physCols.toString)
    // one logical read over pre- and post-rename dirs
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$name`")
      .head.getLong(0) === (0L until 100L).sum + (100L until 120L).map(_ * 10).sum)
    // the new dir's stats keyed LOGICAL (amount), slice-tight
    assert(m.stats(newDirs.head).exists(_.col == "amount"),
      m.stats(newDirs.head).toString)
  }

  test("MERGE, DV delete, OPTIMIZE and change feed keep working after a rename") {
    val (root, name) = mkTable()
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    // MERGE by new name (full-row update)
    val src = uniq("renmsrc")
    spark.range(0, 5).toDF("id")
      .withColumn("ts", lit("2024-01-10 00:00:00").cast("timestamp"))
      .withColumn("amount", lit(1000L))
      .createOrReplaceTempView(src)
    spark.sql(
      s"""MERGE INTO graft.`$name` t USING $src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$name` WHERE id < 5")
      .head.getLong(0) === 5000L)
    // DV delete (merge-on-read) over the renamed table
    spark.sql(s"DELETE FROM graft.`$name` WHERE amount = 1000")
    assert(spark.sql(s"SELECT count(*) FROM graft.`$name`")
      .head.getLong(0) === 95L)
    // change feed in the CURRENT (logical) vocabulary
    val g = ManifestCommit.readManifest(spark, root).get.gen
    val feed = ChangeFeed.diff(spark, root, g - 1, g, Seq("id"))
    assert(feed.filter(col(ChangeFeed.ChangeType) === "delete").count() === 5L)
    assert(feed.columns.contains("amount") && !feed.columns.contains("v"))
    // OPTIMIZE folds the DV away; content and logical schema survive
    Optimize.compactSmall(spark, root, smallBytes = 1L << 30)
    val after = ManifestCommit.readManifest(spark, root).get
    assert(after.dvs.isEmpty)
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$name`")
      .head.getLong(0) === (5L until 100L).sum)
  }

  test("time travel serves each generation's own names; RESTORE restores the mapping") {
    val (root, name) = mkTable()
    val preGen = ManifestCommit.readManifest(spark, root).get.gen
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    // pre-rename generation: the OLD name, not the new one
    assert(spark.sql(
      s"SELECT sum(v) FROM graft.`$name` VERSION AS OF $preGen")
      .head.getLong(0) === (0L until 100L).sum)
    intercept[Exception](spark.sql(
      s"SELECT sum(amount) FROM graft.`$name` VERSION AS OF $preGen").collect())
    // RESTORE to pre-rename: the live table serves the old name again
    spark.sql(s"RESTORE TABLE graft.`$name` TO VERSION AS OF $preGen")
    assert(ManifestCommit.readManifest(spark, root).get.colmap.isEmpty)
    assert(spark.sql(s"SELECT sum(v) FROM graft.`$name`")
      .head.getLong(0) === (0L until 100L).sum)
  }

  test("guards: slice-referenced, constrained, DV-keyed, physical/tombstone collisions") {
    val (root, name) = mkTable()
    // slicing references ts
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` RENAME COLUMN ts TO event_ts"))
    assert(e1.getMessage.contains("slicing"), e1.getMessage)
    // CHECK constraint references id
    spark.sql(s"ALTER TABLE graft.`$name` ADD CONSTRAINT pos CHECK (id >= 0)")
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` RENAME COLUMN id TO key_id"))
    assert(e2.getMessage.contains("CHECK"), e2.getMessage)
    spark.sql(s"ALTER TABLE graft.`$name` DROP CONSTRAINT pos")
    // a live DV keys on id (deleteWhere = merge-on-read delete)
    MergeInto.deleteWhere(spark, root, spark.range(7, 8).toDF("id"))
    assert(ManifestCommit.readManifest(spark, root).get.dvs.nonEmpty)
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` RENAME COLUMN id TO key_id"))
    assert(e3.getMessage.contains("deletion vector"), e3.getMessage)
    Optimize.compactSmall(spark, root, smallBytes = 1L << 30) // DVs away
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN id TO key_id")
    // renaming BACK onto the physical name of another mapped column:
    // v is amount's on-disk name after the rename below
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    val e4 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` RENAME COLUMN key_id TO v"))
    assert(e4.getMessage.contains("physical"), e4.getMessage)
    // rename back amount -> v IS legal (it clears the mapping entry)
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN amount TO v")
    assert(ManifestCommit.readManifest(spark, root).get
      .colmap.get("v").isEmpty)
    assert(spark.sql(s"SELECT sum(v) FROM graft.`$name`")
      .head.getLong(0) === (0L until 100L).filterNot(_ == 7).sum)
  }

  test("drop-then-readd of a (renamed) column is refused by the tombstone") {
    val (root, name) = mkTable()
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    spark.sql(s"ALTER TABLE graft.`$name` DROP COLUMN amount")
    val m = ManifestCommit.readManifest(spark, root).get
    assert(m.deadCols === Seq("v"), m.deadCols.toString)
    assert(m.colmap.isEmpty)
    // re-adding the PHYSICAL name would serve the dropped bytes — refused
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` ADD COLUMNS (v BIGINT)"))
    assert(e.getMessage.contains("DROPPED"), e.getMessage)
    // renaming another column onto it likewise
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` RENAME COLUMN id TO v"))
    assert(e2.getMessage.contains("physical") ||
      e2.getMessage.contains("dropped"), e2.getMessage)
    // a FRESH name is fine
    spark.sql(s"ALTER TABLE graft.`$name` ADD COLUMNS (amount2 BIGINT)")
    assert(spark.sql(s"SELECT count(amount2) FROM graft.`$name`")
      .head.getLong(0) === 0L)
  }

  test("a stream started after the rename delivers appends under the new name") {
    val (root, name) = mkTable()
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    val qname = uniq("renstream")
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(qname).count() === 100L)
      // append THROUGH SQL (physical-name discipline), stream tails it
      val src = uniq("renstrsrc")
      spark.range(100, 110).toDF("id")
        .withColumn("ts", lit("2024-03-01 00:00:00").cast("timestamp"))
        .withColumn("amount", col("id"))
        .createOrReplaceTempView(src)
      spark.sql(s"INSERT INTO graft.`$name` SELECT id, ts, amount FROM $src")
      q.processAllAvailable()
      val got = spark.table(qname)
      assert(got.count() === 110L)
      assert(got.agg(sum("amount")).head.getLong(0) === (0L until 110L).sum)
    } finally q.stop()
  }

  test("mini-fuzz (seed 1616): renames interleaved with INSERT / MERGE / " +
      "DV delete / compaction — live == model every step, each retained " +
      "generation serves its own column name") {
    val (root, name) = mkTable()
    import spark.implicits._
    val rnd = new scala.util.Random(1616)
    // model: id -> value of the (renamed) v/amount column
    var model: Map[Long, Long] = (0L until 100L).map(i => i -> i).toMap
    var nextId = 1000L
    var colName = "v" // the value column's CURRENT logical name
    var nameAt = Map(ManifestCommit.readManifest(spark, root).get.gen -> colName)
    def live(): Map[Long, Long] =
      spark.sql(s"SELECT id, `$colName` FROM graft.`$name`").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 18).foreach { step =>
      rnd.nextInt(5) match {
        case 0 => // INSERT a fresh batch (sliced write under the mapping)
          val ids = (0 until 1 + rnd.nextInt(5)).map { _ => nextId += 1; nextId }
          val src = uniq("fzsrc")
          ids.toDF("id")
            .withColumn("ts", lit("2024-04-01 00:00:00").cast("timestamp"))
            .withColumn(colName, col("id") * 7)
            .createOrReplaceTempView(src)
          spark.sql(s"INSERT INTO graft.`$name` SELECT id, ts, `$colName` FROM $src")
          model ++= ids.map(i => i -> i * 7)
        case 1 if model.nonEmpty => // MERGE update of a sample
          val pick = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(4))
          val src = uniq("fzmsrc")
          pick.toDF("id")
            .withColumn("ts", lit("2024-01-10 00:00:00").cast("timestamp"))
            .withColumn(colName, col("id") + lit(step.toLong * 100000))
            .createOrReplaceTempView(src)
          spark.sql(s"""MERGE INTO graft.`$name` t USING $src s ON t.id = s.id
                       |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
          model ++= pick.map(i => i -> (i + step.toLong * 100000))
        case 2 if model.nonEmpty => // merge-on-read DV delete
          val pick = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(3))
          MergeInto.deleteWhere(spark, root, pick.toDF("id"))
          model --= pick
        case 3 => // minor compaction (folds DVs away, keeps the mapping)
          Optimize.compactSmall(spark, root, smallBytes = 1L << 30)
        case _ => // RENAME flip v <-> amount (guarded by DV presence:
          // compact first so the rename is always legal)
          Optimize.compactSmall(spark, root, smallBytes = 1L << 30)
          val to = if (colName == "v") "amount" else "v"
          spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN `$colName` TO `$to`")
          colName = to
      }
      nameAt += ManifestCommit.readManifest(spark, root).get.gen -> colName
      assert(live() === model, s"live != model after step $step")
      assert(ManifestCommit.tableRowCount(spark, root) === Some(model.size.toLong),
        s"manifest COUNT broke after step $step")
    }
    // every retained generation serves ITS OWN column name
    ManifestCommit.snapshotGens(spark, root).foreach { g =>
      nameAt.get(g).foreach { expected =>
        val fields = ManifestCommit.readAt(spark, root, g).schema.fieldNames
        assert(fields.contains(expected) &&
          !fields.contains(if (expected == "v") "amount" else "v"),
          s"gen $g serves ${fields.mkString(",")}, expected $expected")
      }
    }
  }

  test("change feed ACROSS a rename boundary: pre-images carry the real " +
      "pre-rename values under the new name (never null-filled)") {
    val (root, name) = mkTable()
    val gPre = ManifestCommit.readManifest(spark, root).get.gen
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    // a rewrite AFTER the rename: ids 0..4 updated via MERGE
    val src = uniq("renxsrc")
    spark.range(0, 5).toDF("id")
      .withColumn("ts", lit("2024-01-10 00:00:00").cast("timestamp"))
      .withColumn("amount", lit(7777L))
      .createOrReplaceTempView(src)
    spark.sql(s"""MERGE INTO graft.`$name` t USING $src s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val gPost = ManifestCommit.readManifest(spark, root).get.gen
    // the diff window SPANS the rename: the FROM side's dirs are
    // pre-rename files (physical name v) read in toGen's schema —
    // their pre-image `amount` must be the real old values, not null
    val feed = ChangeFeed.diff(spark, root, gPre, gPost, Seq("id"))
    val pre = feed.filter(col(ChangeFeed.ChangeType) === "update_preimage")
      .select("id", "amount").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(pre.keySet === (0L until 5L).toSet, pre.toString)
    (0L until 5L).foreach(i => assert(pre(i) === i,
      s"pre-image of id=$i lost the pre-rename value: ${pre(i)}"))
    val post = feed.filter(col(ChangeFeed.ChangeType) === "update_postimage")
      .select("id", "amount").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(i => assert(post(i) === 7777L))
  }

  test("a write staged BEFORE a rename commits safely after it: the dir's " +
      "pre-rename names ARE the physical names, reads serve the new name") {
    val (root, name) = mkTable()
    // writer stages under the CURRENT (pre-rename) schema...
    val d = ManifestCommit.newDataDir(root)
    spark.range(500, 510).toDF("id")
      .withColumn("ts", lit("2024-06-01 00:00:00").cast("timestamp"))
      .withColumn("v", col("id"))
      .write.parquet(d)
    // ...a rename lands in between...
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    // ...and the append commits (no expectedGen: appends graft). The
    // staged files carry `v` — exactly the PHYSICAL name the mapping
    // records — so the footer guard passes and reads are correct; only
    // this dir's stats (metered pre-rename, if any) would carry the
    // stale key, which degrades pruning for it, never correctness.
    ManifestCommit.commitAppend(spark, root, d)
    assert(spark.sql(
      s"SELECT sum(amount) FROM graft.`$name` WHERE id >= 500")
      .head.getLong(0) === (500L until 510L).sum)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$name`")
      .head.getLong(0) === 110L)
  }

  test("an untranslated writer is caught loudly at commit (footer guard)") {
    val (root, name) = mkTable()
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    // simulate a buggy writer: logical names straight to parquet
    val d = ManifestCommit.newDataDir(root)
    spark.range(500, 505).toDF("id")
      .withColumn("ts", lit("2024-04-01 00:00:00").cast("timestamp"))
      .withColumn("amount", col("id"))
      .write.parquet(d)
    val e = intercept[Exception](
      ManifestCommit.commitAppend(spark, root, d))
    assert(e.getMessage.contains("toPhysicalNames"), e.getMessage)
  }
}
