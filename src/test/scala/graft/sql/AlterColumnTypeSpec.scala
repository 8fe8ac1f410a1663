package graft.sql

import graft.SparkSpec
import graft.ingest.{ChangeFeed, ManifestCommit, MergeInto}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** `ALTER TABLE graft.t ALTER COLUMN c TYPE <wider>` — type widening as
  * an O(metadata) commit: cold files keep their narrower physical type
  * and the parquet reader upcasts at scan time. The whitelist is ours,
  * pair-by-pair PROVEN here against this Spark build (the reader also
  * tolerates some NARROWING silently, which must stay refused). */
class AlterColumnTypeSpec extends SparkSpec {

  private var n = 0
  private def uniq(p: String): String = { n += 1; s"${p}_act_$n" }

  private def mkTable(col: org.apache.spark.sql.Column,
      dt: String): (String, String) = {
    val root = Files.createTempDirectory("graft_act_").toString + "/t"
    val df = spark.range(0, 50).toDF("id").withColumn("c", col.cast(dt))
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d), pruneDisplaced = false,
      stats = Map(d -> ManifestCommit.dirStats(spark, d,
        Seq("id", "c", ManifestCommit.RowCountStat))),
      schema = Some(StructType(df.schema.fields.map(_.copy(nullable = true)))))
    val name = uniq("acttab")
    GraftSql.register(name, root)
    (root, name)
  }

  test("every whitelist pair reads the old files correctly after the widen") {
    val pairs: Seq[(String, DataType, Long => Any)] = Seq(
      ("byte", ShortType, i => i.toShort),
      ("byte", IntegerType, i => i.toInt),
      ("byte", LongType, i => i),
      ("byte", DoubleType, i => i.toDouble),
      ("short", IntegerType, i => i.toInt),
      ("short", LongType, i => i),
      ("int", LongType, i => i),
      ("int", DoubleType, i => i.toDouble),
      ("float", DoubleType, i => i.toDouble),
      ("int", DecimalType(20, 0), i => new java.math.BigDecimal(i)),
      ("decimal(5,2)", DecimalType(12, 4),
        i => new java.math.BigDecimal(i).setScale(4)))
    pairs.foreach { case (from, to, expect) =>
      val (root, name) = mkTable(col("id"), from)
      spark.sql(s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE ${to.sql}")
      val m = ManifestCommit.readManifest(spark, root).get
      assert(m.tableSchema.get("c").dataType === to, s"$from -> $to")
      assert(m.op === Some("alter_column_type"))
      val got = spark.sql(s"SELECT c FROM graft.`$name` WHERE id = 7")
        .head.get(0)
      assert(got === expect(7L), s"$from -> $to read back $got")
      // the full column survives (no silent null-fill)
      assert(spark.sql(s"SELECT count(c) FROM graft.`$name`")
        .head.getLong(0) === 50L)
      GraftSql.unregister(name)
    }
  }

  test("date -> timestamp_ntz: values upcast AND the per-dir stats " +
      "re-render so boundary-day probes cannot wrongly prune") {
    val root = Files.createTempDirectory("graft_act_").toString + "/t"
    val df = spark.range(0, 40).toDF("id")
      .withColumn("c", date_add(lit("2024-01-01").cast("date"),
        col("id").cast("int")))
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d), pruneDisplaced = false,
      stats = Map(d -> ManifestCommit.dirStats(spark, d,
        Seq("c", ManifestCommit.RowCountStat))),
      schema = Some(StructType(df.schema.fields.map(_.copy(nullable = true)))))
    val name = uniq("actdt")
    GraftSql.register(name, root)
    spark.sql(s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE TIMESTAMP_NTZ")
    val m = ManifestCommit.readManifest(spark, root).get
    val cs = m.stats(m.dirs.head).find(_.col == "c").get
    assert(cs.min === "2024-01-01T00:00:00.000" &&
      cs.max === "2024-02-09T00:00:00.000", cs.toString)
    // the boundary-day probe that a date-rendered bound would wrongly
    // prune: lo = max-day midnight — lexicographically ABOVE "2024-02-09"
    // but equal to the re-rendered bound
    val kept = ManifestCommit.prunedDirsOf(m, Seq(("c",
      Some("2024-02-09T00:00:00.000"), None)))
    assert(kept === m.dirs, "boundary-day probe wrongly pruned the dir")
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$name` " +
        "WHERE c >= timestamp_ntz'2024-02-09 00:00:00'").head.getLong(0) === 1L)
  }

  test("float -> double: per-dir stats bounds re-render to the double " +
      "expansion so a probe for a value the table actually serves " +
      "cannot wrongly prune") {
    val root = Files.createTempDirectory("graft_act_").toString + "/t"
    val df = mkDf(StructType(Seq(
      StructField("id", LongType, false),
      StructField("c", FloatType, true))),
      org.apache.spark.sql.Row(1L, 0.1f),
      org.apache.spark.sql.Row(2L, 0.3f))
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d), pruneDisplaced = false,
      stats = Map(d -> ManifestCommit.dirStats(spark, d,
        Seq("c", ManifestCommit.RowCountStat))),
      schema = Some(StructType(df.schema.fields.map(_.copy(nullable = true)))))
    val name = uniq("actfd")
    GraftSql.register(name, root)
    // the float's shortest decimal rendering is the recorded bound
    val m0 = ManifestCommit.readManifest(spark, root).get
    assert(m0.stats(m0.dirs.head).find(_.col == "c").get.max === "0.3")
    spark.sql(s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE DOUBLE")
    val m = ManifestCommit.readManifest(spark, root).get
    val cs = m.stats(m.dirs.head).find(_.col == "c").get
    // 0.3f upcast to double is EXACTLY 0.30000001192092896 — the value
    // the reader now serves as this dir's max; the bound must cover it
    assert(cs.max === 0.3f.toDouble.toString, cs.toString)
    assert(cs.min === 0.1f.toDouble.toString, cs.toString)
    val served = 0.3f.toDouble // 0.30000001192092896 > BigDecimal("0.3")
    val kept = ManifestCommit.prunedDirsOf(m,
      Seq(("c", Some(served.toString), None)))
    assert(kept === m.dirs,
      "probe for the served max value wrongly pruned the dir")
    // end to end: the row is actually found after the widen
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$name` WHERE c >= $served")
      .head.getLong(0) === 1L)
    GraftSql.unregister(name)
  }

  test("writers after the widen land the WIDE type; mixed files read as one") {
    val (root, name) = mkTable(col("id"), "int")
    spark.sql(s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE BIGINT")
    val src = uniq("actsrc")
    spark.range(100, 110).toDF("id")
      .withColumn("c", col("id") * 3000000000L) // beyond int range
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO graft.`$name` SELECT id, c FROM $src")
    assert(spark.sql(s"SELECT max(c) FROM graft.`$name`")
      .head.getLong(0) === 109L * 3000000000L)
    assert(spark.sql(s"SELECT count(*) FROM graft.`$name` WHERE c < 50")
      .head.getLong(0) === 50L)
    // time travel serves the generation's own (narrow) type
    assert(ManifestCommit.readAt(spark, root, 1L).schema("c").dataType
      === IntegerType)
  }

  test("guards: narrowing and re-typing refused; slice-referenced and " +
      "DV-keyed columns refused; composes with RENAME COLUMN") {
    val (root, name) = mkTable(col("id"), "bigint")
    val e1 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE INT"))
    assert(e1.getMessage.contains("widening"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE STRING"))
    assert(e2.getMessage.contains("widening"), e2.getMessage)
    // DV keyed on id refuses widening id
    MergeInto.deleteWhere(spark, root, spark.range(3, 4).toDF("id"))
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name` ALTER COLUMN id TYPE DECIMAL(20,0)"))
    assert(e3.getMessage.contains("deletion vector"), e3.getMessage)
    // slice-referenced refused
    val root2 = Files.createTempDirectory("graft_act_").toString + "/t"
    val df2 = spark.range(0, 20).toDF("id").withColumn("b", col("id").cast("int"))
    val dirs = ManifestCommit.writeSliced(spark, root2, df2,
      expr("pmod(hash(b), 4)"),
      Seq("b", "pmod(hash(b), 4)", ManifestCommit.RowCountStat))
    ManifestCommit.commitReplace(spark, root2, dirs.map(_._1),
      pruneDisplaced = false, stats = dirs.toMap,
      schema = Some(StructType(df2.schema.fields.map(_.copy(nullable = true)))),
      slice = Some("pmod(hash(b), 4)"))
    val name2 = uniq("actslice")
    GraftSql.register(name2, root2)
    val e4 = intercept[Exception](spark.sql(
      s"ALTER TABLE graft.`$name2` ALTER COLUMN b TYPE BIGINT"))
    assert(e4.getMessage.contains("slicing"), e4.getMessage)
    // widen THEN rename: both metadata layers compose
    val (root3, name3) = mkTable(col("id"), "int")
    spark.sql(s"ALTER TABLE graft.`$name3` ALTER COLUMN c TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.`$name3` RENAME COLUMN c TO amount")
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$name3`")
      .head.getLong(0) === (0L until 50L).sum)
    val m3 = ManifestCommit.readManifest(spark, root3).get
    assert(m3.colmap === Map("amount" -> "c"))
    assert(m3.tableSchema.get("amount").dataType === LongType)
  }

  test("change feed ACROSS a widen boundary: pre-images carry the upcast " +
      "values (never null-filled or corrupted)") {
    val (root, name) = mkTable(col("id"), "int") // c = id as INT
    val gPre = ManifestCommit.readManifest(spark, root).get.gen
    spark.sql(s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE BIGINT")
    // a rewrite AFTER the widen: ids 0..4 updated via MERGE, with a
    // value only the WIDE type can hold — proving post-images are wide
    val src = uniq("actcdfsrc")
    spark.range(0, 5).toDF("id")
      .withColumn("c", lit(Int.MaxValue.toLong + 7L))
      .createOrReplaceTempView(src)
    spark.sql(s"""MERGE INTO graft.`$name` t USING $src s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val gPost = ManifestCommit.readManifest(spark, root).get.gen
    // the diff window SPANS the widen: the FROM side's dirs are
    // pre-widen files (physical type int32) read in toGen's WIDE schema
    // — their pre-image `c` must be the real old values upcast to long
    val feed = ChangeFeed.diff(spark, root, gPre, gPost, Seq("id"))
    assert(feed.schema("c").dataType === LongType,
      "feed must be emitted in the TO generation's (wide) schema")
    val pre = feed.filter(col(ChangeFeed.ChangeType) === "update_preimage")
      .select("id", "c").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(pre.keySet === (0L until 5L).toSet, pre.toString)
    (0L until 5L).foreach(i => assert(pre(i) === i,
      s"pre-image of id=$i lost the pre-widen value: ${pre(i)}"))
    val post = feed.filter(col(ChangeFeed.ChangeType) === "update_postimage")
      .select("id", "c").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(i => assert(post(i) === Int.MaxValue.toLong + 7L))
  }

  test("change feed across widen-THEN-rename: pre-images carry upcast " +
      "values under the NEW name") {
    val (root, name) = mkTable(col("id"), "int")
    val gPre = ManifestCommit.readManifest(spark, root).get.gen
    spark.sql(s"ALTER TABLE graft.`$name` ALTER COLUMN c TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN c TO amount")
    val src = uniq("actwrsrc")
    spark.range(0, 5).toDF("id").withColumn("amount", lit(8888L))
      .createOrReplaceTempView(src)
    spark.sql(s"""MERGE INTO graft.`$name` t USING $src s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val gPost = ManifestCommit.readManifest(spark, root).get.gen
    val feed = ChangeFeed.diff(spark, root, gPre, gPost, Seq("id"))
    assert(feed.schema("amount").dataType === LongType)
    val pre = feed.filter(col(ChangeFeed.ChangeType) === "update_preimage")
      .select("id", "amount").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(pre.keySet === (0L until 5L).toSet, pre.toString)
    (0L until 5L).foreach(i => assert(pre(i) === i,
      s"pre-image of id=$i across widen+rename: ${pre(i)}"))
  }

  test("change feed across a DROP COLUMN boundary: the dropped column " +
      "is absent from the feed, surviving pre-images stay real") {
    val root = Files.createTempDirectory("graft_act_").toString + "/t"
    val df = spark.range(0, 30).toDF("id")
      .withColumn("c", col("id") * 2).withColumn("extra", col("id") + 100)
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d), pruneDisplaced = false,
      schema = Some(StructType(df.schema.fields.map(_.copy(nullable = true)))))
    val name = uniq("actdrop")
    GraftSql.register(name, root)
    try {
      val gPre = ManifestCommit.readManifest(spark, root).get.gen
      spark.sql(s"ALTER TABLE graft.`$name` DROP COLUMN extra")
      val src = uniq("actdropsrc")
      spark.range(0, 4).toDF("id").withColumn("c", lit(4242L))
        .createOrReplaceTempView(src)
      spark.sql(s"""MERGE INTO graft.`$name` t USING $src s ON t.id = s.id
                   |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      val gPost = ManifestCommit.readManifest(spark, root).get.gen
      val feed = ChangeFeed.diff(spark, root, gPre, gPost, Seq("id"))
      // emitted in the TO generation's schema: the dropped column is gone
      assert(!feed.columns.contains("extra"), feed.columns.mkString(","))
      val pre = feed.filter(col(ChangeFeed.ChangeType) === "update_preimage")
        .select("id", "c").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pre.keySet === (0L until 4L).toSet, pre.toString)
      (0L until 4L).foreach(i => assert(pre(i) === i * 2,
        s"surviving pre-image of $i lost: ${pre(i)}"))
    } finally GraftSql.unregister(name)
  }

  test("mini-fuzz (seed 1717): a one-shot widen and rename flips " +
      "interleaved with INSERT / MERGE / DV delete / compaction — " +
      "live == model every step, whole-window change feed reconstructs " +
      "exactly") {
    import spark.implicits._
    val (root, name) = mkTable(col("id"), "int") // c starts NARROW
    val rnd = new scala.util.Random(1717)
    val model0: Map[Long, Long] = (0L until 50L).map(i => i -> i).toMap
    var model = model0
    var nextId = 1000L
    var colName = "c"
    var widened = false
    val g0 = ManifestCommit.readManifest(spark, root).get.gen
    def live(): Map[Long, Long] =
      spark.sql(s"SELECT id, cast(`$colName` as bigint) FROM graft.`$name`")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 16).foreach { step =>
      rnd.nextInt(6) match {
        case 0 => // INSERT a fresh batch (values stay int-safe pre-widen)
          val ids = (0 until 1 + rnd.nextInt(4)).map { _ => nextId += 1; nextId }
          val src = uniq("actfz")
          ids.toDF("id").withColumn(colName,
            (col("id") * 3).cast(if (widened) "bigint" else "int"))
            .createOrReplaceTempView(src)
          spark.sql(
            s"INSERT INTO graft.`$name` SELECT id, `$colName` FROM $src")
          model ++= ids.map(i => i -> i * 3)
        case 1 if model.nonEmpty => // MERGE update of a sample
          val pick = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(3))
          val src = uniq("actfzm")
          pick.toDF("id").withColumn(colName,
            (col("id") + lit(step.toLong * 1000))
              .cast(if (widened) "bigint" else "int"))
            .createOrReplaceTempView(src)
          spark.sql(s"""MERGE INTO graft.`$name` t USING $src s ON t.id = s.id
                       |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
          model ++= pick.map(i => i -> (i + step.toLong * 1000))
        case 2 if model.nonEmpty => // merge-on-read DV delete
          val pick = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(3))
          MergeInto.deleteWhere(spark, root, pick.toDF("id"))
          model --= pick
        case 3 => // minor compaction (folds DVs away, keeps mapping+type)
          graft.ingest.Optimize.compactSmall(spark, root,
            smallBytes = 1L << 30)
        case 4 if !widened => // the ONE-SHOT widen, at a random step
          spark.sql(
            s"ALTER TABLE graft.`$name` ALTER COLUMN `$colName` TYPE BIGINT")
          widened = true
        case _ => // RENAME flip c <-> val (DVs block a rename: compact first)
          graft.ingest.Optimize.compactSmall(spark, root,
            smallBytes = 1L << 30)
          val to = if (colName == "c") "val" else "c"
          spark.sql(
            s"ALTER TABLE graft.`$name` RENAME COLUMN `$colName` TO `$to`")
          colName = to
      }
      assert(live() === model, s"live != model after step $step")
    }
    // whole-window change feed spanning every widen/rename boundary:
    // inserts/deletes/updates derived from it must reconstruct the model
    val gEnd = ManifestCommit.readManifest(spark, root).get.gen
    val feed = ChangeFeed.diff(spark, root, g0, gEnd, Seq("id"))
    val byType = feed
      .select(col("id"), col(colName).cast("bigint").as("v"),
        col(ChangeFeed.ChangeType))
      .collect()
      .groupBy(_.getString(2))
      .map { case (t, rs) =>
        t -> rs.map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap }
    val ins = byType.getOrElse("insert", Map.empty)
    val del = byType.getOrElse("delete", Map.empty)
    val upPre = byType.getOrElse("update_preimage", Map.empty)
    val upPost = byType.getOrElse("update_postimage", Map.empty)
    assert(ins.keySet === model.keySet.diff(model0.keySet))
    ins.foreach { case (k, v) => assert(v === model(k), s"insert $k") }
    assert(del.keySet === model0.keySet.diff(model.keySet))
    val updated = model0.keySet.intersect(model.keySet)
      .filter(k => model0(k) != model(k))
    assert(upPost.keySet === updated)
    updated.foreach { k =>
      assert(upPre(k) === model0(k), s"pre-image of $k across the window")
      assert(upPost(k) === model(k), s"post-image of $k")
    }
  }
}
