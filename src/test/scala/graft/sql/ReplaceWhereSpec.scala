package graft.sql

import graft.SparkSpec
import graft.ingest.{ManifestCommit, MergeInto}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Predicate-scoped atomic overwrite (`MergeInto.replaceWhere` and the
  * `INSERT INTO graft.t REPLACE WHERE <pred> <query>` text route — the
  * public Delta replaceWhere idea): delete-matching + insert-new in ONE
  * commit, cold dirs never read or rewritten, inserted rows proven to
  * conform to the predicate on the staged bytes. */
class ReplaceWhereSpec extends SparkSpec {

  /** 4 range dirs of 100 rows: id in [0,100), [100,200), …, sliced by
    * floor(id/100) with id stats + row counts. */
  private def mkTable(name: String): String = {
    val root = Files.createTempDirectory("graft_rw_").toString + "/t"
    val df = spark.range(0, 400).toDF("id")
      .withColumn("k", col("id") % 7)
      .withColumn("v", concat(lit("v"), col("id")))
    val slice = floor(col("id") / lit(100))
    val dirs = ManifestCommit.writeSliced(spark, root, df, slice,
      Seq("id", ManifestCommit.RowCountStat))
    ManifestCommit.commitReplace(spark, root, dirs.map(_._1),
      pruneDisplaced = false, stats = dirs.toMap, schema = Some(df.schema),
      slice = Some(ManifestCommit.sliceSql(slice)))
    GraftSql.register(name, root)
    root
  }

  private def mkRows(ids: Seq[Long]) =
    spark.createDataFrame(ids.map(i => (i, i % 7, s"n$i")))
      .toDF("id", "k", "v")

  test("whole-dir replace: cold dirs byte-identical, one atomic commit") {
    val root = mkTable("rw_whole")
    val m1 = ManifestCommit.readManifest(spark, root).get
    val r = MergeInto.replaceWhere(spark, root,
      mkRows(100L to 104L), col("id") >= 100 && col("id") < 200)
    val m2 = ManifestCommit.readManifest(spark, root).get
    // exactly one generation: delete + insert were never separately visible
    assert(m2.gen === m1.gen + 1)
    // only the [100,200) dir was touched; the three cold dirs carry over
    assert(r.dirsRewritten === 1, s"stats must scope one dir: $r")
    assert(m1.dirs.toSet.intersect(m2.dirs.toSet).size === 3)
    val got = ManifestCommit.read(spark, root)
    assert(got.count() === 305)
    assert(got.filter(col("id") >= 100 && col("id") < 200).count() === 5)
    assert(got.filter(col("v") === "n100").count() === 1)
  }

  test("partial dirs rewrite survivors; inserted rows land in the table's slicing") {
    val root = mkTable("rw_partial")
    MergeInto.replaceWhere(spark, root,
      mkRows((150L to 154L) ++ (200L to 204L)),
      col("id") >= 150 && col("id") < 250)
    val got = ManifestCommit.read(spark, root)
    assert(got.count() === 400 - 100 + 10)
    // survivors intact on both partially-hit dirs
    assert(got.filter(col("id") === 149).count() === 1)
    assert(got.filter(col("id") === 250).count() === 1)
    assert(got.filter(col("id") === 160).count() === 0)
    // the sliced insert keeps skipping tight: an id probe into the
    // replaced range plans no more than the hot dirs
    val m = ManifestCommit.readManifest(spark, root).get
    val hot = m.dirs.filter(d => m.stats.getOrElse(d, Nil)
      .exists(s => s.col == "id" && s.overlaps(Some("200"), Some("204"))))
    assert(hot.nonEmpty && hot.size < m.dirs.size)
  }

  test("non-conforming insert is refused atomically — nothing committed") {
    val root = mkTable("rw_refuse")
    val m1 = ManifestCommit.readManifest(spark, root).get
    val e = intercept[IllegalArgumentException] {
      MergeInto.replaceWhere(spark, root,
        mkRows(Seq(50L, 500L)), col("id") < 100)
    }
    assert(e.getMessage.contains("does not conform"))
    val m2 = ManifestCommit.readManifest(spark, root).get
    assert(m2.gen === m1.gen)
    assert(ManifestCommit.read(spark, root).count() === 400)
  }

  test("rows where the predicate evaluates NULL are kept, not replaced") {
    val root = Files.createTempDirectory("graft_rw_").toString + "/t"
    val df = spark.createDataFrame(Seq(
      (1L, Some(3L), "a"), (2L, None, "b"), (3L, Some(3L), "c"),
      (4L, Some(5L), "d")))
      .toDF("id", "k", "v")
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d),
      pruneDisplaced = false, schema = Some(df.schema))
    MergeInto.replaceWhere(spark, root,
      spark.createDataFrame(Seq((9L, Some(3L), "z"))).toDF("id", "k", "v"),
      col("k") === 3)
    val got = ManifestCommit.read(spark, root).orderBy("id").collect()
    // ids 1 and 3 (k=3) replaced by id 9; id 2 (k null) and id 4 kept
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 4L, 9L))
  }

  test("SQL text route: INSERT INTO graft.t REPLACE WHERE binds positionally") {
    val root = mkTable("rw_sql")
    spark.sql(
      """INSERT INTO graft.rw_sql REPLACE WHERE id >= 300
        |SELECT id + 300 AS a, CAST(id % 7 AS BIGINT) AS b,
        |  concat('sq', id) AS c FROM range(5)""".stripMargin)
    val got = ManifestCommit.read(spark, root)
    assert(got.count() === 305)
    assert(got.agg(max("id")).collect()(0).getLong(0) === 304L)
    assert(got.filter(col("v") === "sq0").count() === 1)
    // op provenance in #history
    val ops = spark.sql("SELECT operation FROM graft.`rw_sql#history`")
      .collect().map(_.getString(0)).toSeq
    assert(ops.contains("replace_where"), ops.toString)
    // a plain INSERT INTO (no REPLACE WHERE) is NOT claimed by the
    // text route — the ordinary insert path still owns it
    spark.sql("INSERT INTO graft.rw_sql VALUES (9999, 3, 'plain')")
    assert(ManifestCommit.read(spark, root).count() === 306)
  }

  test("a predicate identifier ENDING in a query keyword parses whole (ts_from)") {
    val root = Files.createTempDirectory("graft_rw_").toString + "/t"
    val df = spark.range(0, 10).toDF("ts_from")
      .withColumn("v", concat(lit("v"), col("ts_from")))
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d),
      pruneDisplaced = false, schema = Some(df.schema))
    GraftSql.register("rw_kw", root)
    // the regex must not split "ts_from" into pred "ts_" + query "from …"
    spark.sql(
      "INSERT INTO graft.rw_kw REPLACE WHERE ts_from >= 5 " +
        "SELECT id + 5 AS a, concat('n', id) AS b FROM range(2)")
    val got = ManifestCommit.read(spark, root)
    assert(got.count() === 7) // 5 kept + 2 replacements
    assert(got.filter(col("v") === "n0").count() === 1)
  }

  test("a refused insert reclaims the delete-side survivor rewrite too — no orphan dirs") {
    val root = mkTable("rw_orphan")
    val m1 = ManifestCommit.readManifest(spark, root).get
    // partial-dir predicate → a survivor rewrite dir is written before
    // the insert stages; the non-conforming insert must reclaim BOTH
    intercept[IllegalArgumentException] {
      MergeInto.replaceWhere(spark, root,
        mkRows(Seq(150L, 9999L)), // 9999 violates the predicate
        col("id") >= 150 && col("id") < 250)
    }
    assert(ManifestCommit.readManifest(spark, root).get.gen === m1.gen)
    // on-disk data_* dirs are exactly the manifest's — nothing staged left
    val f = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val onDisk = f.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("data_")).toSet
    assert(onDisk === m1.dirs.map(d =>
      new org.apache.hadoop.fs.Path(ManifestCommit.dirAbs(root, d)).getName).toSet,
      s"orphaned staged dirs left behind: ${onDisk.size} vs ${m1.dirs.size}")
  }

  test("empty predicate match still inserts; empty insert still deletes") {
    val root = mkTable("rw_edges")
    // predicate matches nothing → pure insert, one commit
    MergeInto.replaceWhere(spark, root,
      mkRows(Seq(5000L)), col("id") >= 5000)
    assert(ManifestCommit.read(spark, root).count() === 401)
    // empty source → pure predicate delete
    MergeInto.replaceWhere(spark, root,
      mkRows(Nil), col("id") >= 5000)
    assert(ManifestCommit.read(spark, root).count() === 400)
  }
}
