package graft.sql

import graft.SparkSpec
import graft.ingest.{ManifestCommit, MergeInto, Optimize}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Exact `sizeInBytes` from the manifest (`__bytes` pseudo-stat): wide
  * string corpora are 10×+ under the rows × defaultSize estimate, which
  * would plan a too-big broadcast at scale — the commit-time byte total
  * makes planner stats exact, `#files` byte-accurate, and OPTIMIZE's
  * small-dir selection metadata-only. */
class BytesStatSpec extends SparkSpec {

  private var n = 0
  private def uniq(p: String): String = { n += 1; s"${p}_bytes_$n" }

  /** ~2 KB string payload per row: defaultSize(StringType)=20 B, so the
    * estimate is ~100× under the real bytes. */
  private def wideDf(rows: Long) =
    spark.range(0, rows).toDF("id").withColumn("s",
      // 64 DISTINCT md5s per row (~2 KB, ~50% entropy) — identical
      // segments would compress away and defeat the fixture
      concat((1 to 64).map(i =>
        md5((col("id") * 64 + i).cast("string"))): _*))

  test("a string-heavy table's logical sizeInBytes matches on-disk bytes; " +
      "old manifests fall back to the estimate") {
    val root = Files.createTempDirectory("graft_bytes_").toString + "/t"
    val df = wideDf(5000)
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d),
      pruneDisplaced = false,
      stats = Map(d -> ManifestCommit.dirStats(spark, d,
        Seq("id", ManifestCommit.RowCountStat))),
      schema = Some(org.apache.spark.sql.types.StructType(
        df.schema.fields.map(_.copy(nullable = true)))))
    val m = ManifestCommit.readManifest(spark, root).get
    val onDisk = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(
        ManifestCommit.dirAbs(root, m.dirs.head))).getLength
    assert(ManifestCommit.tableBytesOf(m) === Some(onDisk))
    val name = uniq("wide")
    GraftSql.register(name, root)
    val rel = spark.sql(s"SELECT * FROM graft.`$name`")
      .queryExecution.analyzed.collect { case g: GraftRelation => g }.head
    val stats = rel.computeStats()
    assert(stats.sizeInBytes === BigInt(onDisk),
      s"sizeInBytes ${stats.sizeInBytes} != on-disk $onDisk")
    // the ESTIMATE (rows × defaultSize) is far under — the broadcast
    // hazard this stat exists to close
    val estimate = BigInt(5000) * rel.output.map(_.dataType.defaultSize).sum
    assert(estimate * 10 < BigInt(onDisk),
      s"fixture not wide enough: estimate $estimate vs real $onDisk")
    // an OLD manifest (no __bytes on some dir) falls back to the estimate
    val d2 = ManifestCommit.newDataDir(root)
    wideDf(10).write.parquet(d2)
    ManifestCommit.commitAppend(spark, root, d2) // no stats at all
    val m2 = ManifestCommit.readManifest(spark, root).get
    assert(ManifestCommit.tableBytesOf(m2).isEmpty,
      "partial coverage must not fake an exact total")
  }

  test("broadcast decision pinned: a threshold between the estimate and " +
      "the real bytes must NOT broadcast the wide side") {
    val root = Files.createTempDirectory("graft_bytes_").toString + "/t"
    val df = wideDf(5000)
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d),
      pruneDisplaced = false,
      stats = Map(d -> ManifestCommit.dirStats(spark, d,
        Seq("id", ManifestCommit.RowCountStat))),
      schema = Some(org.apache.spark.sql.types.StructType(
        df.schema.fields.map(_.copy(nullable = true)))))
    val name = uniq("bwide")
    GraftSql.register(name, root)
    val real = ManifestCommit.tableBytesOf(
      ManifestCommit.readManifest(spark, root).get).get
    val estimate = 5000L * (8 + 20)
    val threshold = (estimate + real) / 2 // estimate < threshold < real
    assert(estimate < threshold && threshold < real)
    val other = uniq("probe_view")
    spark.range(0, 2000000).toDF("id").createOrReplaceTempView(other)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      // the aggregate READS the payload so column pruning cannot shrink
      // the wide side to its join key (which would make a broadcast
      // legitimately cheap)
      val j = spark.sql(
        s"SELECT max(length(w.s)) FROM $other o JOIN graft.`$name` w ON o.id = w.id")
      val plan = j.queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"the wide side was broadcast under a threshold its real bytes exceed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("every writer meters __bytes: INSERT (sliced + plain), streaming " +
      "sink, MERGE rewrite, OPTIMIZE; #files serves it; compactSmall " +
      "selects from metadata") {
    val root = Files.createTempDirectory("graft_bytes_").toString + "/t"
    val name = uniq("writers")
    spark.sql(s"CREATE TABLE graft.`$name` (id BIGINT, ts TIMESTAMP, v BIGINT) " +
      s"PARTITIONED BY (months(ts)) LOCATION '$root'")
    def allHaveBytes(): Boolean = {
      val m = ManifestCommit.readManifest(spark, root).get
      m.dirs.forall(d =>
        m.stats.getOrElse(d, Nil).exists(_.col == ManifestCommit.BytesStat))
    }
    // sliced INSERT (writeSliced path)
    val src = uniq("bsrc")
    spark.range(0, 100).toDF("id")
      .withColumn("ts", when(col("id") < 50, lit("2024-01-10"))
        .otherwise(lit("2024-02-10")).cast("timestamp"))
      .withColumn("v", col("id")).createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO graft.`$name` SELECT * FROM $src")
    assert(allHaveBytes(), "sliced INSERT missed __bytes")
    // streaming sink (sliced path)
    val sink = new graft.streaming.GraftTableSink(spark,
      Map("path" -> root, "txnAppId" -> "bw"))
    sink.addBatch(0, spark.range(100, 110).toDF("id")
      .withColumn("ts", lit("2024-03-01").cast("timestamp"))
      .withColumn("v", col("id")))
    assert(allHaveBytes(), "streaming sink missed __bytes")
    // MERGE rewrite
    val msrc = uniq("bmsrc")
    spark.range(0, 5).toDF("id")
      .withColumn("ts", lit("2024-01-10").cast("timestamp"))
      .withColumn("v", lit(999L)).createOrReplaceTempView(msrc)
    spark.sql(s"""MERGE INTO graft.`$name` t USING $msrc s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(allHaveBytes(), "MERGE rewrite missed __bytes")
    // row-level DML rewrite
    spark.sql(s"UPDATE graft.`$name` SET v = v + 1 WHERE id = 60")
    assert(allHaveBytes(), "UPDATE rewrite missed __bytes")
    // #files serves the byte totals
    val files = spark.sql(s"SELECT bytes FROM graft.`$name#files`")
      .collect().map(r => Option(r.get(0)))
    assert(files.nonEmpty && files.forall(_.isDefined))
    // OPTIMIZE (compactSmall) selects small dirs from the metadata and
    // the folded dir carries __bytes again
    sink.addBatch(1, spark.range(200, 205).toDF("id")
      .withColumn("ts", lit("2024-05-01").cast("timestamp"))
      .withColumn("v", col("id")))
    val before = ManifestCommit.readManifest(spark, root).get.dirs.size
    assert(before > 1)
    Optimize.compactSmall(spark, root, smallBytes = 1L << 30)
    val after = ManifestCommit.readManifest(spark, root).get
    // sliced table: the fold is LAYOUT-PRESERVING (one dir per month
    // among the folded rows — Jan, Feb, Mar, May), never one mixed dir
    assert(after.dirs.size === 4, after.dirs.toString)
    assert(allHaveBytes(), "compactSmall missed __bytes")
    assert(ManifestCommit.tableBytesOf(after).isDefined)
  }

  test("__bytes through the remaining commit families: CONVERT (flat + " +
      "multi-level hive), SHALLOW CLONE inherits, DEEP CLONE carries " +
      "exactly, zorder re-meters — sizeInBytes stays exact end to end") {
    def bytesEverywhere(root: String): Unit = {
      val m = ManifestCommit.readManifest(spark, root).get
      m.dirs.foreach(d => assert(
        m.stats.getOrElse(d, Nil).exists(_.col == ManifestCommit.BytesStat),
        s"$root dir $d lost __bytes"))
      assert(ManifestCommit.tableBytesOf(m).isDefined, s"$root total not exact")
    }
    def onDisk(root: String): Long = {
      val m = ManifestCommit.readManifest(spark, root).get
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      m.dirs.map(d => f.getContentSummary(new org.apache.hadoop.fs.Path(
        ManifestCommit.dirAbs(root, d))).getLength).sum
    }
    // multi-level hive CONVERT: the one grouped pass meters bytes too
    val hive = Files.createTempDirectory("graft_bytes_").toString + "/h"
    spark.range(0, 120).toDF("id")
      .withColumn("y", (lit(2024) + col("id") % 2).cast("int"))
      .withColumn("m", (lit(1) + (col("id") / 2) % 2).cast("int"))
      .write.partitionBy("y", "m").parquet(hive)
    val mh = ManifestCommit.convertToGraft(spark, hive, Seq("id"))
    assert(mh.dirs.size === 4)
    bytesEverywhere(hive)
    assert(ManifestCommit.tableBytesOf(mh) === Some(onDisk(hive)),
      "converted table's byte total must be the exact on-disk sum")
    // flat CONVERT
    val flat = Files.createTempDirectory("graft_bytes_").toString + "/f"
    spark.range(0, 50).toDF("id").write.parquet(flat)
    ManifestCommit.convertToGraft(spark, flat, Seq("id"))
    bytesEverywhere(flat)
    // SHALLOW CLONE inherits the source's exact bytes (external refs)
    val clone = Files.createTempDirectory("graft_bytes_").toString + "/c"
    ManifestCommit.shallowClone(spark, flat, clone)
    bytesEverywhere(clone)
    assert(ManifestCommit.tableBytesOf(
      ManifestCommit.readManifest(spark, clone).get) ===
      ManifestCommit.tableBytesOf(
        ManifestCommit.readManifest(spark, flat).get))
    // DEEP CLONE (materialize): byte-identical copies carry the stat
    ManifestCommit.materializeExternal(spark, clone)
    bytesEverywhere(clone)
    assert(ManifestCommit.tableBytesOf(
      ManifestCommit.readManifest(spark, clone).get) ===
      Some(onDisk(clone)), "materialized bytes must stay exact")
    // zorder rewrite re-meters
    val z = Files.createTempDirectory("graft_bytes_").toString + "/z"
    val dz = ManifestCommit.newDataDir(z)
    spark.range(0, 200).toDF("a").withColumn("b", col("a") % 17)
      .write.parquet(dz)
    ManifestCommit.commitReplace(spark, z, Seq(dz), pruneDisplaced = false,
      stats = Map(dz -> ManifestCommit.dirStats(spark, dz,
        Seq("a", "b", ManifestCommit.RowCountStat))))
    Optimize.zorderCompact(spark, z, "a", "b", targetDirs = 2)
    bytesEverywhere(z)
    assert(ManifestCommit.tableBytesOf(
      ManifestCommit.readManifest(spark, z).get) === Some(onDisk(z)),
      "zorder rewrite must re-meter, not carry stale bytes")
  }
}
