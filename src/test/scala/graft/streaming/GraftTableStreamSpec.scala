package graft.streaming

import graft.SparkSpec
import graft.ingest.{ChangeFeed, ManifestCommit, MergeInto, Optimize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** `readStream`/`writeStream.format("graft-table")` contracts: generation
  * offsets deliver each append exactly once (across restarts, through
  * compactions), non-append commits fail crisply unless skipped or
  * consumed as CDF, and the sink's writer ledger absorbs replays. */
class GraftTableStreamSpec extends SparkSpec {

  private var n = 0
  private def uniq(pfx: String): String = { n += 1; s"${pfx}_strm_$n" }

  private def mkTable(rows: Long = 100): String = {
    val root = Files.createTempDirectory("graft_stream_").toString + "/t"
    val df = spark.range(0, rows).toDF("id").withColumn("v", col("id") * 2)
    val dir = ManifestCommit.newDataDir(root)
    df.write.parquet(dir)
    ManifestCommit.commitReplace(spark, root, Seq(dir),
      pruneDisplaced = false, schema = Some(df.schema))
    root
  }

  private def append(root: String, from: Long, count: Long): Unit = {
    val d = ManifestCommit.newDataDir(root)
    spark.range(from, from + count).toDF("id")
      .withColumn("v", col("id") * 2).write.parquet(d)
    ManifestCommit.commitAppend(spark, root, d)
    ()
  }

  test("initial snapshot then append tail, each row exactly once") {
    val root = mkTable()
    val name = uniq("snap")
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 100L)
      append(root, 100, 10)
      append(root, 110, 10)
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.count() === 120L) // no re-delivery of the snapshot
      assert(got.select("id").distinct().count() === 120L)
      assert(got.agg(sum("v")).head.getLong(0) === (0L until 120L).map(_ * 2).sum)
    } finally q.stop()
  }

  test("graft-to-graft streaming replication survives a restart exactly-once") {
    val root = mkTable()
    val target = Files.createTempDirectory("graft_stream_tgt_").toString + "/r"
    val ckpt = Files.createTempDirectory("graft_stream_ck_").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-table").load(root)
        .writeStream.format("graft-table")
        .option("txnAppId", "replicator-1")
        .option("checkpointLocation", ckpt)
        .start(target)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(ManifestCommit.read(spark, target).count() === 100L)
    append(root, 100, 25)
    run() // restart from the checkpoint: only the new commit delivered
    val rep = ManifestCommit.read(spark, target)
    assert(rep.count() === 125L)
    assert(rep.select("id").distinct().count() === 125L)
    // target inherited a recorded schema on bootstrap (readable when empty)
    assert(ManifestCommit.readManifest(spark, target).get.tableSchema.isDefined)
  }

  test("data-changing commit fails the plain stream with the remedy; skipChangeCommits skips it") {
    val root = mkTable()
    val name = uniq("chg")
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // merge-on-read DV delete: no dir added, one dir's DV changes
      MergeInto.deleteWhere(spark, root,
        spark.range(0, 5).toDF("id"))
      append(root, 100, 10)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = e.getCause.getMessage
      assert(msg.contains("data-changing commit"), msg)
      assert(msg.contains("skipChangeCommits"), msg)
      assert(msg.contains("readChangeFeed"), msg)
    } finally q.stop()
    val name2 = uniq("skip")
    val q2 = spark.readStream.format("graft-table")
      .option("skipChangeCommits", "true").load(root)
      .writeStream.format("memory").queryName(name2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      // snapshot reflects the delete (95), the skipped DV commit is not
      // re-delivered, and the later append arrives
      assert(spark.table(name2).count() === 105L)
      // a change commit LANDING MID-STREAM is skipped (invisible to the
      // stream — the documented skipChangeCommits trade), appends flow on
      MergeInto.deleteWhere(spark, root, spark.range(5, 10).toDF("id"))
      append(root, 110, 10)
      q2.processAllAvailable()
      assert(spark.table(name2).count() === 115L)
    } finally q2.stop()
  }

  test("compaction commits are data-neutral: never delivered, never fatal") {
    val root = mkTable()
    append(root, 100, 10)
    val name = uniq("opt")
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 110L)
      Optimize.compactSmall(spark, root, smallBytes = 128L << 20)
      append(root, 110, 10)
      q.processAllAvailable()
      assert(spark.table(name).count() === 120L)
      assert(spark.table(name).select("id").distinct().count() === 120L)
    } finally q.stop()
  }

  test("startingVersion=latest delivers only post-start commits; a number starts at that generation") {
    val root = mkTable()
    append(root, 100, 10) // gen 2
    val name = uniq("latest")
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 0L)
      append(root, 110, 7) // gen 3
      q.processAllAvailable()
      assert(col0[Long](spark.table(name)
        .agg(count(lit(1)))).head === 7L)
    } finally q.stop()
    val name2 = uniq("fromv")
    val q2 = spark.readStream.format("graft-table")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName(name2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      // gens 2 and 3: the two appends, not the snapshot
      assert(spark.table(name2).count() === 17L)
      assert(spark.table(name2).agg(min("id")).head.getLong(0) === 100L)
    } finally q2.stop()
  }

  test("maxGensPerTrigger paces the tail one commit per batch") {
    val root = mkTable()
    append(root, 100, 5)
    append(root, 105, 5)
    append(root, 110, 5) // gens 2,3,4
    val name = uniq("paced")
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "2")
      .option("maxGensPerTrigger", "1").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 15L)
      val delivering = q.recentProgress.filter(_.numInputRows > 0)
      assert(delivering.length === 3,
        s"expected 3 paced batches, got ${delivering.length}")
      assert(delivering.forall(_.numInputRows === 5L))
    } finally q.stop()
  }

  test("readChangeFeed streams merges and DV deletes as per-commit CDF rows") {
    val root = mkTable(20)
    // gen 2: merge updates v for ids 0-4 and inserts 20-24
    MergeInto.merge(spark, root,
      spark.range(0, 5).toDF("id").withColumn("v", lit(-1L))
        .unionByName(spark.range(20, 25).toDF("id").withColumn("v", col("id") * 2)),
      Seq("id"))
    // gen 3: DV delete of ids 10-11
    MergeInto.deleteWhere(spark, root, spark.range(10, 12).toDF("id"))
    val name = uniq("cdf")
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(name)
      val byType = got.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType === Map("insert" -> 5L, "delete" -> 2L,
        "update_preimage" -> 5L, "update_postimage" -> 5L), byType.toString)
      // per-commit attribution: the merge is gen 2, the delete gen 3
      assert(got.filter(col("_change_type") === "delete")
        .select("_commit_version").distinct().head.getLong(0) === 3L)
      assert(got.filter(col("_change_type") === "insert")
        .select("_commit_version").distinct().head.getLong(0) === 2L)
      // matches the batch change feed over the same window
      val oracle = ChangeFeed.diff(spark, root, 1, 3, Seq("id"))
      assert(got.drop("_commit_version").exceptAll(oracle).count() === 0L)
      assert(oracle.exceptAll(got.drop("_commit_version")).count() === 0L)
    } finally q.stop()
  }

  test("CDF stream over a full lifecycle reconstructs the live table exactly") {
    // id-stats on every commit so the merge stays dir-targeted (without
    // stats every dir is a merge candidate and the whole table collapses
    // to one dir, making the later compaction a no-op generation gap)
    val root = Files.createTempDirectory("graft_stream_").toString + "/t"
    locally {
      val df = spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2)
      val d = ManifestCommit.newDataDir(root)
      df.write.parquet(d)
      ManifestCommit.commitReplace(spark, root, Seq(d),
        pruneDisplaced = false, schema = Some(df.schema),
        stats = Map(d -> ManifestCommit.dirStats(spark, d, Seq("id"))))
    }
    def appendStats(from: Long, count: Long): Unit = {
      val d = ManifestCommit.newDataDir(root)
      spark.range(from, from + count).toDF("id")
        .withColumn("v", col("id") * 2).write.parquet(d)
      ManifestCommit.commitAppend(spark, root, d,
        stats = ManifestCommit.dirStats(spark, d, Seq("id")))
      ()
    }
    val name = uniq("rebuild")
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // snapshot-as-inserts at gen 1
      appendStats(100, 50) // gen 2
      // gen 3: merge — update ids 0-9, insert 150-159
      MergeInto.merge(spark, root,
        spark.range(0, 10).toDF("id").withColumn("v", lit(-1L))
          .unionByName(spark.range(150, 160).toDF("id")
            .withColumn("v", col("id") * 2)),
        Seq("id"))
      Optimize.compactSmall(spark, root, smallBytes = 128L << 20) // gen 4
      MergeInto.deleteWhere(spark, root, spark.range(20, 30).toDF("id")) // gen 5
      appendStats(160, 10) // gen 6
      q.processAllAvailable()
      val feed = spark.table(name)
      // pin the generation numbering the assertions ride on
      assert(ManifestCommit.readManifestAt(spark, root, 4L)
        .flatMap(_.op) === Some("compact_minor"))
      // the compaction generation emits NOTHING (data-neutral)
      assert(feed.filter(col("_commit_version") === 4L).count() === 0L)
      // fold the feed: latest change per key wins; deletes drop the key
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("_commit_version").desc,
          // within a generation an update emits pre+post: post wins
          when(col(ChangeFeed.ChangeType) === "update_postimage", 0)
            .when(col(ChangeFeed.ChangeType) === "update_preimage", 2)
            .otherwise(1).asc)
      val rebuilt = feed
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .filter(col(ChangeFeed.ChangeType) =!= "delete")
        .select("id", "v")
      val live = ManifestCommit.read(spark, root).select("id", "v")
      assert(rebuilt.exceptAll(live).count() === 0L)
      assert(live.exceptAll(rebuilt).count() === 0L)
      assert(live.count() === 100L + 50 + 10 - 10 + 10)
    } finally q.stop()
  }

  test("a stream whose window fell out of retention fails with the remedy") {
    val root = mkTable()
    val name = uniq("ret")
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      (1 to 3).foreach(i => append(root, 100L + i * 10, 10))
      ManifestCommit.expireSnapshots(spark, root, keepLast = 1)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      val msg = e.getCause.getMessage
      assert(msg.contains("no longer retained"), msg)
      assert(msg.contains("fresh checkpoint"), msg)
      assert(msg.contains("keepLast"), msg)
    } finally q.stop()
  }

  test("sink replays are absorbed by the writer ledger (exactly-once contents)") {
    val target = Files.createTempDirectory("graft_sink_").toString + "/r"
    val sink = new GraftTableSink(spark, Map("path" -> target, "txnAppId" -> "w1"))
    val b0: DataFrame = spark.range(0, 10).toDF("id")
    sink.addBatch(0, b0)
    sink.addBatch(0, b0) // crash-replay of the same batch
    sink.addBatch(1, spark.range(10, 15).toDF("id"))
    sink.addBatch(0, b0) // late replay after progress
    val got = ManifestCommit.read(spark, target)
    assert(got.count() === 15L)
    assert(got.select("id").distinct().count() === 15L)
    // a second writer's ledger is independent
    new GraftTableSink(spark, Map("path" -> target, "txnAppId" -> "w2"))
      .addBatch(0, spark.range(15, 18).toDF("id"))
    assert(ManifestCommit.read(spark, target).count() === 18L)
  }

  test("restarted paced stream resumes at checkpointed progress, never re-delivers") {
    val root = mkTable()
    append(root, 100, 5); append(root, 105, 5) // gens 2, 3
    val target = Files.createTempDirectory("graft_paced_tgt_").toString + "/r"
    val ckpt = Files.createTempDirectory("graft_paced_ck_").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startingVersion", "2")
        .option("maxGensPerTrigger", "1").load(root)
        .writeStream.format("graft-table")
        .option("txnAppId", "paced").option("checkpointLocation", ckpt)
        .start(target)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(ManifestCommit.read(spark, target).count() === 10L)
    append(root, 110, 5); append(root, 115, 5) // gens 4, 5
    run() // the restarted source must floor at gen 3, NOT startingVersion
    val rep = ManifestCommit.read(spark, target)
    assert(rep.count() === 20L)
    assert(rep.select("id").distinct().count() === 20L)
  }

  test("restarted startingVersion=latest stream delivers commits landed while it was down") {
    val root = mkTable()
    val target = Files.createTempDirectory("graft_latest_tgt_").toString + "/r"
    val ckpt = Files.createTempDirectory("graft_latest_ck_").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("startingVersion", "latest").load(root)
        .writeStream.format("graft-table")
        .option("txnAppId", "latest-rep").option("checkpointLocation", ckpt)
        .start(target)
      try q.processAllAvailable() finally q.stop()
    }
    run() // nothing yet: latest == stream start
    append(root, 100, 10)
    run() // processed through gen 2
    assert(ManifestCommit.read(spark, target).count() === 10L)
    append(root, 110, 10) // lands while no query is running
    run() // "latest" must NOT re-resolve to restart time and skip gen 3
    assert(ManifestCommit.read(spark, target).count() === 20L)
  }

  test("startingTimestamp delivers commits at or after the instant; exclusive with startingVersion") {
    val root = mkTable() // gen 1
    Thread.sleep(15)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(15)
    append(root, 100, 10) // gen 2 — at/after the instant
    append(root, 110, 10) // gen 3
    val name = uniq("fromts")
    val q = spark.readStream.format("graft-table")
      .option("startingTimestamp", betweenMs.toString).load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // only the two post-instant appends, not the gen-1 snapshot
      assert(spark.table(name).count() === 20L)
      assert(spark.table(name).agg(min("id")).head.getLong(0) === 100L)
    } finally q.stop()
    val e = intercept[Exception] {
      val bad = spark.readStream.format("graft-table")
        .option("startingTimestamp", betweenMs.toString)
        .option("startingVersion", "1").load(root)
        .writeStream.format("memory").queryName(uniq("both"))
        .outputMode("append").start()
      try bad.processAllAvailable() finally bad.stop()
    }
    def m(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + m(t.getCause)
    assert(m(e).contains("mutually exclusive"), m(e))
  }

  test("a future startingTimestamp delivers nothing until a commit reaches the instant") {
    val root = mkTable()
    val name = uniq("future")
    val q = spark.readStream.format("graft-table")
      .option("startingTimestamp", (System.currentTimeMillis() + 3600_000L).toString)
      .load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 0L)
      // commits whose instants still PRECEDE the requested one must not
      // be delivered either (the old behavior fell back to "latest" and
      // streamed them)
      append(root, 100, 10)
      q.processAllAvailable()
      assert(spark.table(name).count() === 0L)
    } finally q.stop()
  }

  test("startingTimestamp at the earliest retained commit errors when its predecessor expired") {
    val root = mkTable()
    (0 until 3).foreach { i => Thread.sleep(12); append(root, 100L + i * 10, 10) }
    ManifestCommit.expireSnapshots(spark, root, keepLast = 2)
    val ts = ManifestCommit.commitTimestamps(spark, root)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-table")
        .option("startingTimestamp", ts.head._2.toString).load(root)
        .writeStream.format("memory").queryName(uniq("expired"))
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    def m(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + m(t.getCause)
    assert(m(e).contains("predecessor has been expired"), m(e))
  }

  test("an empty graft-progress file (crash mid-write) reads as absent, not a parse error") {
    val root = mkTable()
    val target = Files.createTempDirectory("graft_prog_tgt_").toString + "/r"
    val ckpt = Files.createTempDirectory("graft_prog_ck_").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-table").load(root)
        .writeStream.format("graft-table")
        .option("txnAppId", "prog").option("checkpointLocation", ckpt)
        .start(target)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // simulate a crash that truncated the progress file (located by
    // walk — the engine owns the exact sources/<i> layout)
    val prog = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      try s.filter(_.getFileName.toString == "graft-progress")
        .findFirst().orElseThrow(() =>
          new AssertionError("progress file not written under the checkpoint"))
        .toFile
      finally s.close()
    }
    new java.io.FileOutputStream(prog).close() // now empty
    append(root, 100, 10)
    run() // restart must not NumberFormatException; offsets ride the log
    val rep = ManifestCommit.read(spark, target)
    assert(rep.count() === 110L)
    assert(rep.select("id").distinct().count() === 110L)
  }

  test("startingVersion=1 delivers everything from the first commit") {
    val root = mkTable() // gen 1: 100 rows
    append(root, 100, 10) // gen 2
    val name = uniq("fromfirst")
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "1").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 110L)
    } finally q.stop()
    // CDF from the first commit: gen 1 streams as inserts
    val name2 = uniq("cdffirst")
    val q2 = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "1").load(root)
      .writeStream.format("memory").queryName(name2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val got = spark.table(name2)
      assert(got.count() === 110L)
      assert(got.filter(col("_commit_version") === 1L).count() === 100L)
      assert(got.filter(col(ChangeFeed.ChangeType) =!= "insert").count() === 0L)
    } finally q2.stop()
  }

  test("CDF window spanning a pre-evolution generation null-fills the evolved column") {
    val root = mkTable(20) // gen 1, schema (id, v)
    append(root, 20, 5) // gen 2, still (id, v)
    // gen 3: schema-evolving merge adds `tag`
    MergeInto.merge(spark, root,
      spark.range(0, 3).toDF("id").withColumn("v", lit(-1L))
        .withColumn("tag", lit("hot")),
      Seq("id"), evolveSchema = true)
    // stream pinned to the EVOLVED schema, window spans gens 2 and 3
    val name = uniq("cdfevo")
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table(name)
      // gen 2's inserts predate `tag`: present in the stream, null-filled
      val g2 = got.filter(col("_commit_version") === 2L)
      assert(g2.count() === 5L)
      assert(g2.filter(col("tag").isNotNull).count() === 0L)
      // gen 3's postimages carry it
      assert(got.filter(col("_commit_version") === 3L &&
        col(ChangeFeed.ChangeType) === "update_postimage" &&
        col("tag") === "hot").count() === 3L)
    } finally q.stop()
  }

  test("CDF skips compaction generations without planning their diff") {
    val root = mkTable()
    append(root, 100, 10) // gen 2
    val name = uniq("cdfopt")
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Optimize.compactSmall(spark, root, smallBytes = 128L << 20) // gen 3
      append(root, 110, 10) // gen 4
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.filter(col("_commit_version") === 3L).count() === 0L)
      assert(got.count() === 20L)
    } finally q.stop()
  }

  test("sink into a DDL-created sliced table seeds stats from the slicing expression") {
    val target = Files.createTempDirectory("graft_sinkslice_").toString + "/r"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = true)))
    ManifestCommit.commitReplace(spark, target, Nil, pruneDisplaced = false,
      schema = Some(schema), op = "create", slice = Some("floor(id / 8)"))
    val sink = new GraftTableSink(spark, Map("path" -> target, "txnAppId" -> "w"))
    sink.addBatch(0, spark.range(0, 16).toDF("id").withColumn("v", col("id")))
    val m = ManifestCommit.readManifest(spark, target).get
    val cols = m.stats.values.flatten.map(_.col).toSet
    assert(cols.contains("id"), s"stats not seeded from slice: $cols")
    assert(cols.contains(ManifestCommit.RowCountStat), cols.toString)
    assert(ManifestCommit.tableRowCount(spark, target) === Some(16L))
  }

  test("sink routes a mixed-slice batch through writeSliced: slice-tight " +
      "dirs in ONE generation, month probe pinned to 1 dir, replay absorbed") {
    val target = Files.createTempDirectory("graft_sinksliced_").toString + "/r"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType, nullable = true),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = true)))
    ManifestCommit.commitReplace(spark, target, Nil, pruneDisplaced = false,
      schema = Some(schema), op = "create",
      slice = Some("date_format(ts, 'yyyyMM')"))
    val genCreated = ManifestCommit.readManifest(spark, target).get.gen
    // one batch spanning THREE months (a backfill replayed through the
    // replication path / an out-of-order CDC feed)
    val batch = spark.range(0, 75).toDF("v") // Jan 15 .. Mar 29: 3 months
      .withColumn("ts", expr(
        "timestamp'2024-01-15 00:00:00' + make_interval(0, 0, 0, cast(v as int), 0, 0, 0)"))
      .select(col("ts"), col("v"))
    val sink = new GraftTableSink(spark, Map("path" -> target, "txnAppId" -> "w"))
    sink.addBatch(0, batch)
    val m = ManifestCommit.readManifest(spark, target).get
    assert(m.gen === genCreated + 1, "all slice dirs must land in ONE generation")
    assert(m.dirs.size === 3, s"3 months -> 3 dirs, got ${m.dirs.size}")
    // each dir's ts stats stay INSIDE its own month (slice-tight, the
    // INSERT contract — not one batch dir spanning January..April)
    m.dirs.foreach { d =>
      val ts = m.stats(d).find(_.col === "ts").get
      assert(ts.min.take(7) === ts.max.take(7),
        s"dir $d ts stats span months: [${ts.min}, ${ts.max}]")
    }
    // month probe pinned FROM THE PLAN: the SQL read scans exactly 1 dir
    val name = uniq("sliced_sink")
    graft.sql.GraftSql.register(name, target)
    // bounds strictly inside February: stat pruning treats `<` as `<=`
    // (conservative inclusive overlap), so a bound equal to March's min
    // would keep the March dir
    val probe = spark.sql(
      s"SELECT sum(v) FROM graft.`$name` WHERE ts >= timestamp'2024-02-01 00:00:00' " +
        "AND ts <= timestamp'2024-02-29 23:59:59'")
    val scanned = probe.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).filter(_.contains(target))
              .flatMap(_.split("/").filter(s =>
                s.startsWith("data_") && !s.contains("=")).lastOption)
          case _ => Nil
        }
    }.flatten.distinct.size
    assert(scanned === 1, s"month probe scanned $scanned dirs, want 1")
    assert(probe.head.getLong(0) ===
      batch.filter("ts >= timestamp'2024-02-01' and ts <= timestamp'2024-02-29 23:59:59'")
        .agg(sum("v")).head.getLong(0))
    // replay of the SAME batch id: absorbed whole — no new generation,
    // no new dirs (the txn ledger covers the multi-dir commit)
    sink.addBatch(0, batch)
    val m2 = ManifestCommit.readManifest(spark, target).get
    assert(m2.gen === m.gen && m2.dirs.size === 3, "replay must be a no-op")
    // small single-slice batch: stays ONE dir (no fan-out regression)
    sink.addBatch(1, spark.range(100, 110).toDF("v")
      .withColumn("ts", lit("2024-05-01 00:00:00").cast("timestamp"))
      .select(col("ts"), col("v")))
    val m3 = ManifestCommit.readManifest(spark, target).get
    assert(m3.dirs.size === 4, s"single-slice batch must add exactly 1 dir")
    assert(ManifestCommit.tableRowCount(spark, target) === Some(85L))
  }

  test("CDF stream across a RENAME boundary: merge pre/post-images keep " +
      "REAL values under the pinned name (the appends-path contract, " +
      "now on the diff path too)") {
    val root = mkTable(20)
    val name = uniq("cdfren")
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id")
      .load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 20L) // snapshot as inserts
      // the rename lands MID-STREAM; then a merge rewrites ids 0-2
      ManifestCommit.renameColumn(spark, root, "v", "amount")
      MergeInto.merge(spark, root,
        spark.range(0, 3).toDF("id").withColumn("amount", lit(-7L)),
        Seq("id"))
      q.processAllAvailable()
      val got = spark.table(name)
      // pinned schema still serves the OLD name; values are REAL
      assert(got.columns.contains("v") && !got.columns.contains("amount"))
      val pre = got.filter(col("_change_type") === "update_preimage")
        .collect().map(r => r.getAs[Long]("id") ->
          (if (r.isNullAt(r.fieldIndex("v"))) null
           else r.getAs[Long]("v"))).toMap
      assert(pre.keySet === Set(0L, 1L, 2L), pre.toString)
      pre.foreach { case (k, v) =>
        assert(v === k * 2, s"pre-image of $k null-filled/lost: $v") }
      val post = got.filter(col("_change_type") === "update_postimage")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
      post.foreach { case (_, v) => assert(v === -7L) }
    } finally q.stop()
  }

  test("CDF stream across a WIDEN boundary fails crisply with the " +
      "restart remedy — never a narrowing cast or silent corruption") {
    val root = Files.createTempDirectory("graft_stream_").toString + "/t"
    val df = spark.range(0, 10).toDF("id")
      .withColumn("v", col("id").cast("int"))
    val d = ManifestCommit.newDataDir(root)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, root, Seq(d),
      pruneDisplaced = false, schema = Some(org.apache.spark.sql.types
        .StructType(df.schema.fields.map(_.copy(nullable = true)))))
    val name = uniq("cdfwiden")
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id")
      .load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      ManifestCommit.alterColumnType(spark, root, "v",
        org.apache.spark.sql.types.LongType)
      MergeInto.merge(spark, root,
        spark.range(0, 2).toDF("id")
          .withColumn("v", lit(Int.MaxValue.toLong + 5L)), Seq("id"))
      val e = intercept[Exception](q.processAllAvailable())
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("ALTERed") && msg.contains("restart"), msg)
    } finally q.stop()
  }

  test("sliced sink into a WIDENED-then-RENAMED table: batches land " +
      "physical names and wide types, slice pruning stays intact, " +
      "replay absorbed") {
    val target = Files.createTempDirectory("graft_sinkddl_").toString + "/r"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType, nullable = true),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    ManifestCommit.commitReplace(spark, target, Nil, pruneDisplaced = false,
      schema = Some(schema), op = "create",
      slice = Some("date_format(ts, 'yyyyMM')"))
    val name = uniq("sinkddl")
    graft.sql.GraftSql.register(name, target)
    val sink = new GraftTableSink(spark, Map("path" -> target, "txnAppId" -> "w"))
    // batch 0 lands pre-DDL (narrow type, original name)
    sink.addBatch(0, spark.range(0, 20).toDF("n")
      .withColumn("ts", lit("2024-01-15 00:00:00").cast("timestamp"))
      .withColumn("v", col("n").cast("int")).select("ts", "v"))
    // the DDL pair: widen v -> BIGINT, rename v -> amount
    spark.sql(s"ALTER TABLE graft.`$name` ALTER COLUMN v TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN v TO amount")
    // batch 1 arrives under the NEW logical name, narrow int values,
    // spanning TWO months — the sliced path must translate to physical
    // names, store-assign to the wide type, and stay slice-tight
    val batch1 = spark.range(100, 140).toDF("n")
      .withColumn("ts", when(col("n") < 120,
        lit("2024-02-10 00:00:00")).otherwise(lit("2024-03-10 00:00:00"))
        .cast("timestamp"))
      .withColumn("amount", col("n").cast("int")).select("ts", "amount")
    sink.addBatch(1, batch1)
    val m = ManifestCommit.readManifest(spark, target).get
    assert(m.dirs.size === 3, s"Jan + Feb + Mar dirs, got ${m.dirs.size}")
    // the batch's files carry the PHYSICAL name (v) and the WIDE type
    val newDirs = m.dirs.filterNot(
      d => m.stats(d).exists(s => s.col == "ts" && s.min.startsWith("2024-01")))
    newDirs.foreach { d =>
      val footer = spark.read.parquet(
        ManifestCommit.dirAbs(target, d)).schema
      assert(footer.fieldNames.contains("v") &&
        !footer.fieldNames.contains("amount"),
        s"dir $d fields: ${footer.fieldNames.mkString(",")}")
      assert(footer("v").dataType ===
        org.apache.spark.sql.types.LongType, s"dir $d not widened")
    }
    // reads serve the logical name; values exact
    assert(spark.sql(s"SELECT sum(amount) FROM graft.`$name`")
      .head.getLong(0) === (0L until 20L).sum + (100L until 140L).sum)
    // month probe still prunes to exactly 1 dir (slice-tight stats
    // survived the physical-name translation)
    val probe = spark.sql(s"SELECT sum(amount) FROM graft.`$name` " +
      "WHERE ts >= timestamp'2024-02-01' AND ts <= timestamp'2024-02-28'")
    val scanned = probe.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).filter(_.contains(target))
              .flatMap(_.split("/").filter(s =>
                s.startsWith("data_") && !s.contains("=")).lastOption)
          case _ => Nil
        }
    }.flatten.distinct.size
    assert(scanned === 1, s"month probe scanned $scanned dirs, want 1")
    assert(probe.head.getLong(0) === (100L until 120L).sum)
    // replay of batch 1 after the DDL: absorbed whole
    val genBefore = m.gen
    sink.addBatch(1, batch1)
    assert(ManifestCommit.readManifest(spark, target).get.gen === genBefore,
      "replay must be a no-op")
    // an overflowing narrow value in a LATER batch is fine now (wide
    // column): the store-assignment cast is int->bigint, never lossy
    sink.addBatch(2, spark.range(0, 1).toDF("n")
      .withColumn("ts", lit("2024-04-01 00:00:00").cast("timestamp"))
      .withColumn("amount", lit(Long.MaxValue - 1)).select("ts", "amount"))
    assert(spark.sql(
      s"SELECT amount FROM graft.`$name` WHERE ts >= timestamp'2024-04-01'")
      .head.getLong(0) === Long.MaxValue - 1)
  }

  test("sink rejects .partitionBy()") {
    val target = Files.createTempDirectory("graft_sinkpart_").toString + "/r"
    val e = intercept[Exception] {
      spark.readStream.format("rate").load()
        .select(col("value").as("id"))
        .writeStream.format("graft-table")
        .option("txnAppId", "w").partitionBy("id")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sinkpart_ck_").toString)
        .start(target)
    }
    def m(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + m(t.getCause)
    assert(m(e).contains("partitionBy"), m(e))
  }

  test("sink alignment uses store-assignment casts: overflow fails, never lands as null") {
    val target = Files.createTempDirectory("graft_sinkcast_").toString + "/r"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    ManifestCommit.commitReplace(spark, target, Nil,
      pruneDisplaced = false, schema = Some(schema))
    val sink = new GraftTableSink(spark, Map("path" -> target, "txnAppId" -> "w"))
    sink.addBatch(0, spark.range(0, 5).toDF("id")) // in-range long → int
    assert(ManifestCommit.read(spark, target).count() === 5L)
    assert(ManifestCommit.read(spark, target).schema("id").dataType
      === org.apache.spark.sql.types.IntegerType)
    val e = intercept[Exception] {
      sink.addBatch(1, spark.range(3000000000L, 3000000001L).toDF("id"))
    }
    def hasOverflow(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[ArithmeticException] ||
        Option(t.getMessage).exists(m =>
          m.toLowerCase.contains("overflow") || m.contains("CAST_")) ||
        hasOverflow(t.getCause))
    assert(hasOverflow(e), e.toString)
    assert(ManifestCommit.read(spark, target).count() === 5L) // nothing landed
  }

  test("stream drains exactly-once while a concurrent writer races 20 appends") {
    val root = mkTable() // gen 1: ids 0-99
    val name = uniq("race")
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val writer = new Thread(() =>
        (0 until 20).foreach { i => append(root, 1000L + i * 10L, 10) })
      writer.start()
      // drain WHILE the writer commits: offset polls and batch reads race
      // live delta-log appends (pointer swaps, chain growth)
      while (writer.isAlive) q.processAllAvailable()
      writer.join()
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.count() === 300L)
      assert(got.select("id").distinct().count() === 300L)
    } finally q.stop()
  }

  test("watermarked windowed aggregation composes over the source (event time flows through)") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft_stream_wm_").toString + "/t"
    def batch(startMin: Int, n: Int) = {
      val rows = (0 until n).map(i => org.apache.spark.sql.Row(
        java.sql.Timestamp.valueOf(f"2026-01-01 10:${startMin + i % 5}%02d:00"),
        (i % 3).toLong))
      mkDf(StructType(Seq(
        StructField("ts", TimestampType, true),
        StructField("user", LongType, true))), rows: _*)
    }
    locally {
      val d = ManifestCommit.newDataDir(root)
      batch(0, 30).write.parquet(d)
      ManifestCommit.commitReplace(spark, root, Seq(d),
        pruneDisplaced = false, schema = Some(batch(0, 1).schema))
    }
    val out = Files.createTempDirectory("graft_stream_wm_out_").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table").load(root)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"), col("user"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$out/agg")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    def appendBatch(startMin: Int): Unit = {
      val d = ManifestCommit.newDataDir(root)
      batch(startMin, 30).write.parquet(d)
      ManifestCommit.commitAppend(spark, root, d)
      ()
    }
    appendBatch(40) // advances the checkpointed watermark past 10:00-10:05
    drain()
    appendBatch(50) // a batch processed UNDER that watermark closes them
    drain()
    def agg(df: DataFrame): DataFrame = df
      .groupBy(window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("user"), col("n"))
    val got = spark.read.parquet(s"$out/agg")
      .select(col("window.start").as("ws"), col("user"), col("n"))
    // every window of the FIRST commit is closed and emitted with the
    // exact batch answer; nothing outside the full batch answer appears
    val all = agg(batch(0, 30).unionByName(batch(40, 30)).unionByName(batch(50, 30)))
    val first = agg(batch(0, 30))
    assert(first.exceptAll(got).count() === 0L, "first-commit windows not emitted")
    assert(got.exceptAll(all).count() === 0L, "window outside the batch answer")
  }

  test("registered-name routing and the missing-table error") {
    val root = mkTable()
    graft.sql.GraftSql.register("stream_reg_t", root)
    val name = uniq("reg")
    val q = spark.readStream.format("graft-table")
      .option("table", "stream_reg_t").load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 100L)
    } finally { q.stop(); graft.sql.GraftSql.unregister("stream_reg_t") }
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-table")
        .load(Files.createTempDirectory("graft_stream_no_").toString)
        .writeStream.format("memory").queryName(uniq("no"))
        .outputMode("append").start()
    }
    assert(e.getMessage.contains("not a manifest-committed table"))
  }

  test("maxRowsPerTrigger paces the tail by manifest row stats, zero data I/O") {
    val root = mkTable(10) // gen 1 (snapshot side, not volume-limited)
    def appendCounted(from: Long, count: Long): Unit = {
      val d = ManifestCommit.newDataDir(root)
      spark.range(from, from + count).toDF("id")
        .withColumn("v", col("id") * 2).write.parquet(d)
      ManifestCommit.commitAppend(spark, root, d,
        stats = Seq(ManifestCommit.rowCountStat(spark, d)))
      ()
    }
    (0 until 10).foreach(i => appendCounted(1000 + i * 100, 100)) // gens 2-11
    val name = uniq("rowcap")
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "2") // pure tail: gens 2..11
      .option("maxRowsPerTrigger", "250").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 1000L)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      // 100-row commits under a 250-row cap → two commits per batch
      assert(batches.length === 5, batches.map(_.numInputRows).mkString(","))
      assert(batches.forall(_.numInputRows === 200L),
        batches.map(_.numInputRows).mkString(","))
    } finally q.stop()
    // a commit whose dirs predate the row counter lands ALONE (unknown
    // volume must not be absorbed into a bounded batch)
    append(root, 5000, 7) // gen 12: no __rows stat
    appendCounted(6000, 50) // gen 13
    val name2 = uniq("rowcap2")
    val q2 = spark.readStream.format("graft-table")
      .option("startingVersion", "12")
      .option("maxRowsPerTrigger", "1000").load(root)
      .writeStream.format("memory").queryName(name2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      assert(spark.table(name2).count() === 57L)
      val b2 = q2.recentProgress.filter(_.numInputRows > 0)
      assert(b2.length === 2 && b2.head.numInputRows === 7L,
        b2.map(_.numInputRows).mkString(","))
    } finally q2.stop()
  }

  test("streaming from a SHALLOW CLONE delivers external-dir batches exactly once") {
    val src = mkTable(50)
    append(src, 50, 10) // src: 2 generations, 60 rows
    val clone = Files.createTempDirectory("graft_stream_").toString + "/c"
    ManifestCommit.shallowClone(spark, src, clone)
    // plain tail from the first commit: the clone's generation 1 is all
    // EXTERNAL dirs — the batched append read resolves their absolute
    // paths; a later local append joins the same stream
    append(clone, 100, 5)
    val name = uniq("clone_tail")
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "1").load(clone)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 65L)
      assert(spark.table(name).select("id").distinct().count() === 65L)
    } finally q.stop()
    // CDF mode over the clone: external-dir inserts must carry their
    // commit version through the basename-keyed batched flush (an
    // entry-string keyed join would silently DROP every external row)
    val name2 = uniq("clone_cdf")
    val q2 = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").option("keys", "id")
      .option("startingVersion", "1").load(clone)
      .writeStream.format("memory").queryName(name2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val feed = spark.table(name2)
      assert(feed.count() === 65L, "external-dir CDF rows lost")
      assert(feed.filter(col("_change_type") =!= "insert").count() === 0L)
      assert(feed.filter(col("_commit_version") === 1L).count() === 60L)
      assert(feed.filter(col("_commit_version") === 2L).count() === 5L)
    } finally q2.stop()
  }

  test("a stream recovering 500+ commits behind drains in bounded batches " +
      "(default rate limit), every row exactly once") {
    val root = Files.createTempDirectory("graft_stream_").toString + "/t"
    val df = spark.range(0, 5).toDF("id").withColumn("v", col("id") * 2)
    val seed = ManifestCommit.newDataDir(root)
    df.write.parquet(seed)
    ManifestCommit.commitReplace(spark, root, Seq(seed),
      pruneDisplaced = false, schema = Some(df.schema)) // gen 1
    // 520 more commits as filesystem copies of the seed dir — the
    // backlog of a replica that was down through a long outage; commit
    // cost is O(1) delta records, so this loop is metadata-speed
    val conf = spark.sparkContext.hadoopConfiguration
    val seedPath = new org.apache.hadoop.fs.Path(seed)
    val fs = seedPath.getFileSystem(conf)
    (1 to 520).foreach { _ =>
      val d = new org.apache.hadoop.fs.Path(ManifestCommit.newDataDir(root))
      org.apache.hadoop.fs.FileUtil.copy(fs, seedPath, fs, d, false, conf)
      ManifestCommit.commitAppend(spark, root, d.toString)
    }
    assert(ManifestCommit.readManifest(spark, root).get.gen === 521L)
    val name = uniq("backlog")
    val q = spark.readStream.format("graft-table")
      .option("startingVersion", "1").load(root) // no snapshot: pure tail
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 521L * 5)
      // the DEFAULT maxGensPerTrigger (256) must have split the backlog:
      // ceil(521 / 256) = 3 bounded batches, none above the cap
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3,
        s"expected >= 3 bounded batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 256L * 5),
        batches.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a 500+-commit backlog to FULL catch-up " +
      "in multiple rate-capped batches (SupportsTriggerAvailableNow)") {
    val root = Files.createTempDirectory("graft_stream_").toString + "/t"
    val df = spark.range(0, 5).toDF("id").withColumn("v", col("id") * 2)
    val seed = ManifestCommit.newDataDir(root)
    df.write.parquet(seed)
    ManifestCommit.commitReplace(spark, root, Seq(seed),
      pruneDisplaced = false, schema = Some(df.schema)) // gen 1
    val conf = spark.sparkContext.hadoopConfiguration
    val seedPath = new org.apache.hadoop.fs.Path(seed)
    val fs = seedPath.getFileSystem(conf)
    (1 to 520).foreach { _ =>
      val d = new org.apache.hadoop.fs.Path(ManifestCommit.newDataDir(root))
      org.apache.hadoop.fs.FileUtil.copy(fs, seedPath, fs, d, false, conf)
      ManifestCommit.commitAppend(spark, root, d.toString)
    }
    assert(ManifestCommit.readManifest(spark, root).get.gen === 521L)
    val target = Files.createTempDirectory("graft_stream_tgt_").toString + "/r"
    val ckpt = Files.createTempDirectory("graft_stream_ck_").toString
    def drain(): Int = {
      val q = spark.readStream.format("graft-table")
        .option("startingVersion", "1").load(root)
        .writeStream.format("graft-table")
        .option("txnAppId", "availnow-rep")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(target)
      // a run-and-stop job: the query must TERMINATE ITSELF at full
      // catch-up (before SupportsTriggerAvailableNow, the engine fell
      // back to single-batch execution: ONE capped batch of 256, then a
      // false "caught up" stop at less than half the backlog)
      assert(q.awaitTermination(180000), "AvailableNow run did not stop")
      val n = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      n
    }
    val batches = drain()
    assert(ManifestCommit.read(spark, target).count() === 521L * 5,
      "AvailableNow stopped short of full catch-up")
    assert(ManifestCommit.read(spark, target)
      .select("id").distinct().count() === 5L)
    assert(batches >= 3,
      s"expected >= 3 rate-capped batches (ceil(521/256)), got $batches")
    // commits landing AFTER the drain belong to the NEXT run: a restart
    // picks them up from the checkpoint, again self-terminating
    val d = new org.apache.hadoop.fs.Path(ManifestCommit.newDataDir(root))
    org.apache.hadoop.fs.FileUtil.copy(fs, seedPath, fs, d, false, conf)
    ManifestCommit.commitAppend(spark, root, d.toString)
    drain()
    assert(ManifestCommit.read(spark, target).count() === 522L * 5,
      "restarted AvailableNow run must deliver the post-drain commit")
  }

  test("a SECOND rename mid-stream: DV-carrying appended dirs resolve " +
      "through the PINNED mapping, consistent with plain appends") {
    val root = mkTable() // columns id, v (physical names = logical)
    // first rename BEFORE the stream starts: the stream pins colmap
    // {w -> v} and logical schema (id, w)
    ManifestCommit.renameColumn(spark, root, "v", "w")
    val name = uniq("ren2")
    val q = spark.readStream.format("graft-table").load(root)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 100L)
      // SECOND rename mid-stream: cur.colmap becomes {u -> v} — the
      // pinned logical name "w" no longer keys it
      ManifestCommit.renameColumn(spark, root, "w", "u")
      // one commit ADDS a dir that already carries a DV (no dir removed
      // -> the plain-append stream path takes it): files land PHYSICAL
      // names (id, v), the DV deletes id=105
      val m = ManifestCommit.readManifest(spark, root).get
      val nd = ManifestCommit.newDataDir(root)
      spark.range(100, 110).toDF("id").withColumn("v", col("id") * 2)
        .write.parquet(nd)
      val dvName =
        s"_dv_${java.util.UUID.randomUUID().toString.replace("-", "").take(16)}"
      spark.range(105, 106).toDF("id").write.parquet(s"$root/$dvName")
      val ndName = nd.split('/').last
      ManifestCommit.commitReplace(spark, root,
        m.dirs :+ ndName, pruneDisplaced = false,
        dvs = m.dvs + (ndName -> dvName),
        schema = m.tableSchema, op = "append",
        expectedChecks = Some(m.checks))
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.count() === 109L, "9 live rows of the DV'd dir delivered")
      // pre-fix: this path read the DV'd dir with the CURRENT colmap
      // {u -> v}, where pinned "w" resolves to itself — physical files
      // have no "w", so every delivered value was silently NULL
      val tail = got.filter(col("id") >= 100)
      assert(tail.filter(col("w").isNull).count() === 0L,
        "renamed column null-filled on the DV'd-dir stream path")
      assert(tail.agg(sum("w")).head.getLong(0) ===
        (100L until 110L).filter(_ != 105L).map(_ * 2).sum)
    } finally q.stop()
  }
}
