package graft.sql

import graft.SparkSpec
import graft.ingest.ManifestCommit
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** `ALTER TABLE graft.t SET PARTITIONED BY (...)` / `DROP PARTITIONING`
  * — partition evolution (the public Iceberg partition-spec-evolution
  * idea) as an O(metadata) commit: existing dirs keep their layout,
  * future writes land under the new expression, and stats-based
  * skipping covers the mixed table with no migration (old dirs prune
  * through their recorded stats; dirs predating the new key are kept
  * conservatively). */
class PartitionEvolutionSpec extends SparkSpec {

  private var n = 0
  private def uniq(p: String): String = { n += 1; s"${p}_pev_$n" }

  private def scannedDirs(df: org.apache.spark.sql.DataFrame,
      root: String): Int =
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

  test("months -> days evolution: old dirs keep their layout and pruning, " +
      "new INSERTs land day-sliced, day probes scan one dir") {
    val loc = Files.createTempDirectory("graft_pev_").toString + "/t"
    val name = uniq("evolve")
    spark.sql(s"CREATE TABLE graft.`$name` (id BIGINT, ts TIMESTAMP, " +
      s"v BIGINT) PARTITIONED BY (months(ts)) LOCATION '$loc'")
    try {
      val src1 = uniq("src")
      spark.range(0, 40).toDF("id")
        .withColumn("ts", when(col("id") < 20, lit("2024-01-10 00:00:00"))
          .otherwise(lit("2024-02-10 00:00:00")).cast("timestamp"))
        .withColumn("v", col("id")).createOrReplaceTempView(src1)
      spark.sql(s"INSERT INTO graft.`$name` SELECT * FROM $src1")
      assert(ManifestCommit.readManifest(spark, loc).get.dirs.size === 2)
      val gOld = ManifestCommit.readManifest(spark, loc).get.gen

      spark.sql(s"ALTER TABLE graft.`$name` SET PARTITIONED BY (days(ts))")
      val m = ManifestCommit.readManifest(spark, loc).get
      assert(m.op === Some("set_slice"))
      assert(m.slice === Some("date_format(ts, 'yyyyMMdd')"))
      assert(m.dirs.size === 2, "evolution must not touch existing dirs")

      // a 3-day March INSERT lands 3 day dirs in ONE generation
      val src2 = uniq("src")
      spark.range(100, 130).toDF("id")
        .withColumn("ts", when(col("id") < 110, lit("2024-03-01 00:00:00"))
          .when(col("id") < 120, lit("2024-03-02 00:00:00"))
          .otherwise(lit("2024-03-03 00:00:00")).cast("timestamp"))
        .withColumn("v", col("id")).createOrReplaceTempView(src2)
      spark.sql(s"INSERT INTO graft.`$name` SELECT * FROM $src2")
      val m2 = ManifestCommit.readManifest(spark, loc).get
      assert(m2.gen === m.gen + 1, "one generation for the sliced INSERT")
      assert(m2.dirs.size === 5, s"2 month dirs + 3 day dirs: ${m2.dirs}")

      // a DAY probe scans exactly 1 dir (new layout slice-tight)...
      val day = spark.sql(s"SELECT sum(v) FROM graft.`$name` " +
        "WHERE ts >= timestamp'2024-03-02 00:00:00' " +
        "AND ts <= timestamp'2024-03-02 12:00:00'")
      assert(scannedDirs(day, loc) === 1, "day probe must scan 1 dir")
      assert(day.head.getLong(0) === (110L until 120L).sum)
      // ...and an OLD-layout month probe still scans exactly 1 dir
      val jan = spark.sql(s"SELECT sum(v) FROM graft.`$name` " +
        "WHERE ts >= timestamp'2024-01-01 00:00:00' " +
        "AND ts <= timestamp'2024-01-31 00:00:00'")
      assert(scannedDirs(jan, loc) === 1, "old month probe must scan 1 dir")
      assert(jan.head.getLong(0) === (0L until 20L).sum)
      // manifest-only COUNT survives the mixed layout
      assert(ManifestCommit.tableRowCount(spark, loc) === Some(70L))
      // time travel to the pre-evolution generation serves its own slice
      assert(ManifestCommit.readManifestAt(spark, loc, gOld).get
        .slice === Some("date_format(ts, 'yyyyMM')"))
      assert(ManifestCommit.readAt(spark, loc, gOld).count() === 40L)
    } finally spark.sql(s"DROP TABLE graft.`$name`")
  }

  test("evolution onto a DIFFERENT column (bucket): new dirs meter the " +
      "new key even though inherited stats never named it") {
    val loc = Files.createTempDirectory("graft_pev_").toString + "/t"
    val name = uniq("evbucket")
    spark.sql(s"CREATE TABLE graft.`$name` (id BIGINT, ts TIMESTAMP, " +
      s"k STRING) PARTITIONED BY (months(ts)) LOCATION '$loc'")
    try {
      val src1 = uniq("src")
      spark.range(0, 20).toDF("id")
        .withColumn("ts", lit("2024-01-10 00:00:00").cast("timestamp"))
        .withColumn("k", concat(lit("k"), col("id")))
        .createOrReplaceTempView(src1)
      spark.sql(s"INSERT INTO graft.`$name` SELECT * FROM $src1")
      spark.sql(s"ALTER TABLE graft.`$name` SET PARTITIONED BY (bucket(4, k))")
      val src2 = uniq("src")
      spark.range(100, 140).toDF("id")
        .withColumn("ts", lit("2024-04-01 00:00:00").cast("timestamp"))
        .withColumn("k", concat(lit("k"), col("id")))
        .createOrReplaceTempView(src2)
      spark.sql(s"INSERT INTO graft.`$name` SELECT * FROM $src2")
      val m = ManifestCommit.readManifest(spark, loc).get
      val newDirs = m.dirs.filter(d =>
        m.stats.getOrElse(d, Nil).exists(_.col == "pmod(hash(k), 4)"))
      assert(newDirs.size === 4,
        s"4 bucket dirs must record the bucket-component stat: " +
          m.dirs.map(d => d -> m.stats.getOrElse(d, Nil).map(_.col)))
      // each bucket dir's component stat is a per-dir CONSTANT (min==max)
      newDirs.foreach { d =>
        val cs = m.stats(d).find(_.col == "pmod(hash(k), 4)").get
        assert(cs.min === cs.max, s"$d bucket stat not constant: $cs")
      }
      // the old month dir simply lacks the new key's stat — kept by any
      // bucket probe, never wrongly pruned
      assert(spark.sql(s"SELECT count(*) FROM graft.`$name` " +
        "WHERE k = 'k105'").head.getLong(0) === 1L)
    } finally spark.sql(s"DROP TABLE graft.`$name`")
  }

  test("DROP PARTITIONING: later INSERTs land one dir; guards refuse " +
      "bad expressions, unknown transforms and time-travel refs") {
    val loc = Files.createTempDirectory("graft_pev_").toString + "/t"
    val name = uniq("evdrop")
    spark.sql(s"CREATE TABLE graft.`$name` (id BIGINT, ts TIMESTAMP) " +
      s"PARTITIONED BY (months(ts)) LOCATION '$loc'")
    try {
      spark.sql(s"ALTER TABLE graft.`$name` DROP PARTITIONING")
      assert(ManifestCommit.readManifest(spark, loc).get.slice.isEmpty)
      val src = uniq("src")
      spark.range(0, 10).toDF("id")
        .withColumn("ts", when(col("id") < 5, lit("2024-01-10 00:00:00"))
          .otherwise(lit("2024-06-10 00:00:00")).cast("timestamp"))
        .createOrReplaceTempView(src)
      spark.sql(s"INSERT INTO graft.`$name` SELECT * FROM $src")
      val m = ManifestCommit.readManifest(spark, loc).get
      assert(m.dirs.size === 1, s"unsliced INSERT must land 1 dir: ${m.dirs}")
      // guards
      val e1 = intercept[Exception](spark.sql(
        s"ALTER TABLE graft.`$name` SET PARTITIONED BY (months(nosuch))"))
      assert(e1.getMessage.contains("does not resolve"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        s"ALTER TABLE graft.`$name` SET PARTITIONED BY (truncate(4, id))"))
      assert(e2.getMessage.contains("unsupported partition transform"),
        e2.getMessage)
      val e3 = intercept[Exception](spark.sql(
        s"ALTER TABLE graft.`$name@v1` SET PARTITIONED BY (months(ts))"))
      assert(e3.getMessage.contains("time-travel"), e3.getMessage)
      // multi-transform composes; re-partitioning arms next INSERT
      spark.sql(s"ALTER TABLE graft.`$name` " +
        "SET PARTITIONED BY (months(ts), bucket(2, id))")
      val s2 = ManifestCommit.readManifest(spark, loc).get.slice
      assert(s2.isDefined && s2.get.contains("yyyyMM") &&
        s2.get.contains("pmod(hash(id), 2)"), s2.toString)
    } finally spark.sql(s"DROP TABLE graft.`$name`")
  }

  test("the streaming sink picks up the evolved slice: a batch after " +
      "evolution lands slice-tight under the NEW expression") {
    val loc = Files.createTempDirectory("graft_pev_").toString + "/t"
    val name = uniq("evsink")
    spark.sql(s"CREATE TABLE graft.`$name` (ts TIMESTAMP, v BIGINT) " +
      s"PARTITIONED BY (months(ts)) LOCATION '$loc'")
    try {
      val sink = new graft.streaming.GraftTableSink(spark,
        Map("path" -> loc, "txnAppId" -> "pev"))
      sink.addBatch(0, spark.range(0, 10).toDF("v")
        .withColumn("ts", lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("ts", "v"))
      assert(ManifestCommit.readManifest(spark, loc).get.dirs.size === 1)
      spark.sql(s"ALTER TABLE graft.`$name` SET PARTITIONED BY (days(ts))")
      // one batch spanning two DAYS inside one month: the old layout
      // would land 1 dir, the evolved one lands 2 day-tight dirs
      sink.addBatch(1, spark.range(10, 30).toDF("v")
        .withColumn("ts", when(col("v") < 20, lit("2024-02-01 00:00:00"))
          .otherwise(lit("2024-02-02 00:00:00")).cast("timestamp"))
        .select("ts", "v"))
      val m = ManifestCommit.readManifest(spark, loc).get
      assert(m.dirs.size === 3, s"1 month dir + 2 day dirs: ${m.dirs}")
      val probe = spark.sql(s"SELECT sum(v) FROM graft.`$name` " +
        "WHERE ts >= timestamp'2024-02-02 00:00:00'" +
        " AND ts <= timestamp'2024-02-02 12:00:00'")
      assert(scannedDirs(probe, loc) === 1, "day probe must scan 1 dir")
      assert(probe.head.getLong(0) === (20L until 30L).sum)
    } finally spark.sql(s"DROP TABLE graft.`$name`")
  }

  test("OPTIMIZE after an evolution MIGRATES old-layout dirs to the new " +
      "slice: the per-slice fold rewrites them day-tight, day probes " +
      "prune the whole table") {
    val loc = Files.createTempDirectory("graft_pev_").toString + "/t"
    val name = uniq("evmig")
    spark.sql(s"CREATE TABLE graft.`$name` (id BIGINT, ts TIMESTAMP) " +
      s"PARTITIONED BY (months(ts)) LOCATION '$loc'")
    try {
      // one month dir spanning 3 distinct days (the OLD layout)
      val src = uniq("src")
      spark.range(0, 30).toDF("id")
        .withColumn("ts", when(col("id") < 10, lit("2024-01-01 00:00:00"))
          .when(col("id") < 20, lit("2024-01-02 00:00:00"))
          .otherwise(lit("2024-01-03 00:00:00")).cast("timestamp"))
        .createOrReplaceTempView(src)
      spark.sql(s"INSERT INTO graft.`$name` SELECT * FROM $src")
      assert(ManifestCommit.readManifest(spark, loc).get.dirs.size === 1)
      spark.sql(s"ALTER TABLE graft.`$name` SET PARTITIONED BY (days(ts))")
      // compaction IS the migration: the small old-layout dir folds
      // through writeSliced under the CURRENT (day) slice
      spark.sql(s"OPTIMIZE graft.`$name`")
      val m = ManifestCommit.readManifest(spark, loc).get
      assert(m.dirs.size === 3, s"3 day-tight dirs after OPTIMIZE: ${m.dirs}")
      m.dirs.foreach { d =>
        val ts = m.stats(d).find(_.col == "ts").get
        assert(ts.min.take(10) === ts.max.take(10),
          s"migrated dir $d spans days: [${ts.min}, ${ts.max}]")
      }
      val probe = spark.sql(s"SELECT count(*) FROM graft.`$name` " +
        "WHERE ts >= timestamp'2024-01-02 00:00:00' " +
        "AND ts <= timestamp'2024-01-02 12:00:00'")
      assert(scannedDirs(probe, loc) === 1, "post-migration day probe")
      assert(probe.head.getLong(0) === 10L)
      assert(ManifestCommit.tableRowCount(spark, loc) === Some(30L))
    } finally spark.sql(s"DROP TABLE graft.`$name`")
  }

  test("RENAME COLUMN keeps refusing the CURRENT slice's references " +
      "after an evolution re-keys the layout") {
    val loc = Files.createTempDirectory("graft_pev_").toString + "/t"
    val name = uniq("evren")
    spark.sql(s"CREATE TABLE graft.`$name` (id BIGINT, ts TIMESTAMP, " +
      s"k STRING) PARTITIONED BY (months(ts)) LOCATION '$loc'")
    try {
      spark.sql(s"ALTER TABLE graft.`$name` SET PARTITIONED BY (bucket(4, k))")
      // ts is no longer slice-referenced: its rename is legal now
      spark.sql(s"ALTER TABLE graft.`$name` RENAME COLUMN ts TO event_ts")
      // k IS the current slice's reference: refused
      val e = intercept[Exception](spark.sql(
        s"ALTER TABLE graft.`$name` RENAME COLUMN k TO domain"))
      assert(e.getMessage.contains("slicing"), e.getMessage)
    } finally spark.sql(s"DROP TABLE graft.`$name`")
  }
}
