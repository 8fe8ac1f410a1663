package graft.sql

import graft.SparkSpec
import graft.ingest.ManifestCommit
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL DDL over graft tables: CREATE TABLE (with PARTITIONED BY mapping
  * to the manifest slicing expression), CTAS, DROP, TRUNCATE — the DDL
  * face of the programmatic create/truncate surface (M1/M3), reference
  * create_clickhouse_models.py / gen_pipeline DDL flows. */
class GraftDdlSpec extends SparkSpec {

  private def scratch(): String =
    Files.createTempDirectory("graft_ddlspec_").toString

  test("CREATE TABLE commits an empty schema-carrying generation; INSERT lands sliced") {
    val loc = scratch() + "/t1"
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_t1 (id BIGINT, ts TIMESTAMP, v STRING)
         |PARTITIONED BY (months(ts)) LOCATION '$loc'""".stripMargin)
    val m = ManifestCommit.readManifest(spark, loc).get
    assert(m.dirs.isEmpty && m.op === Some("create"))
    assert(m.tableSchema.get.fieldNames.toSeq === Seq("id", "ts", "v"))
    assert(m.slice === Some("date_format(ts, 'yyyyMM')"))
    // empty table reads as an empty, correctly-shaped frame
    assert(spark.sql("SELECT * FROM graft.ddlspec_t1").count() === 0L)
    // an INSERT spanning 2 months lands as 2 month dirs via the slice
    spark.sql(
      """INSERT INTO graft.ddlspec_t1 VALUES
        |(1, TIMESTAMP '2024-01-05 00:00:00', 'a'),
        |(2, TIMESTAMP '2024-02-05 00:00:00', 'b'),
        |(3, TIMESTAMP '2024-02-20 00:00:00', 'c')""".stripMargin)
    val m2 = ManifestCommit.readManifest(spark, loc).get
    assert(m2.dirs.size === 2, m2.dirs)
    // the first insert SEEDED stats from the slicing refs: ts range per
    // month dir (date pruning live) and the exact row counter (COUNT(*)
    // answers manifest-only, LocalRelation plan)
    val cnt = spark.sql("SELECT count(*) FROM graft.ddlspec_t1")
    assert(cnt.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      cnt.queryExecution.optimizedPlan.toString)
    assert(cnt.collect().head.getLong(0) === 3L)
    val probe = spark.sql(
      """SELECT v FROM graft.ddlspec_t1
        |WHERE ts >= TIMESTAMP '2024-02-01 00:00:00'
        |  AND ts < TIMESTAMP '2024-03-01 00:00:00'""".stripMargin)
    val scannedP = probe.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.count(_.getName.startsWith("data_"))
          case _ => 0
        }
    }.sum
    assert(scannedP === 1, s"one-month probe must plan 1 of 2 dirs, planned $scannedP")
    assert(probe.count() === 2L)
    // IF NOT EXISTS is a no-op on an existing table; bare CREATE errors
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS graft.ddlspec_t1 (x INT) LOCATION '$loc'")
    assert(ManifestCommit.readManifest(spark, loc).get.gen === m2.gen)
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.ddlspec_t1 (x INT) LOCATION '$loc'")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }

  test("CTAS with identity partitioning: sliced dirs, stats, pruning live from day one") {
    val loc = scratch() + "/t2"
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_t2 PARTITIONED BY (k) LOCATION '$loc'
         |AS SELECT id, id % 4 AS k, id * 2 AS v FROM range(400)""".stripMargin)
    val m = ManifestCommit.readManifest(spark, loc).get
    assert(m.dirs.size === 4)
    assert(m.op === Some("create"))
    assert(m.slice === Some("k"))
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_t2")
      .collect().head.getLong(0) === 400L)
    // k stats recorded per dir: an equality probe plans one dir
    val q = spark.sql("SELECT v FROM graft.ddlspec_t2 WHERE k = 2")
    val scanned = q.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.count(_.getName.startsWith("data_"))
          case _ => 0
        }
    }.sum
    assert(scanned === 1, s"k=2 must plan one of 4 dirs, planned $scanned")
    assert(q.count() === 100L)
  }

  test("TRUNCATE empties the live set; history stays time-travelable; DROP unregisters") {
    val loc = scratch() + "/t3"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_t3 LOCATION '$loc' AS SELECT id FROM range(10)")
    spark.sql("TRUNCATE TABLE graft.ddlspec_t3")
    val m = ManifestCommit.readManifest(spark, loc).get
    assert(m.dirs.isEmpty && m.op === Some("truncate"))
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_t3")
      .collect().head.getLong(0) === 0L)
    // schema survives the truncate; the pre-truncate generation reads back
    assert(m.tableSchema.get.fieldNames.toSeq === Seq("id"))
    assert(spark.sql("SELECT count(*) FROM graft.`ddlspec_t3@v1`")
      .collect().head.getLong(0) === 10L)
    spark.sql("DROP TABLE graft.ddlspec_t3")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.ddlspec_t3").collect()
    }
    assert(e.getMessage.toLowerCase.contains("not"), e.getMessage)
    // external semantics: the data is still there; re-addressable by path
    assert(spark.sql(s"SELECT count(*) FROM graft.`$loc`")
      .collect().head.getLong(0) === 0L)
    spark.sql("DROP TABLE IF EXISTS graft.ddlspec_t3") // no-op, no error
    val e2 = intercept[Exception](spark.sql("DROP TABLE graft.ddlspec_t3"))
    assert(e2.getMessage.contains("not registered"), e2.getMessage)
  }

  test("ALTER TABLE ADD/DROP COLUMNS: O(1) schema commits, cold dirs project") {
    val loc = scratch() + "/t4"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_t4 LOCATION '$loc' AS SELECT id, id * 2 AS v FROM range(10)")
    spark.sql("ALTER TABLE graft.ddlspec_t4 ADD COLUMNS (tag STRING, n BIGINT)")
    val m = ManifestCommit.readManifest(spark, loc).get
    assert(m.op === Some("add_columns"))
    assert(m.tableSchema.get.fieldNames.toSeq === Seq("id", "v", "tag", "n"))
    // cold rows null-fill the new columns; inserts can now carry them
    val r = spark.sql(
      "SELECT id, tag FROM graft.ddlspec_t4 WHERE id = 3").collect()(0)
    assert(r.isNullAt(1))
    spark.sql("INSERT INTO graft.ddlspec_t4 VALUES (100, 200, 'x', 7)")
    assert(spark.sql("SELECT tag FROM graft.ddlspec_t4 WHERE id = 100")
      .collect()(0).getString(0) === "x")
    // duplicate add rejected
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ddlspec_t4 ADD COLUMNS (v DOUBLE)")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // DROP COLUMN narrows the schema; the bytes stay but reads project
    spark.sql("ALTER TABLE graft.ddlspec_t4 DROP COLUMN n")
    val m2 = ManifestCommit.readManifest(spark, loc).get
    assert(m2.op === Some("drop_columns"))
    assert(m2.tableSchema.get.fieldNames.toSeq === Seq("id", "v", "tag"))
    assert(spark.sql("SELECT * FROM graft.ddlspec_t4").columns.toSeq ===
      Seq("id", "v", "tag"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ddlspec_t4 DROP COLUMN nope")
    }
    assert(e2.getMessage.contains("IF EXISTS"), e2.getMessage)
    spark.sql("ALTER TABLE graft.ddlspec_t4 DROP COLUMN IF EXISTS nope") // no-op
  }

  test("DESCRIBE and SHOW TABLES answer from the manifest/registry") {
    val loc = scratch() + "/t5"
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_t5 (id BIGINT, ts TIMESTAMP)
         |PARTITIONED BY (months(ts)) LOCATION '$loc'""".stripMargin)
    val desc = spark.sql("DESCRIBE TABLE graft.ddlspec_t5").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc === Seq(("id", "bigint"), ("ts", "timestamp")))
    val ext = spark.sql("DESCRIBE EXTENDED graft.ddlspec_t5").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext("Provider") === "graft")
    assert(ext("Location") === loc)
    assert(ext("Slicing") === "date_format(ts, 'yyyyMM')")
    val shown = spark.sql("SHOW TABLES IN graft").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(shown.exists(_._2 == "ddlspec_t5"))
    assert(shown.forall(t => t._1 == "graft" && !t._3))
    val like = spark.sql("SHOW TABLES IN graft LIKE 'ddlspec_t5'").collect()
    assert(like.length === 1)
    // Spark's LIKE contract: case-insensitive, '*' wildcard, '|' alternation,
    // regex metachars literal
    assert(spark.sql("SHOW TABLES IN graft LIKE 'DDLSPEC_T5'").collect().length === 1)
    assert(spark.sql("SHOW TABLES IN graft LIKE 'ddlspec_t5|nope_zz'")
      .collect().length === 1)
    assert(spark.sql("SHOW TABLES IN graft LIKE 'ddlspec.t5'").collect().isEmpty,
      "'.' must match literally, not as a regex metachar")
    assert(spark.sql("SHOW TABLES IN graft LIKE 'ddlspec*'").collect().length >= 1)
  }

  test("ALTER TABLE RENAME repoints the registry; data untouched") {
    val loc = scratch() + "/t8"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_t8 LOCATION '$loc' AS SELECT id FROM range(9)")
    spark.sql("ALTER TABLE graft.ddlspec_t8 RENAME TO graft.ddlspec_t8_new")
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_t8_new")
      .collect().head.getLong(0) === 9L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.ddlspec_t8").collect()
    }
    assert(e.getMessage.toLowerCase.contains("not"), e.getMessage)
    // target collision rejected
    spark.sql(s"CREATE TABLE graft.ddlspec_t8 (id BIGINT) LOCATION '${scratch()}/t8b'")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.ddlspec_t8 RENAME TO graft.ddlspec_t8_new")
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    spark.sql("DROP TABLE graft.ddlspec_t8")
    spark.sql("DROP TABLE graft.ddlspec_t8_new")
  }

  test("OPTIMIZE and VACUUM as SQL text: fold, zorder re-layout, retention") {
    val loc = scratch() + "/t6"
    // 4 identity-sliced dirs plus a later append → 5 dirs
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_t6 PARTITIONED BY (k) LOCATION '$loc'
         |AS SELECT id, id % 4 AS k, id * 3 AS v FROM range(400)""".stripMargin)
    spark.sql("INSERT INTO graft.ddlspec_t6 VALUES (1000, 0, 3000)")
    assert(ManifestCommit.readManifest(spark, loc).get.dirs.size === 5)
    // plain OPTIMIZE folds the small dirs PER SLICE VALUE (the table is
    // identity-sliced on k): the stray k=0 append merges into k=0's dir,
    // the layout survives — never one mixed dir
    spark.sql("OPTIMIZE graft.ddlspec_t6")
    val m1 = ManifestCommit.readManifest(spark, loc).get
    assert(m1.dirs.size === 4, m1.dirs)
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_t6")
      .collect().head.getLong(0) === 401L)
    // ZORDER BY re-lays along (id, v) keeping dir-count granularity
    spark.sql("OPTIMIZE graft.ddlspec_t6 ZORDER BY (id, v)")
    val m2 = ManifestCommit.readManifest(spark, loc).get
    assert(m2.op === Some("zorder"))
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_t6")
      .collect().head.getLong(0) === 401L)
    // VACUUM RETAIN 1 GENERATIONS expires everything but the newest
    spark.sql("VACUUM graft.ddlspec_t6 RETAIN 1 GENERATIONS")
    assert(ManifestCommit.snapshotGens(spark, loc).size === 1)
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_t6")
      .collect().head.getLong(0) === 401L)
    // unregistered target → crisp error
    val e = intercept[Exception](spark.sql("OPTIMIZE graft.ddlspec_nope"))
    assert(e.getMessage.contains("not a registered"), e.getMessage)
    spark.sql("DROP TABLE graft.ddlspec_t6")
  }

  test("CREATE on a taken NAME at a new location errors; IF NOT EXISTS never repoints") {
    val loc1 = scratch() + "/a"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_t7 LOCATION '$loc1' AS SELECT id FROM range(5)")
    val loc2 = scratch() + "/b"
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.ddlspec_t7 (id BIGINT) LOCATION '$loc2'")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // IF NOT EXISTS: no-op — the registry must still point at loc1
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS graft.ddlspec_t7 (id BIGINT) LOCATION '$loc2'")
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_t7")
      .collect().head.getLong(0) === 5L, "registry must not repoint")
    assert(!ManifestCommit.isManifestTable(spark, loc2),
      "the IF NOT EXISTS no-op must not create the new location either")
    spark.sql("DROP TABLE graft.ddlspec_t7")
  }

  test("TRUNCATE on a schema-less table captures the schema before emptying") {
    val root = scratch() + "/noschema"
    val d = ManifestCommit.newDataDir(root)
    spark.range(0, 7).toDF("id").withColumn("v", col("id") * 5)
      .write.parquet(d)
    // pre-evolution shape: committed WITHOUT a recorded schema
    ManifestCommit.commitReplace(spark, root, Seq(d), pruneDisplaced = false)
    GraftSql.register("ddlspec_noschema", root)
    spark.sql("TRUNCATE TABLE graft.ddlspec_noschema")
    val m = ManifestCommit.readManifest(spark, root).get
    assert(m.dirs.isEmpty)
    assert(m.tableSchema.isDefined, "truncate must capture the footer schema")
    // the emptied table stays readable and insertable by name
    assert(spark.sql("SELECT * FROM graft.ddlspec_noschema").count() === 0L)
    spark.sql("INSERT INTO graft.ddlspec_noschema VALUES (9, 45)")
    assert(spark.sql("SELECT v FROM graft.ddlspec_noschema WHERE id = 9")
      .collect()(0).getLong(0) === 45L)
    GraftSql.unregister("ddlspec_noschema")
  }

  test("managed CREATE (no LOCATION): warehouse graft.db dir, DROP deletes data") {
    // a leftover from a crashed prior run must not wedge the name: drop
    // any stale registration, then clear the managed dir via re-register
    GraftSql.register("ddlspec_wh",
      spark.sessionState.conf.getConf(
        org.apache.spark.sql.internal.StaticSQLConf.WAREHOUSE_PATH)
        .stripSuffix("/") + "/graft.db/ddlspec_wh")
    spark.sql("DROP TABLE IF EXISTS graft.ddlspec_wh")
    spark.sql("CREATE TABLE graft.ddlspec_wh (id BIGINT)")
    spark.sql("INSERT INTO graft.ddlspec_wh VALUES (7)")
    assert(spark.sql("SELECT id FROM graft.ddlspec_wh")
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
    // managed DROP deletes the data, so an immediate re-CREATE works
    spark.sql("DROP TABLE graft.ddlspec_wh")
    spark.sql("CREATE TABLE graft.ddlspec_wh (id BIGINT)")
    assert(spark.sql("SELECT count(*) FROM graft.ddlspec_wh")
      .collect().head.getLong(0) === 0L)
    spark.sql("DROP TABLE graft.ddlspec_wh")
  }

  test("CHECK constraints: validated at ADD, enforced on every write surface, survive restore") {
    import graft.ingest.{ManifestCommit, MergeInto}
    val loc = scratch() + "/ck"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_ck (id BIGINT, amt DOUBLE) LOCATION '$loc'")
    try {
      spark.sql("INSERT INTO graft.ddlspec_ck VALUES (1, 10.0), (2, 20.0)")
      // ADD validates EXISTING rows: a violated constraint is refused
      val e0 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.ddlspec_ck ADD CONSTRAINT amt_big CHECK (amt > 15)")
      }
      assert(e0.getMessage.contains("existing row"), e0.getMessage)
      assert(ManifestCommit.readManifest(spark, loc).get.checks.isEmpty)
      spark.sql("ALTER TABLE graft.ddlspec_ck ADD CONSTRAINT amt_pos CHECK (amt > 0)")
      assert(ManifestCommit.readManifest(spark, loc).get.checks
        === Map("amt_pos" -> "amt > 0"))
      // INSERT: violating batch refused atomically, valid one lands
      val e1 = intercept[Exception] {
        spark.sql("INSERT INTO graft.ddlspec_ck VALUES (3, 5.0), (4, -1.0)")
      }
      assert(e1.getMessage.contains("amt_pos"), e1.getMessage)
      assert(spark.sql("SELECT count(*) FROM graft.ddlspec_ck")
        .head.getLong(0) === 2L)
      spark.sql("INSERT INTO graft.ddlspec_ck VALUES (3, 5.0)")
      // NULL passes (SQL CHECK semantics)
      spark.sql("INSERT INTO graft.ddlspec_ck VALUES (4, NULL)")
      // UPDATE that would move a row out of the constraint is refused
      val e2 = intercept[Exception] {
        spark.sql("UPDATE graft.ddlspec_ck SET amt = amt - 100 WHERE id = 1")
      }
      assert(e2.getMessage.contains("amt_pos"), e2.getMessage)
      // MERGE with a violating source row is refused; deleteWhen rows
      // don't count (they are being removed, not landed)
      val e3 = intercept[Exception] {
        MergeInto.merge(spark, loc,
          spark.range(9, 10).toDF("id").withColumn("amt", lit(-5.0)),
          Seq("id"))
      }
      assert(e3.getMessage.contains("amt_pos"), e3.getMessage)
      MergeInto.merge(spark, loc,
        spark.range(9, 11).toDF("id").withColumn("amt", lit(-5.0))
          .withColumn("__kill", lit(true)),
        Seq("id"), deleteWhen = Some(col("__kill")))
      // streaming sink enforces too
      val sink = new graft.streaming.GraftTableSink(spark,
        Map("path" -> loc, "txnAppId" -> "ckw"))
      val e4 = intercept[Exception] {
        sink.addBatch(0, spark.range(20, 21).toDF("id")
          .withColumn("amt", lit(-3.0)))
      }
      assert(e4.getMessage.contains("amt_pos"), e4.getMessage)
      sink.addBatch(1, spark.range(20, 21).toDF("id").withColumn("amt", lit(3.0)))
      // DESCRIBE EXTENDED surfaces it
      val desc = spark.sql("DESCRIBE EXTENDED graft.ddlspec_ck").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(desc.get("Constraint amt_pos") === Some("CHECK (amt > 0)"))
      // constraints ride RESTORE with the target generation's set
      val genWith = ManifestCommit.readManifest(spark, loc).get.gen
      spark.sql("ALTER TABLE graft.ddlspec_ck DROP CONSTRAINT amt_pos")
      spark.sql("INSERT INTO graft.ddlspec_ck VALUES (30, -9.0)") // allowed now
      spark.sql(s"RESTORE TABLE graft.ddlspec_ck TO VERSION AS OF $genWith")
      val e5 = intercept[Exception] {
        spark.sql("INSERT INTO graft.ddlspec_ck VALUES (31, -9.0)")
      }
      assert(e5.getMessage.contains("amt_pos"), e5.getMessage)
      // rejections: unknown column, nondeterministic, unnamed, non-CHECK
      assert(intercept[Exception] { spark.sql(
        "ALTER TABLE graft.ddlspec_ck ADD CONSTRAINT bad CHECK (nope > 0)")
      }.getMessage.nonEmpty)
      assert(intercept[Exception] { spark.sql(
        "ALTER TABLE graft.ddlspec_ck ADD CONSTRAINT rnd CHECK (rand() > 0)")
      }.getMessage.contains("deterministic"))
      val e6 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.ddlspec_ck DROP CONSTRAINT ghost")
      }
      assert(e6.getMessage.contains("IF EXISTS"), e6.getMessage)
    } finally spark.sql("DROP TABLE graft.ddlspec_ck")
  }

  test("constraint hardening: delete-clause inserts, duplicates, NOT ENFORCED, DROP COLUMN, concurrent add") {
    import graft.ingest.ManifestCommit
    val loc = scratch() + "/ck2"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_ck2 (id BIGINT, amt DOUBLE) LOCATION '$loc'")
    try {
      spark.sql("INSERT INTO graft.ddlspec_ck2 VALUES (1, 10.0)")
      spark.sql("ALTER TABLE graft.ddlspec_ck2 ADD CONSTRAINT amt_pos CHECK (amt > 0)")
      // an UNMATCHED source row under the DELETE clause falls through to
      // NOT MATCHED INSERT — it LANDS, so it must be constraint-checked
      spark.range(999, 1000).toDF("id").withColumn("amt", lit(-5.0))
        .withColumn("kill", lit(true)).createOrReplaceTempView("ck2_src")
      val e1 = intercept[Exception] { spark.sql(
        """MERGE INTO graft.ddlspec_ck2 t USING ck2_src s ON t.id = s.id
          |WHEN MATCHED AND s.kill THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT (id, amt) VALUES (s.id, s.amt)""".stripMargin)
      }
      assert(e1.getMessage.contains("amt_pos"), e1.getMessage)
      assert(spark.sql("SELECT count(*) FROM graft.ddlspec_ck2")
        .head.getLong(0) === 1L)
      // duplicate names refuse instead of silently replacing (weakening)
      val e2 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.ddlspec_ck2 ADD CONSTRAINT amt_pos CHECK (amt > -99)")
      }
      assert(e2.getMessage.contains("already has"), e2.getMessage)
      assert(ManifestCommit.readManifest(spark, loc).get
        .checks("amt_pos") === "amt > 0")
      // NOT ENFORCED would silently mean the opposite of what we do
      val e3 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.ddlspec_ck2 ADD CONSTRAINT ne CHECK (amt > 0) NOT ENFORCED")
      }
      assert(e3.getMessage.contains("ENFORCED"), e3.getMessage)
      // dropping a constrained column would brick every later write
      val e4 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.ddlspec_ck2 DROP COLUMN amt")
      }
      assert(e4.getMessage.contains("amt_pos"), e4.getMessage)
      // a writer that validated under one constraint set must not commit
      // under another (concurrent ADD CONSTRAINT between read and commit)
      val d = ManifestCommit.newDataDir(loc)
      spark.range(50, 51).toDF("id").withColumn("amt", lit(1.0))
        .write.parquet(d)
      val e5 = intercept[ManifestCommit.ConcurrentCommitException] {
        ManifestCommit.commitAppend(spark, loc, d,
          expectedChecks = Some(Map.empty)) // validated against NO checks
      }
      assert(e5.getMessage.contains("constraints changed"), e5.getMessage)
    } finally spark.sql("DROP TABLE graft.ddlspec_ck2")
  }

  test("SHOW CREATE TABLE emits round-trippable DDL") {
    val loc = scratch() + "/sc"
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_sc (id BIGINT, ts TIMESTAMP, v STRING)
         |PARTITIONED BY (months(ts)) LOCATION '$loc'""".stripMargin)
    try {
      val stmt = spark.sql("SHOW CREATE TABLE graft.ddlspec_sc")
        .collect()(0).getString(0)
      assert(stmt.contains("CREATE TABLE graft.ddlspec_sc"), stmt)
      assert(stmt.contains("`id` BIGINT"), stmt)
      assert(stmt.contains("PARTITIONED BY (months(`ts`))"), stmt)
      assert(stmt.contains(s"LOCATION '$loc'"), stmt)
      // the emitted DDL ROUND-TRIPS through our own parser: executing it
      // under a new name + location creates an equivalent table
      val loc2 = scratch() + "/sc2"
      spark.sql(stmt.replace("graft.ddlspec_sc", "graft.ddlspec_sc2")
        .replace(s"LOCATION '$loc'", s"LOCATION '$loc2'"))
      try {
        val m2 = ManifestCommit.readManifest(spark, loc2).get
        assert(m2.tableSchema.get.fieldNames.toSeq === Seq("id", "ts", "v"))
        assert(m2.slice === Some("date_format(ts, 'yyyyMM')"))
      } finally spark.sql("DROP TABLE graft.ddlspec_sc2")
    } finally spark.sql("DROP TABLE graft.ddlspec_sc")
  }

  test("RESTORE rolls back as a history-preserving commit; TIMESTAMP form resolves") {
    val loc = scratch() + "/tr"
    val df = spark.range(0, 100).toDF("id")
    val d = ManifestCommit.newDataDir(loc)
    df.write.parquet(d)
    ManifestCommit.commitReplace(spark, loc, Seq(d),
      pruneDisplaced = false, schema = Some(df.schema)) // gen 1
    GraftSql.register("ddlspec_restore", loc)
    try {
      Thread.sleep(15)
      val betweenMs = System.currentTimeMillis()
      Thread.sleep(15)
      spark.sql("INSERT INTO graft.ddlspec_restore SELECT id FROM range(100, 150)") // gen 2
      spark.sql("DELETE FROM graft.ddlspec_restore WHERE id < 10") // gen 3
      assert(spark.sql("SELECT count(*) FROM graft.ddlspec_restore")
        .head.getLong(0) === 140L)
      // trailing semicolon must parse like every other maintenance verb
      spark.sql("RESTORE TABLE graft.ddlspec_restore TO VERSION AS OF 1;")
      // live content is gen 1's; the rollback is a NEW generation
      assert(spark.sql("SELECT count(*) FROM graft.ddlspec_restore")
        .head.getLong(0) === 100L)
      val m = ManifestCommit.readManifest(spark, loc).get
      assert(m.gen === 4L && m.op === Some("restore"))
      // pre-restore history remains time-travelable
      assert(spark.sql(
        "SELECT count(*) FROM graft.ddlspec_restore VERSION AS OF 3")
        .head.getLong(0) === 140L)
      // TIMESTAMP form: the instant between gens 1 and 2 restores gen 1
      spark.sql("INSERT INTO graft.ddlspec_restore SELECT id FROM range(150, 160)") // gen 5
      spark.sql("RESTORE TABLE graft.ddlspec_restore TO TIMESTAMP AS OF " +
        s"'${new java.sql.Timestamp(betweenMs)}'") // gen 6 = gen 1 again
      assert(spark.sql("SELECT count(*) FROM graft.ddlspec_restore")
        .head.getLong(0) === 100L)
      // rejections: future generation, unretained target after expiry
      val e1 = intercept[Exception] {
        spark.sql("RESTORE TABLE graft.ddlspec_restore TO VERSION AS OF 99")
      }
      assert(e1.getMessage.contains("cannot restore"), e1.getMessage)
      ManifestCommit.expireSnapshots(spark, loc, keepLast = 2)
      val e2 = intercept[Exception] {
        spark.sql("RESTORE TABLE graft.ddlspec_restore TO VERSION AS OF 2")
      }
      assert(e2.getMessage.contains("not retained"), e2.getMessage)
    } finally GraftSql.unregister("ddlspec_restore")
  }

  test("constraint CAS: a concurrently ADDed constraint fails empty-at-read " +
      "writers and overwrites, in BOTH interleavings") {
    val loc = scratch() + "/ck3"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_ck3 (id BIGINT, amt DOUBLE) LOCATION '$loc'")
    try {
      spark.sql("INSERT INTO graft.ddlspec_ck3 VALUES (1, 10.0)")
      // WRITER reads the table (sees ZERO constraints) and stages a dir
      // whose rows violate a constraint about to appear...
      val d = ManifestCommit.newDataDir(loc)
      spark.range(2, 3).toDF("id").withColumn("amt", lit(-1.0))
        .write.parquet(d)
      // ...then ADD CONSTRAINT lands FIRST (validating only the rows
      // visible to it)
      spark.sql(
        "ALTER TABLE graft.ddlspec_ck3 ADD CONSTRAINT amt_pos CHECK (amt > 0)")
      // the writer's append under its stale EMPTY read set must refuse —
      // passing the validated (empty) set, as every enforced writer does
      val e1 = intercept[ManifestCommit.ConcurrentCommitException] {
        ManifestCommit.commitAppend(spark, loc, d,
          expectedChecks = Some(Map.empty))
      }
      assert(e1.getMessage.contains("constraints changed"), e1.getMessage)
      // the overwrite/CTAS path (commitReplace) carries the same guard
      val e2 = intercept[ManifestCommit.ConcurrentCommitException] {
        ManifestCommit.commitReplace(spark, loc, Seq(d),
          pruneDisplaced = false, expectedChecks = Some(Map.empty))
      }
      assert(e2.getMessage.contains("constraints changed"), e2.getMessage)
      // no unproven row landed
      assert(spark.sql("SELECT count(*) FROM graft.ddlspec_ck3")
        .head.getLong(0) === 1L)
      // REVERSE interleaving: the writer lands FIRST under its (empty)
      // read set — legal; the later ADD CONSTRAINT then validates ALL
      // live rows, including the fresh violating one, and refuses
      spark.sql("ALTER TABLE graft.ddlspec_ck3 DROP CONSTRAINT amt_pos")
      ManifestCommit.commitAppend(spark, loc, d,
        expectedChecks = Some(Map.empty))
      val e3 = intercept[Exception] {
        spark.sql(
          "ALTER TABLE graft.ddlspec_ck3 ADD CONSTRAINT amt_pos CHECK (amt > 0)")
      }
      assert(e3.getMessage.contains("existing row"), e3.getMessage)
    } finally spark.sql("DROP TABLE graft.ddlspec_ck3")
  }

  test("constraint guards resolve case-insensitively; determinism is " +
      "checked on the RESOLVED condition") {
    val loc = scratch() + "/ck4"
    spark.sql(
      s"CREATE TABLE graft.ddlspec_ck4 (id BIGINT, amt DOUBLE) LOCATION '$loc'")
    try {
      // a constraint written over the UPPER-CASED column name resolves
      // (default case-insensitive analysis) — the DROP COLUMN guard must
      // match it the same way, or the drop bricks every later write
      spark.sql(
        "ALTER TABLE graft.ddlspec_ck4 ADD CONSTRAINT amt_pos CHECK (AMT > 0)")
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.ddlspec_ck4 DROP COLUMN amt")
      }
      assert(e1.getMessage.contains("amt_pos"), e1.getMessage)
      // rand() on the UNRESOLVED tree defaults deterministic=true — the
      // guard must test the analyzer-resolved expression and refuse with
      // a crisp error (not a confusing downstream aggregate failure)
      val e2 = intercept[Exception] {
        ManifestCommit.setCheck(spark, loc, "rnd", "rand() < 0.5")
      }
      assert(e2.getMessage.contains("deterministic"), e2.getMessage)
      assert(ManifestCommit.readManifest(spark, loc).get.checks.keySet
        === Set("amt_pos"))
    } finally spark.sql("DROP TABLE graft.ddlspec_ck4")
  }

  test("CREATE TABLE ... SHALLOW CLONE: zero-copy SQL fork with version pinning") {
    val base = scratch()
    val srcLoc = base + "/src"; val cloneLoc = base + "/c1"
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_cs (id BIGINT, amt DOUBLE)
         |LOCATION '$srcLoc'""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.ddlspec_cs VALUES (1, 10.0), (2, 20.0)")
      spark.sql("INSERT INTO graft.ddlspec_cs VALUES (3, 30.0)")
      spark.sql(
        s"""CREATE TABLE graft.ddlspec_cs_c SHALLOW CLONE graft.ddlspec_cs
           |LOCATION '$cloneLoc'""".stripMargin)
      try {
        // zero copy, content identical, op recorded
        val f = new org.apache.hadoop.fs.Path(cloneLoc)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(!f.listStatus(new org.apache.hadoop.fs.Path(cloneLoc))
          .exists(_.getPath.getName.startsWith("data_")))
        assert(spark.sql("SELECT sum(id) FROM graft.ddlspec_cs_c")
          .head.getLong(0) === 6L)
        assert(ManifestCommit.readManifest(spark, cloneLoc).get.op
          === Some("clone"))
        // divergence both ways
        spark.sql("INSERT INTO graft.ddlspec_cs_c VALUES (9, 90.0)")
        spark.sql("DELETE FROM graft.ddlspec_cs WHERE id = 1")
        assert(spark.sql("SELECT sum(id) FROM graft.ddlspec_cs_c")
          .head.getLong(0) === 15L)
        assert(spark.sql("SELECT sum(id) FROM graft.ddlspec_cs")
          .head.getLong(0) === 5L)
        // version-pinned clone: fork generation 2 (first INSERT only)
        val pinLoc = base + "/c2"
        spark.sql(
          s"""CREATE TABLE graft.ddlspec_cs_p SHALLOW CLONE graft.ddlspec_cs
             |VERSION AS OF 2 LOCATION '$pinLoc'""".stripMargin)
        try assert(spark.sql("SELECT sum(id) FROM graft.ddlspec_cs_p")
          .head.getLong(0) === 3L)
        finally spark.sql("DROP TABLE graft.ddlspec_cs_p")
        // duplicate target refused; IF NOT EXISTS is a no-op
        val e = intercept[Exception] { spark.sql(
          s"CREATE TABLE graft.ddlspec_cs_c SHALLOW CLONE graft.ddlspec_cs " +
            s"LOCATION '$base/other'") }
        assert(e.getMessage.contains("already exists"), e.getMessage)
        spark.sql(
          s"CREATE TABLE IF NOT EXISTS graft.ddlspec_cs_c SHALLOW CLONE " +
            s"graft.ddlspec_cs LOCATION '$base/other'")
        // DEEP CLONE: byte-copies, zero external references — survives
        // the source being destroyed outright
        val deepLoc = base + "/deep"
        spark.sql(
          s"""CREATE TABLE graft.ddlspec_cs_d DEEP CLONE graft.ddlspec_cs
             |LOCATION '$deepLoc'""".stripMargin)
        try {
          val md = ManifestCommit.readManifest(spark, deepLoc).get
          assert(md.dirs.forall(!_.startsWith("/")), md.dirs)
          val fsd = new org.apache.hadoop.fs.Path(srcLoc)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fsd.delete(new org.apache.hadoop.fs.Path(srcLoc), true)
          ManifestCommit.clearResolveCache()
          assert(spark.sql("SELECT sum(id) FROM graft.ddlspec_cs_d")
            .head.getLong(0) === 5L) // source state at deep-clone time
        } finally spark.sql("DROP TABLE graft.ddlspec_cs_d")
      } finally spark.sql("DROP TABLE graft.ddlspec_cs_c")
    } finally spark.sql("DROP TABLE graft.ddlspec_cs")
  }

  test("composite PARTITIONED BY (days(ts), bucket(4, domain)): one dir " +
      "per (day, bucket), BOTH dimensions prune from the plan, SHOW " +
      "CREATE round-trips") {
    val loc = scratch() + "/comp"
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_comp
         |(id BIGINT, ts TIMESTAMP, domain STRING, v DOUBLE)
         |PARTITIONED BY (days(ts), bucket(4, domain)) LOCATION '$loc'""".stripMargin)
    try {
      val m = ManifestCommit.readManifest(spark, loc).get
      assert(m.slice === Some(
        "concat_ws('|', date_format(ts, 'yyyyMMdd'), pmod(hash(domain), 4))"),
        m.slice)
      // 2 days × 6 domains
      val values = (for {
        day <- Seq("2024-03-01", "2024-03-02")
        (dom, i) <- Seq("alpha", "beta", "gamma", "delta", "eps", "zeta").zipWithIndex
      } yield s"(${i + 1}, TIMESTAMP '$day 10:00:00', '$dom', ${i * 1.5})")
        .mkString(",\n")
      spark.sql(s"INSERT INTO graft.ddlspec_comp VALUES\n$values")
      val m2 = ManifestCommit.readManifest(spark, loc).get
      // one dir per distinct (day, bucket) pair — derived, not guessed
      val expectedDirs = spark.sql(
        """SELECT count(DISTINCT concat(date_format(ts, 'yyyyMMdd'),
          |  pmod(hash(domain), 4))) FROM graft.ddlspec_comp""".stripMargin)
        .head.getLong(0)
      assert(m2.dirs.size.toLong === expectedDirs, m2.dirs)
      assert(expectedDirs > 2, "test needs multiple (day,bucket) dirs")
      // each dir records the component stats that arm per-dimension pruning
      val statNames = m2.stats.values.flatten.map(_.col).toSet
      assert(statNames.contains("pmod(hash(domain), 4)"), statNames)
      assert(statNames.contains("ts"), statNames)
      def planned(sql: String): Int = {
        val q = spark.sql(sql)
        q.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.count(_.getName.startsWith("data_"))
              case _ => 0
            }
        }.sum
      }
      // time dimension: a one-day probe plans only that day's dirs
      val day2Dirs = spark.sql(
        """SELECT count(DISTINCT concat(date_format(ts, 'yyyyMMdd'),
          |  pmod(hash(domain), 4))) FROM graft.ddlspec_comp
          |WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'""".stripMargin)
        .head.getLong(0)
      val dayProbe =
        """SELECT v FROM graft.ddlspec_comp
          |WHERE ts >= TIMESTAMP '2024-03-02 00:00:00'""".stripMargin
      assert(planned(dayProbe).toLong === day2Dirs,
        s"day probe planned ${planned(dayProbe)} of ${m2.dirs.size}, want $day2Dirs")
      assert(spark.sql(dayProbe).count() === 6L)
      // bucket dimension: domain = 'alpha' plans only alpha's bucket dirs
      val alphaBucketDirs = spark.sql(
        """SELECT count(DISTINCT date_format(ts, 'yyyyMMdd'))
          |FROM graft.ddlspec_comp
          |WHERE pmod(hash(domain), 4) = pmod(hash('alpha'), 4)""".stripMargin)
        .head.getLong(0)
      val domProbe = "SELECT v FROM graft.ddlspec_comp WHERE domain = 'alpha'"
      assert(planned(domProbe).toLong === alphaBucketDirs,
        s"bucket probe planned ${planned(domProbe)} of ${m2.dirs.size}, " +
          s"want $alphaBucketDirs")
      assert(alphaBucketDirs < expectedDirs,
        "bucket pruning must actually drop dirs")
      assert(spark.sql(domProbe).count() === 2L)
      // both dimensions: exactly ONE dir
      val bothProbe =
        """SELECT v FROM graft.ddlspec_comp
          |WHERE ts >= TIMESTAMP '2024-03-02 00:00:00' AND domain = 'alpha'""".stripMargin
      assert(planned(bothProbe) === 1,
        s"combined probe planned ${planned(bothProbe)} of ${m2.dirs.size}")
      assert(spark.sql(bothProbe).count() === 1L)
      // SHOW CREATE emits the transform LIST and it round-trips through
      // our own parser to the identical slicing expression
      val stmt = spark.sql("SHOW CREATE TABLE graft.ddlspec_comp")
        .head.getString(0)
      assert(stmt.contains(
        "PARTITIONED BY (days(`ts`), bucket(4, `domain`))"), stmt)
      val loc2 = scratch() + "/comp_rt"
      spark.sql(stmt
        .replace("graft.ddlspec_comp", "graft.ddlspec_comp_rt")
        .replace(s"LOCATION '$loc'", s"LOCATION '$loc2'"))
      try assert(ManifestCommit.readManifest(spark, loc2).get.slice === m.slice)
      finally spark.sql("DROP TABLE graft.ddlspec_comp_rt")
    } finally spark.sql("DROP TABLE graft.ddlspec_comp")
  }

  test("re-running a crashed DEEP CLONE with IF NOT EXISTS finishes the " +
      "deep half instead of registering a shallow leftover") {
    val base = scratch()
    val srcLoc = base + "/src"; val deepLoc = base + "/deep"
    spark.sql(
      s"""CREATE TABLE graft.ddlspec_dr (id BIGINT, amt DOUBLE)
         |LOCATION '$srcLoc'""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.ddlspec_dr VALUES (1, 10.0), (2, 20.0)")
      // simulate the crash between DEEP CLONE's two steps: the shallow
      // half landed, the materialize never ran, the name never registered
      ManifestCommit.shallowClone(spark, srcLoc, deepLoc)
      assert(ManifestCommit.readManifest(spark, deepLoc).get.dirs
        .exists(_.startsWith("/")), "precondition: external refs present")
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS graft.ddlspec_dr_d DEEP CLONE
           |graft.ddlspec_dr LOCATION '$deepLoc'""".stripMargin)
      try {
        val m = ManifestCommit.readManifest(spark, deepLoc).get
        assert(m.dirs.forall(!_.startsWith("/")),
          s"IF NOT EXISTS rerun left external refs: ${m.dirs}")
        // destroy the source — the finished deep clone must survive
        val f = new org.apache.hadoop.fs.Path(srcLoc)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        f.delete(new org.apache.hadoop.fs.Path(srcLoc), true)
        ManifestCommit.clearResolveCache()
        assert(spark.sql("SELECT sum(id) FROM graft.ddlspec_dr_d")
          .head.getLong(0) === 3L)
      } finally spark.sql("DROP TABLE graft.ddlspec_dr_d")
    } finally spark.sql("DROP TABLE IF EXISTS graft.ddlspec_dr")
  }

  test("DEEP CLONE IF NOT EXISTS over an UNRELATED existing table is a true " +
      "no-op: only the crashed-deep-clone signature auto-finishes") {
    val base = scratch()
    val aLoc = base + "/srcA"; val bLoc = base + "/srcB"
    val tgtLoc = base + "/tgt"
    spark.sql(s"CREATE TABLE graft.ddlspec_nr_a (id BIGINT) LOCATION '$aLoc'")
    spark.sql(s"CREATE TABLE graft.ddlspec_nr_b (id BIGINT) LOCATION '$bLoc'")
    try {
      spark.sql("INSERT INTO graft.ddlspec_nr_a VALUES (1)")
      spark.sql("INSERT INTO graft.ddlspec_nr_b VALUES (2)")
      // an INTENTIONAL shallow clone of B already lives at the target —
      // NOT a crashed deep clone of A
      ManifestCommit.shallowClone(spark, bLoc, tgtLoc)
      val before = ManifestCommit.readManifest(spark, tgtLoc).get
      assert(before.dirs.exists(_.startsWith("/")),
        "precondition: the pre-existing table is a live shallow clone")
      spark.sql(
        s"""CREATE TABLE IF NOT EXISTS graft.ddlspec_nr_d DEEP CLONE
           |graft.ddlspec_nr_a LOCATION '$tgtLoc'""".stripMargin)
      try {
        val after = ManifestCommit.readManifest(spark, tgtLoc).get
        assert(after.gen === before.gen && after.dirs === before.dirs,
          "IF NOT EXISTS must not materialize a table whose external refs " +
            s"point elsewhere: ${before.dirs} -> ${after.dirs}")
        // it still reads B's data — nothing was copied or re-pointed
        assert(spark.sql("SELECT sum(id) FROM graft.ddlspec_nr_d")
          .head.getLong(0) === 2L)
      } finally spark.sql("DROP TABLE graft.ddlspec_nr_d")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.ddlspec_nr_a")
      spark.sql("DROP TABLE IF EXISTS graft.ddlspec_nr_b")
    }
  }

  test("RESTORE to a pre-slicing generation restores the ABSENCE of the " +
      "slicing expression") {
    val loc = scratch() + "/rs"
    val df = spark.range(0, 10).toDF("id")
    val d1 = ManifestCommit.newDataDir(loc)
    df.write.parquet(d1)
    ManifestCommit.commitReplace(spark, loc, Seq(d1),
      pruneDisplaced = false, schema = Some(df.schema)) // gen 1: no slice
    val d2 = ManifestCommit.newDataDir(loc)
    df.write.parquet(d2)
    ManifestCommit.commitReplace(spark, loc, Seq(d2),
      pruneDisplaced = false, schema = Some(df.schema),
      slice = Some("id % 2")) // gen 2: slicing recorded
    assert(ManifestCommit.readManifest(spark, loc).get.slice === Some("id % 2"))
    ManifestCommit.restore(spark, loc, 1L)
    // slice=None in gen 1 must be RESTORED as absent, not inherited
    assert(ManifestCommit.readManifest(spark, loc).get.slice === None)
    // and restoring forward to gen 2 brings the expression back
    ManifestCommit.restore(spark, loc, 2L)
    assert(ManifestCommit.readManifest(spark, loc).get.slice === Some("id % 2"))
  }

  test("__graft_ columns refused at DDL time: CREATE, ADD COLUMNS, " +
      "RENAME COLUMN — with the rename remedy, before any data lands") {
    val loc = scratch() + "/ns"
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.ddl_ns_bad (id BIGINT, __graft_x BIGINT) " +
        s"LOCATION '$loc'"))
    assert(e1.getMessage.contains("reserved") &&
      e1.getMessage.contains("rename"), e1.getMessage)
    assert(ManifestCommit.readManifest(spark, loc).isEmpty,
      "refused CREATE must leave no manifest behind")
    val loc2 = scratch() + "/ns2"
    spark.sql(s"CREATE TABLE graft.ddl_ns_ok (id BIGINT) LOCATION '$loc2'")
    try {
      val e2 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.ddl_ns_ok ADD COLUMNS (__graft_y BIGINT)"))
      assert(e2.getMessage.contains("reserved"), e2.getMessage)
      val e3 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.ddl_ns_ok RENAME COLUMN id TO __graft_id"))
      assert(e3.getMessage.contains("reserved"), e3.getMessage)
      // the table is untouched and fully usable after the refusals
      spark.sql("INSERT INTO graft.ddl_ns_ok VALUES (7)")
      assert(spark.sql("SELECT sum(id) FROM graft.ddl_ns_ok")
        .head.getLong(0) === 7L)
    } finally spark.sql("DROP TABLE graft.ddl_ns_ok")
  }

  test("VACUUM ... DRY RUN over a SHALLOW CLONE reports only locally-" +
      "reclaimable paths — external (source-owned) refs never appear") {
    val base = scratch()
    val srcLoc = base + "/vsrc"; val cloneLoc = base + "/vclone"
    spark.sql(s"CREATE TABLE graft.ddl_vds (id BIGINT) LOCATION '$srcLoc'")
    try {
      spark.sql("INSERT INTO graft.ddl_vds VALUES (1), (2)")
      spark.sql(s"CREATE TABLE graft.ddl_vdc SHALLOW CLONE graft.ddl_vds " +
        s"LOCATION '$cloneLoc'")
      try {
        // diverge the clone LOCALLY: a local dir (gen 2), then a full
        // local rewrite (gen 3) that displaces BOTH the external ref and
        // the local dir from the live set
        spark.sql("INSERT INTO graft.ddl_vdc VALUES (9)")
        val localDirs = ManifestCommit.readManifest(spark, cloneLoc).get
          .dirs.filterNot(_.startsWith("/")).filterNot(_.contains(srcLoc))
        assert(localDirs.size === 1, localDirs)
        val d = ManifestCommit.newDataDir(cloneLoc)
        spark.range(100, 103).toDF("id").write.parquet(d)
        ManifestCommit.commitReplace(spark, cloneLoc, Seq(d),
          pruneDisplaced = false)
        val preview = spark.sql(
          "VACUUM graft.ddl_vdc RETAIN 1 GENERATIONS DRY RUN")
          .collect().map(_.getString(0)).toSet
        // the clone's own displaced dir is reclaimable; the source's
        // dirs are NOT the clone's to delete — even expired, they must
        // never enter the reclaim set
        assert(preview.exists(_.contains(localDirs.head)),
          s"local displaced dir missing from preview: $preview")
        assert(!preview.exists(_.contains(srcLoc)),
          s"preview offered source-owned paths: $preview")
        // dry run touched nothing: source still fully readable from the
        // clone's pinned generation AND from the source itself
        assert(ManifestCommit.readAt(spark, cloneLoc, 1L).count() === 2L)
        assert(spark.sql("SELECT count(*) FROM graft.ddl_vds")
          .head.getLong(0) === 2L)
        // the REAL vacuum reclaims the local dir, leaves the source alone
        spark.sql("VACUUM graft.ddl_vdc RETAIN 1 GENERATIONS")
        val f = new org.apache.hadoop.fs.Path(cloneLoc)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(!f.exists(new org.apache.hadoop.fs.Path(
          s"$cloneLoc/${localDirs.head}")), "local dir not reclaimed")
        assert(spark.sql("SELECT count(*) FROM graft.ddl_vds")
          .head.getLong(0) === 2L, "vacuum of a clone touched its source")
      } finally spark.sql("DROP TABLE graft.ddl_vdc")
    } finally spark.sql("DROP TABLE graft.ddl_vds")
  }

  test("VACUUM ... DRY RUN previews the reclaim set without touching " +
      "anything; the real VACUUM then deletes exactly it") {
    val loc = Files.createTempDirectory("ddl_spec_").toString + "/vac"
    val df = spark.range(0, 10).toDF("id")
    (1 to 3).foreach { i =>
      val d = ManifestCommit.newDataDir(loc)
      df.withColumn("v", col("id") * i).write.parquet(d)
      ManifestCommit.commitReplace(spark, loc, Seq(d),
        pruneDisplaced = false,
        schema = Some(org.apache.spark.sql.types.StructType(
          df.withColumn("v", col("id")).schema.fields.map(_.copy(nullable = true)))))
    }
    graft.sql.GraftSql.register("ddl_vacuum_dry", loc)
    try {
      val preview = spark.sql(
        "VACUUM graft.ddl_vacuum_dry RETAIN 1 GENERATIONS DRY RUN")
      assert(preview.columns.toSeq === Seq("path"))
      val previewed = preview.collect().map(_.getString(0)).toSet
      assert(previewed.nonEmpty, "3 gens retained, keep 1 -> 2 must expire")
      // NOTHING was touched: every previewed path still exists, every
      // generation still time-travels
      val f = new org.apache.hadoop.fs.Path(loc)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      previewed.foreach(p => assert(
        f.exists(new org.apache.hadoop.fs.Path(p)), s"dry run deleted $p"))
      (1L to 3L).foreach(g =>
        assert(ManifestCommit.readAt(spark, loc, g).count() === 10L))
      // the real VACUUM reclaims exactly the previewed set (orphan sweep
      // adds nothing here — no crashed writers)
      spark.sql("VACUUM graft.ddl_vacuum_dry RETAIN 1 GENERATIONS")
      previewed.foreach(p => assert(
        !f.exists(new org.apache.hadoop.fs.Path(p)), s"real vacuum spared $p"))
      assert(ManifestCommit.readAt(spark, loc, 3L).count() === 10L)
      intercept[Exception](ManifestCommit.readAt(spark, loc, 1L).collect())
    } finally graft.sql.GraftSql.unregister("ddl_vacuum_dry")
  }
}
