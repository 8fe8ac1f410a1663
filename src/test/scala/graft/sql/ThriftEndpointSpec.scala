package graft.sql

import graft.SparkSpec
import graft.ingest.ManifestCommit
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The network half of the BI topology (SURVEY §3.3): the reference
  * exposes every table to Superset over a SQL endpoint
  * (reference: superset_bootstrap/datasets.yaml; docs/ASYNC_STACK.md);
  * here the same surface is Spark's own Thrift JDBC/ODBC server started
  * on the engine session. Any JDBC BI tool (Superset's Hive connector,
  * DBeaver, beeline) connects with the stock hive-jdbc driver and reads
  * graft tables BY NAME — each connection's session inherits the
  * injected rules (SparkSession.newSession preserves extensions, and the
  * GraftSql registry is process-global), so wire queries get the same
  * generation pinning, manifest-stats skipping, DV subtraction and
  * metadata-only COUNT(*) the in-process SQL path gets. */
class ThriftEndpointSpec extends SparkSpec {

  test("JDBC clients query graft tables through a live Thrift endpoint") {
    val root = Files.createTempDirectory("graft_thrift_").toString + "/t"
    val df = spark.range(0, 400).toDF("id")
      .withColumn("k", col("id") % 7)
      .withColumn("v", concat(lit("v"), col("id")))
    val slice = floor(col("id") / lit(100))
    val dirs = ManifestCommit.writeSliced(spark, root, df, slice,
      Seq("id", ManifestCommit.RowCountStat))
    ManifestCommit.commitReplace(spark, root, dirs.map(_._1),
      pruneDisplaced = false, stats = dirs.toMap, schema = Some(df.schema))
    GraftSql.register("thriftspec_t", root)

    val port = {
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("hive.server2.thrift.port", port.toString)
    hconf.set("hive.server2.thrift.bind.host", "localhost")
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 60) {
        try conn = java.sql.DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "anonymous", "")
        catch { case _: Exception => attempts += 1; Thread.sleep(500) }
      }
      assert(conn != null, s"thrift endpoint on port $port never accepted")
      try {
        val st = conn.createStatement()
        // aggregate over the wire == the programmatic read
        val rs = st.executeQuery(
          """SELECT k, count(*) AS n, sum(id) AS s FROM graft.thriftspec_t
            |WHERE id >= 50 GROUP BY k ORDER BY k""".stripMargin)
        var got = List.empty[(Long, Long, Long)]
        while (rs.next()) got ::= ((rs.getLong(1), rs.getLong(2), rs.getLong(3)))
        val want = ManifestCommit.read(spark, root).where(col("id") >= 50)
          .groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("s"))
          .orderBy("k").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
        assert(got.reverse === want)

        // the endpoint rides the same machinery: metadata-only COUNT(*)
        val rc = st.executeQuery("SELECT count(*) FROM graft.thriftspec_t")
        assert(rc.next() && rc.getLong(1) === 400L)

        // ... and time travel by @v suffix, quoted the same way
        val d2 = ManifestCommit.newDataDir(root)
        spark.range(1000, 1010).toDF("id").withColumn("k", col("id") % 7)
          .withColumn("v", concat(lit("v"), col("id"))).write.parquet(d2)
        ManifestCommit.commitAppend(spark, root, d2)
        val rtt = st.executeQuery("SELECT max(id) FROM graft.`thriftspec_t@v1`")
        assert(rtt.next() && rtt.getLong(1) === 399L)
        val rlive = st.executeQuery("SELECT max(id) FROM graft.thriftspec_t")
        assert(rlive.next() && rlive.getLong(1) === 1009L)

        // the BI metadata call: DESCRIBE over the wire (manifest-only)
        val rd = st.executeQuery("DESCRIBE TABLE graft.thriftspec_t")
        var cols = List.empty[(String, String)]
        while (rd.next()) cols ::= ((rd.getString(1), rd.getString(2)))
        assert(cols.reverse === List(
          ("id", "bigint"), ("k", "bigint"), ("v", "string")))

        // SHOW TABLES over the wire — the discovery verb BI tools issue
        // alongside the metadata calls
        val rst = st.executeQuery("SHOW TABLES IN graft")
        var shown = List.empty[String]
        while (rst.next()) shown ::= rst.getString(2)
        assert(shown.contains("thriftspec_t"), shown)

        // ---- STOCK JDBC SCHEMA DISCOVERY: DatabaseMetaData.getTables /
        // getColumns — the exact calls Superset's and Metabase's schema
        // sync make (reference metabase_schema_discovery.py:150-210).
        // syncBiCatalog mirrors the registry into a catalog database of
        // views so the stock hive-jdbc metadata operations see them.
        GraftSql.syncBiCatalog(spark)
        val md = conn.getMetaData
        // schema enumeration — the first call of every BI sync loop
        val rsS = md.getSchemas()
        var schemas = List.empty[String]
        while (rsS.next()) schemas ::= rsS.getString("TABLE_SCHEM")
        assert(schemas.contains("graft_bi"), schemas)
        val rsT = md.getTables(null, "graft_bi", "%", null)
        var discovered = List.empty[String]
        while (rsT.next()) discovered ::= rsT.getString("TABLE_NAME")
        assert(discovered.contains("thriftspec_t"), discovered)
        val rsC = md.getColumns(null, "graft_bi", "thriftspec_t", "%")
        var mdCols = List.empty[(String, String)]
        while (rsC.next())
          mdCols ::= ((rsC.getString("COLUMN_NAME"),
            rsC.getString("TYPE_NAME").toLowerCase))
        assert(mdCols.reverse === List(
          ("id", "bigint"), ("k", "bigint"), ("v", "string")), mdCols)

        // querying the DISCOVERED name routes through the graft read
        // path (the view expands to graft.<name>): sees the live
        // generation including the post-snapshot append
        val rq = st.executeQuery(
          "SELECT count(*), max(id) FROM graft_bi.thriftspec_t")
        assert(rq.next() && rq.getLong(1) === 410L && rq.getLong(2) === 1009L)

        // re-sync after unregister drops the stale view from discovery
        GraftSql.register("thriftspec_gone", root)
        GraftSql.syncBiCatalog(spark)
        GraftSql.unregister("thriftspec_gone")
        GraftSql.syncBiCatalog(spark)
        val rsT2 = md.getTables(null, "graft_bi", "thriftspec_gone", null)
        assert(!rsT2.next(), "unregistered table still discoverable")

        // AUTO-REFRESH: once synced, the mirror is standing — a table
        // CREATEd after the sync is discoverable and a DROPped one
        // disappears with NO further syncBiCatalog call (a BI tool
        // connected while tables churn never sees stale discovery)
        val autoLoc = Files.createTempDirectory("graft_thrift_").toString + "/auto"
        st.execute("CREATE TABLE graft.thriftspec_auto (id BIGINT) " +
          s"LOCATION '$autoLoc'")
        val rsA = md.getTables(null, "graft_bi", "thriftspec_auto", null)
        assert(rsA.next(), "freshly created table not auto-discoverable")
        st.execute("DROP TABLE graft.thriftspec_auto")
        val rsA2 = md.getTables(null, "graft_bi", "thriftspec_auto", null)
        assert(!rsA2.next(), "dropped table still auto-discoverable")

        // DDL over the wire: a BI user forks the table from SQL Lab —
        // the per-connection session inherits the injected parser, so
        // SHALLOW CLONE (a text-route statement) works from a stock
        // JDBC client too
        val forkLoc = Files.createTempDirectory("graft_thrift_").toString + "/fork"
        st.execute("CREATE TABLE graft.thriftspec_fork SHALLOW CLONE " +
          s"graft.thriftspec_t LOCATION '$forkLoc'")
        try {
          val rfk = st.executeQuery(
            "SELECT count(*), max(id) FROM graft.thriftspec_fork")
          assert(rfk.next() && rfk.getLong(1) === 410L && rfk.getLong(2) === 1009L)
        } finally st.execute("DROP TABLE graft.thriftspec_fork")

        // a STALE registration (root deleted out from under it) must be
        // skipped, not abort the whole sync loop
        GraftSql.register("thriftspec_stale", "/nonexistent/graft/root")
        try GraftSql.syncBiCatalog(spark)
        finally GraftSql.unregister("thriftspec_stale")
        val rsT3 = md.getTables(null, "graft_bi", "thriftspec_t", null)
        assert(rsT3.next(), "healthy table lost because a stale one aborted sync")

        // SCHEMA-CHANGING DDL over a LIVE mirror: a rename + widen must
        // surface through stock getColumns with NO re-sync (catalog
        // views capture their schema at creation, so the engine
        // re-mirrors the table's view inside the DDL itself)
        locally {
          val ddlLoc = Files.createTempDirectory("graft_thrift_")
            .toString + "/ddl"
          st.execute("CREATE TABLE graft.thriftspec_ddl (id BIGINT, v INT) " +
            s"LOCATION '$ddlLoc'")
          try {
            st.execute("INSERT INTO graft.thriftspec_ddl VALUES (1, 10)")
            def cols(): List[(String, String)] = {
              val rs = md.getColumns(null, "graft_bi", "thriftspec_ddl", "%")
              var out = List.empty[(String, String)]
              while (rs.next()) out ::= ((rs.getString("COLUMN_NAME"),
                rs.getString("TYPE_NAME").toLowerCase))
              out.reverse
            }
            assert(cols() === List(("id", "bigint"), ("v", "int")), cols())
            st.execute(
              "ALTER TABLE graft.thriftspec_ddl ALTER COLUMN v TYPE BIGINT")
            assert(cols() === List(("id", "bigint"), ("v", "bigint")),
              s"widen invisible to the live mirror: ${cols()}")
            st.execute(
              "ALTER TABLE graft.thriftspec_ddl RENAME COLUMN v TO amount")
            assert(cols() === List(("id", "bigint"), ("amount", "bigint")),
              s"rename invisible to the live mirror: ${cols()}")
            // the discovered name serves values under the new column
            val rq2 = st.executeQuery(
              "SELECT amount FROM graft_bi.thriftspec_ddl")
            assert(rq2.next() && rq2.getLong(1) === 10L)
            // ADD / DROP COLUMNS re-mirror too
            st.execute(
              "ALTER TABLE graft.thriftspec_ddl ADD COLUMNS (tag STRING)")
            assert(cols().map(_._1) === List("id", "amount", "tag"), cols())
            st.execute(
              "ALTER TABLE graft.thriftspec_ddl DROP COLUMN tag")
            assert(cols().map(_._1) === List("id", "amount"), cols())
          } finally st.execute("DROP TABLE graft.thriftspec_ddl")
        }

        // CONCURRENT DDL + mirror cycling: registrations race each other
        // AND the mirror session stopping/re-arming mid-churn (deltas are
        // best-effort and may be missed while disarmed). The pinned
        // recovery contract: ONE syncBiCatalog reconciles — discovery
        // afterwards shows exactly the registered set, no stale views,
        // no missing ones, and no DDL was ever failed by a mirror hiccup.
        locally {
          val churn = (0 until 4).map { i =>
            new Thread(() => (0 until 5).foreach { j =>
              val n = s"thriftspec_race_${i}_${j % 2}"
              GraftSql.register(n, root)
              if (j % 2 == 1) GraftSql.unregister(n)
            })
          }
          val cycler = new Thread(() => (0 until 6).foreach { _ =>
            GraftSql.disarmBiMirror()
            Thread.sleep(5)
            GraftSql.syncBiCatalog(spark)
            ()
          })
          (churn :+ cycler).foreach(_.start())
          (churn :+ cycler).foreach(_.join(60000))
          // quiesced: the registry holds each thread's *_0 name (kept)
          // and no *_1 names (dropped); one reconcile pins discovery
          GraftSql.syncBiCatalog(spark)
          val rsR = md.getTables(null, "graft_bi", "thriftspec_race%", null)
          var raced = List.empty[String]
          while (rsR.next()) raced ::= rsR.getString("TABLE_NAME")
          val want2 = (0 until 4).map(i => s"thriftspec_race_${i}_0").toSet
          assert(raced.toSet === want2,
            s"post-reconcile discovery diverged: ${raced.sorted} vs $want2")
          want2.foreach(GraftSql.unregister)
        }
      } finally conn.close()
    } finally {
      // the standing mirror must not ride along into unrelated suites
      // sharing this JVM's session
      GraftSql.disarmBiMirror()
      server.stop()
    }
  }
}
