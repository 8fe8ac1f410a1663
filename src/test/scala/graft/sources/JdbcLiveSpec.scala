package graft.sources

import graft.SparkSpec
import graft.ingest.{DedupMode, Ingest}
import graft.schema.SchemaReflector
import org.apache.spark.sql.functions._

/** S1/S2/S3 against a LIVE database: embedded Apache Derby — the one
  * JDBC engine that ships inside /opt/spark/jars, so the real driver
  * path runs offline. Discovery (getTables), reflection
  * (getColumns/getPrimaryKeys), the partitioned chunked scan, and the
  * full reflect→read→clean→dedup→write→audit pipeline all execute
  * against a real JDBC endpoint here; a MySQL deployment differs only
  * by url + driver jar. (Rounds 1-6 could only unit-test reader
  * construction; this closes the "live DB absent" caveat for S1-S3.)
  */
class JdbcLiveSpec extends SparkSpec {

  // DISK-backed scratch db, not `memory:`: booting Derby's in-memory
  // storage factory first poisons the Thrift server's own temporary
  // metastore (Spark builds it on `jdbc:derby:memory:;databaseName=…`,
  // which then fails with XBM0J once another memory db exists) — the
  // ThriftEndpointSpec getTables call dies JVM-wide. /dev/shm keeps the
  // speed of the memory db without registering the memory subprotocol.
  private val url = {
    val base = java.nio.file.Paths.get("/dev/shm")
    val dir =
      if (java.nio.file.Files.isDirectory(base))
        java.nio.file.Files.createTempDirectory(base, "graft_derby_")
      else java.nio.file.Files.createTempDirectory("graft_derby_")
    s"jdbc:derby:$dir/graftdb;create=true"
  }

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** One-time DB seed: quoted lowercase identifiers so the MySQL-style
    * names the rest of the pipeline expects survive Derby's
    * uppercase-by-default folding. */
  private lazy val seeded: Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    withConn { c =>
      val st = c.createStatement()
      st.execute("""CREATE TABLE "clientes" (
        |  "id" BIGINT NOT NULL PRIMARY KEY,
        |  "v" VARCHAR(32),
        |  "factualizacion" TIMESTAMP)""".stripMargin.replace("\n", " "))
      val ps = c.prepareStatement("""INSERT INTO "clientes" VALUES (?, ?, ?)""")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setString(2, if (i % 10 == 0) null else s"  v$i  ") // cleanable
        ps.setTimestamp(3,
          java.sql.Timestamp.valueOf(f"2021-01-01 00:00:${i % 60}%02d"))
        ps.addBatch()
      }
      ps.executeBatch()
      st.execute("""CREATE TABLE "audit_log" (
        |  "id" INTEGER NOT NULL PRIMARY KEY, "note" VARCHAR(16))""".stripMargin.replace("\n", " "))
      ()
    }
  }

  test("S2 live: JDBC catalog discovery with include/exclude semantics") {
    seeded
    val all = Sources.discoverJdbcTables(url)
    assert(all === Seq("APP.audit_log", "APP.clientes"),
      "user tables only — Derby SYSTEM TABLEs must not surface")
    assert(Sources.discoverJdbcTables(url, exclude = Set("audit_log")) ===
      Seq("APP.clientes"))
    assert(Sources.discoverJdbcTables(url, include = Set("clientes")) ===
      Seq("APP.clientes"))
  }

  test("S3 live: column/PK/nullability reflection matches the DDL") {
    seeded
    val meta = SchemaReflector.fromJdbc(url, "APP", "clientes")
    assert(meta.pkColumns === Seq("id"))
    assert(meta.versionColumn === Some("factualizacion"))
    val st = SchemaReflector.toStructType(meta)
    assert(st("id").dataType === org.apache.spark.sql.types.LongType)
    assert(!st("id").nullable)
    assert(st("v").dataType === org.apache.spark.sql.types.StringType)
    assert(st("v").nullable)
    assert(st("factualizacion").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("S1 live: partitioned chunked scan splits the key range") {
    seeded
    val src = JdbcSource(url, """APP."clientes"""",
      partitionColumn = Some("\"id\""), lowerBound = Some(1L),
      upperBound = Some(101L), numPartitions = 4)
    val df = src.load(spark)
    assert(df.rdd.getNumPartitions === 4, "4 parallel range scans")
    assert(df.count() === 100)
    assert(df.agg(countDistinct(col("id"))).collect().head.getLong(0) === 100,
      "range predicates must partition, not duplicate or drop")
  }

  test("full live pipeline: reflect -> read -> clean -> dedup -> write -> audit") {
    seeded
    val out = java.nio.file.Files.createTempDirectory("jdbc_live_").toString
    val meta = SchemaReflector.fromJdbc(url, "APP", "clientes")
    val src = JdbcSource(url, """APP."clientes"""").load(spark)
    val res = Ingest.ingestTable(spark, src, meta, out, DedupMode.Staging)
    assert(res.sourceRows === 100 && res.writtenRows === 100)
    val tgt = graft.ingest.ManifestCommit.read(spark, s"$out/clientes")
    // cleaning ran: whitespace trimmed, nulls preserved
    val v3 = tgt.filter(col("id") === 3L).collect().head.getAs[String]("v")
    assert(v3 === "v3")
    val audit = Ingest.audit(spark, Seq(("clientes", src, tgt))).collect().head
    assert(audit.getAs[Long]("diff") === 0L && audit.getAs[Int]("ok") === 1)
  }
}
