package graft.sources

import graft.schema.SchemaReflector
import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Source connectors (SURVEY.md §2.1).
  *
  * S1 — JDBC chunked scan: the reference reads `SELECT *` in 50k-row
  * pandas chunks (tools/ingest_runner.py:1474-1523); the Spark equivalent
  * is a partitioned JDBC read — `numPartitions` parallel range scans on
  * `partitionColumn` with `fetchsize` bounding per-round-trip memory.
  * Exercised LIVE against embedded Apache Derby (the JDBC engine that
  * ships inside /opt/spark/jars) in JdbcLiveSpec — discovery,
  * reflection, the partitioned scan, and the full ingest pipeline all
  * run against a real endpoint; `parquetTable` remains the
  * fixture-backed stand-in for the oracle gates.
  */
final case class JdbcSource(
    url: String,
    table: String,
    user: String = "",
    password: String = "",
    fetchSize: Int = 50000, // chunksize, multi_database_ingest.py:137
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Int = 8) {

  /** The reader options, visible for tests (pure). */
  def options: Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "fetchsize" -> fetchSize.toString)
    partitionColumn match {
      case Some(c) =>
        base ++ Map(
          "partitionColumn" -> c,
          "lowerBound" -> lowerBound.getOrElse(0L).toString,
          "upperBound" -> upperBound.getOrElse(Long.MaxValue).toString,
          "numPartitions" -> numPartitions.toString)
      case None => base
    }
  }

  def reader(spark: SparkSession): DataFrameReader =
    spark.read.format("jdbc").options(options)

  def load(spark: SparkSession): DataFrame = reader(spark).load()
}

object Sources {

  /** S1 fixture-backed scan (same contract as JdbcSource.load). */
  def parquetTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.Tables.load(spark, sfDir, name)

  /** S2 — discovery over a directory of parquet tables (the sandbox
    * analogue of information_schema.tables), with the reference's
    * include/exclude semantics applied. */
  def discoverParquetTables(spark: SparkSession, dir: String,
      include: Set[String] = Set.empty,
      exclude: Set[String] = Set.empty): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
    SchemaReflector.filterTables(names.map(n => s"main.$n"), include, exclude)
      .map(_.stripPrefix("main."))
  }

  /** S2 — LIVE table discovery over a JDBC catalog (DatabaseMetaData
    * getTables, the driver-portable information_schema.tables —
    * tools/gen_pipeline.py:29-56), with the reference's include/exclude
    * + system-schema semantics applied to the "schema.table" names.
    * type filter = TABLE, so engine system tables (Derby's SYSTEM TABLE
    * type, MySQL's information_schema) never surface. Exercised against
    * a live embedded Derby in JdbcLiveSpec. */
  def discoverJdbcTables(url: String, include: Set[String] = Set.empty,
      exclude: Set[String] = Set.empty): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) {
        // MySQL Connector/J reports the database in TABLE_CAT with
        // TABLE_SCHEM null (catalog-per-database model); Derby/Postgres
        // use TABLE_SCHEM. Fall back so names never become "null.t".
        val container = Option(rs.getString("TABLE_SCHEM"))
          .getOrElse(rs.getString("TABLE_CAT"))
        names += s"$container.${rs.getString("TABLE_NAME")}"
      }
      SchemaReflector.filterTables(names.toSeq.sorted, include, exclude)
    } finally conn.close()
  }

  /** S5 — Kafka topic-pattern stream (tools/kafka_to_clickhouse.py:118-187
    * subscribes to `{prefix}*`): the standard Structured-Streaming source
    * with the raw value surfaced as a string `value` column, matching the
    * CdcStream contract. Requires the spark-sql-kafka package at runtime.
    * An embedded-broker integration test was investigated (round 6): no
    * spark-sql-kafka / kafka-clients artifact exists in /opt/spark/jars
    * or the offline coursier/ivy caches and the sandbox has no egress,
    * so it cannot resolve; the file `text` source keeps the same `value`
    * contract under test (CdcStreamSpec, q44), and this builder is the
    * only thing that changes in deployment. */
  def kafkaStream(spark: SparkSession, brokers: String, topicPattern: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribePattern", topicPattern)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")
}
