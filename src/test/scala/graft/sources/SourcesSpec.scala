package graft.sources

import graft.SparkSpec
import graft.streaming.CdcEnvelope
import org.apache.spark.sql.types._

/** Source connectors: JDBC reader construction (S1), parquet-dir
  * discovery (S2), and first-message schema inference (M2).
  */
class SourcesSpec extends SparkSpec {

  test("S1: partitioned JDBC reader options (fetchsize=50k chunk analogue)") {
    val src = JdbcSource("jdbc:mysql://db:3306/app", "app.orders",
      user = "u", password = "p",
      partitionColumn = Some("id"), lowerBound = Some(1L),
      upperBound = Some(1000000L), numPartitions = 16)
    val o = src.options
    assert(o("fetchsize") === "50000")
    assert(o("partitionColumn") === "id")
    assert(o("numPartitions") === "16")
    assert(o("lowerBound") === "1" && o("upperBound") === "1000000")
    // unpartitioned read omits the range options entirely
    val plain = JdbcSource("jdbc:mysql://db/app", "t").options
    assert(!plain.contains("partitionColumn"))
  }

  test("S2: parquet table discovery honors include/exclude") {
    val all = Sources.discoverParquetTables(spark, "/root/testdata/sf0.001")
    assert(all.contains("orders") && all.contains("lineitem") && all.size === 10)
    assert(Sources.discoverParquetTables(spark, "/root/testdata/sf0.001",
      include = Set("orders")) === Seq("orders"))
    assert(!Sources.discoverParquetTables(spark, "/root/testdata/sf0.001",
      exclude = Set("orders")).contains("orders"))
  }

  test("M2: after-schema inferred from sample envelope messages") {
    val samples = Seq(
      """{"before":null,"after":{"id":1,"nombre":"a","tamano":2.5},"op":"c","ts_ms":1}""",
      """{"before":{"id":1},"after":null,"op":"d","ts_ms":2}""")
    val st = CdcEnvelope.inferAfterSchema(spark, samples)
    assert(st.fieldNames.toSet === Set("id", "nombre", "tamano"))
    assert(st("id").dataType === LongType)
    assert(st("tamano").dataType === DoubleType)
  }
}
