package graft.clean

import graft.SparkSpec
import graft.schema.{ColumnMeta, TableMeta}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Whole-table cleaning pass driven by reflected metadata
  * (FIXTURES.md §6 dirty fixture; ingest_runner.py:1366-1413).
  */
class TableCleanerSpec extends SparkSpec {

  private val meta = TableMeta("dirty", Seq(
    ColumnMeta("id", "int", nullable = false, isPk = true),
    ColumnMeta("fk_ref", "int"),
    ColumnMeta("descripcion", "varchar(100)"),
    ColumnMeta("obligatorio", "varchar(10)", nullable = false),
    ColumnMeta("creado_en", "datetime"),
    ColumnMeta("hora", "time"),
    ColumnMeta("activo", "tinyint(1)")))

  private val schema = StructType(Seq(
    StructField("id", StringType, true),
    StructField("fk_ref", StringType, true),
    StructField("descripcion", StringType, true),
    StructField("obligatorio", StringType, true),
    StructField("creado_en", StringType, true),
    StructField("hora", StringType, true),
    StructField("activo", StringType, true),
    StructField("untouched", StringType, true)))

  test("clean applies per-type rules, PK defaults, and passes unlisted columns through") {
    val df = mkDf(schema,
      Row("1", "8.0", "  Actualizaci??n \n ya ", "x", "2020-05-15", "0 days 12:02:03", "true", "raw "),
      Row(null, "abc", "", null, "0000-00-00", "oops", "false", null))
    val out = TableCleaner.clean(df, meta).collect()

    val r0 = out(0)
    assert(r0.getAs[Long]("id") === 1L)
    assert(r0.getAs[Long]("fk_ref") === 8L)
    assert(r0.getAs[String]("descripcion") === "Actualización ya")
    assert(r0.getAs[String]("obligatorio") === "x")
    assert(r0.getAs[java.sql.Timestamp]("creado_en").toString.startsWith("2020-05-15"))
    assert(r0.getAs[String]("hora") === "12:02:03")
    assert(r0.getAs[Boolean]("activo") === true)
    assert(r0.getAs[String]("untouched") === "raw ") // untouched = no trim

    val r1 = out(1)
    assert(r1.getAs[Long]("id") === 0L)          // PK int NULL -> 0
    assert(r1.get(r1.fieldIndex("fk_ref")) == null)
    assert(r1.get(r1.fieldIndex("descripcion")) == null) // control-only -> NULL
    assert(r1.getAs[String]("obligatorio") === "N/A")    // NOT NULL default
    assert(r1.get(r1.fieldIndex("creado_en")) == null)   // zero-date -> NULL
    assert(r1.get(r1.fieldIndex("hora")) == null)
    assert(r1.getAs[Boolean]("activo") === false)
  }

  test("cleaning is a single narrow projection (no shuffle in the plan)") {
    val df = mkDf(schema, Row("1", "2", "a", "b", "2020-01-01", "12:00:00", "true", "x"))
    val plan = TableCleaner.clean(df, meta).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cleaning must not shuffle:\n$plan")
  }
}
