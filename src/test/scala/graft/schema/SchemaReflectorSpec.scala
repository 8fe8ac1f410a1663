package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema reflection + discovery filters (SURVEY.md §1.2, §2.1 S2/S3/P4). */
class SchemaReflectorSpec extends AnyFunSuite {
  import SchemaReflector._

  test("type map: MySQL-ish names -> Spark types (unified §1.2 table)") {
    assert(toSparkType("tinyint(1)") === BooleanType)
    assert(toSparkType("tinyint") === ByteType)
    assert(toSparkType("smallint") === ShortType)
    assert(toSparkType("int") === IntegerType)
    assert(toSparkType("bigint") === LongType)
    assert(toSparkType("float") === FloatType)
    assert(toSparkType("double") === DoubleType)
    assert(toSparkType("decimal(12,4)") === DecimalType(12, 4))
    assert(toSparkType("decimal") === DecimalType(18, 6))
    assert(toSparkType("date") === DateType)
    assert(toSparkType("datetime") === TimestampType)
    assert(toSparkType("time") === StringType)
    assert(toSparkType("json") === StringType)
    assert(toSparkType("blob") === BinaryType)
    assert(toSparkType("varchar(255)") === StringType)
    assert(toSparkType("weirdtype") === StringType)
  }

  test("effectiveNullable: nullable AND not PK (ingest_runner.py:1206-1214)") {
    assert(ColumnMeta("a", nullable = true, isPk = false).effectiveNullable)
    assert(!ColumnMeta("a", nullable = true, isPk = true).effectiveNullable)
    assert(!ColumnMeta("a", nullable = false, isPk = false).effectiveNullable)
  }

  test("version-column autodetect priority (ingest_runner.py:1395-1401)") {
    val t = TableMeta("t", Seq(ColumnMeta("updated_at"), ColumnMeta("factualizacion")))
    assert(t.versionColumn === Some("factualizacion"))
    val t2 = TableMeta("t", Seq(ColumnMeta("x"), ColumnMeta("updated_at")))
    assert(t2.versionColumn === Some("updated_at"))
    assert(TableMeta("t", Seq(ColumnMeta("x"))).versionColumn === None)
  }

  test("sorting key: PK first, else first non-nullable (ingest_runner.py:1243-1253)") {
    val withPk = TableMeta("t", Seq(ColumnMeta("a"), ColumnMeta("id", isPk = true)))
    assert(withPk.sortingKey === Seq("id"))
    val noPk = TableMeta("t", Seq(ColumnMeta("a"), ColumnMeta("b", nullable = false)))
    assert(noPk.sortingKey === Seq("b"))
    assert(TableMeta("t", Seq(ColumnMeta("a"))).sortingKey === Nil)
  }

  test("toStructType carries PK metadata and effective nullability") {
    val st = toStructType(TableMeta("t", Seq(
      ColumnMeta("id", "int", nullable = true, isPk = true),
      ColumnMeta("name", "varchar(10)", nullable = true))))
    assert(st.fields(0).dataType === IntegerType)
    assert(!st.fields(0).nullable)
    assert(st.fields(0).metadata.getBoolean("pk"))
    assert(st.fields(1).nullable)
  }

  test("S2/P4: system schemas excluded; include/exclude by full or bare name (gen_pipeline.py:29-56)") {
    val tables = Seq("mysql.user", "app.orders", "app.tmp", "crm.orders")
    assert(filterTables(tables) === Seq("app.orders", "app.tmp", "crm.orders"))
    assert(filterTables(tables, allowSystemSchemas = true).contains("mysql.user"))
    assert(filterTables(tables, include = Set("orders")) === Seq("app.orders", "crm.orders"))
    assert(filterTables(tables, include = Set("app.orders")) === Seq("app.orders"))
    assert(filterTables(tables, exclude = Set("tmp")) === Seq("app.orders", "crm.orders"))
  }
}
