package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Per-column source metadata, as the reference reflects it from
  * information_schema.columns / DESCRIBE / KEY_COLUMN_USAGE
  * (tools/gen_pipeline.py:58-81; tools/ingest_runner.py:1130-1224,
  * 1420-1471; tools/multi_database_ingest.py:312-360).
  */
case class ColumnMeta(
    name: String,
    sourceType: String = "varchar", // MySQL-ish type name, lowercase
    nullable: Boolean = true,
    isPk: Boolean = false,
    default: Option[String] = None,
    autoIncrement: Boolean = false) {
  /** Effective nullability: nullable AND not part of the PK
    * (tools/ingest_runner.py:1206-1214). */
  def effectiveNullable: Boolean = nullable && !isPk
  /** JSON-schema `required` (tools/gen_pipeline.py:99-102). */
  def required: Boolean = !nullable && default.isEmpty && !autoIncrement
}

case class TableMeta(table: String, columns: Seq[ColumnMeta]) {
  def pkColumns: Seq[String] = columns.filter(_.isPk).map(_.name)
  def apply(name: String): ColumnMeta = columns.find(_.name == name).get
  /** Version-column autodetection for dedup, in the reference's priority
    * order (tools/ingest_runner.py:1395-1401). */
  def versionColumn: Option[String] = {
    val candidates = Seq("factualizacion", "fcreacion", "updated_at", "fecha_actualizacion")
    val names = columns.map(_.name).toSet
    candidates.find(names.contains)
  }
  /** Sorting key: PK if present, else first effectively-non-nullable
    * column, else none (tools/ingest_runner.py:1243-1253,1310-1339 —
    * Nullable columns are filtered out of MergeTree sorting keys). */
  def sortingKey: Seq[String] =
    if (pkColumns.nonEmpty) pkColumns
    else columns.filterNot(_.effectiveNullable).take(1).map(_.name)
}

/** The unified type mapping replacing the reference's three divergent maps
  * (SURVEY.md §1.2): source type name → Spark DataType, with nullability
  * decided by ColumnMeta.effectiveNullable.
  */
object SchemaReflector {

  /** MySQL-ish type name → Spark type (SURVEY.md §1.2 tables a+b unified).
    * decimal keeps exactness via DecimalType (no string hack); date keeps
    * DateType (documented divergence from the reference's DATE→DateTime
    * collapse); time becomes "HH:MM:SS" string (Spark has no TIME type). */
  def toSparkType(sourceType: String): DataType = {
    val t = sourceType.toLowerCase.takeWhile(ch => ch.isLetter)
    val precision = "\\((\\d+)(?:,(\\d+))?\\)".r.findFirstMatchIn(sourceType)
    t match {
      case "tinyint" if sourceType.replace(" ", "").contains("(1)") => BooleanType
      case "bool" | "boolean" => BooleanType
      case "tinyint" => ByteType
      case "smallint" => ShortType
      case "int" | "integer" | "mediumint" => IntegerType
      case "bigint" => LongType
      case "float" | "real" => FloatType
      case "double" => DoubleType
      case "decimal" | "numeric" =>
        precision.map(m => DecimalType(m.group(1).toInt,
            Option(m.group(2)).map(_.toInt).getOrElse(0)))
          .getOrElse(DecimalType(18, 6))
      case "date" => DateType
      case "datetime" | "timestamp" => TimestampType
      case "time" => StringType
      case "json" => StringType // opaque, probed at query time (§1.2)
      case "binary" | "varbinary" | "blob" | "longblob" | "mediumblob" => BinaryType
      case _ => StringType // char/varchar/text/enum/set + fallback
    }
  }

  def toStructType(meta: TableMeta): StructType =
    StructType(meta.columns.map { c =>
      StructField(c.name, toSparkType(c.sourceType), c.effectiveNullable,
        new MetadataBuilder()
          .putBoolean("pk", c.isPk)
          .putString("sourceType", c.sourceType)
          .build())
    })

  /** Reflect metadata back from a parquet file/dir (the sandbox stand-in
    * for JDBC information_schema reflection: same TableMeta shape, so the
    * cleaning and ingest layers are source-agnostic). */
  def fromParquet(spark: SparkSession, path: String, table: String,
      pk: Seq[String] = Nil): TableMeta = {
    val schema = spark.read.parquet(path).schema
    TableMeta(table, schema.fields.toSeq.map { f =>
      ColumnMeta(f.name, sparkTypeName(f.dataType), f.nullable, pk.contains(f.name))
    })
  }

  /** S3 — LIVE column/PK/nullability reflection over a JDBC catalog
    * (DatabaseMetaData getColumns/getPrimaryKeys — the driver-portable
    * form of the information_schema.columns / KEY_COLUMN_USAGE queries
    * the reference issues, tools/ingest_runner.py:1130-1224,1420-1471).
    * Type names flow through the same unified `toSparkType` table as
    * parquet reflection, so cleaning and ingest stay source-agnostic.
    * Exercised against a live embedded Derby in JdbcLiveSpec. */
  def fromJdbc(url: String, schema: String, table: String): TableMeta = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val md = conn.getMetaData
      // Two container models exist in the wild: schema-based (Derby,
      // Postgres — filter via the schemaPattern argument) and
      // catalog-per-database (MySQL Connector/J — the database arrives
      // in TABLE_CAT, schemaPattern matches nothing). Try schema-based
      // first; an empty column set means the container is a catalog, so
      // retry with `schema` as the catalog argument. Same TableMeta
      // either way — callers stay driver-agnostic.
      def reflect(catalog: String, schemaPattern: String): Seq[ColumnMeta] = {
        val pkRs = md.getPrimaryKeys(catalog, schemaPattern, table)
        var pks = Set.empty[String]
        while (pkRs.next()) pks += pkRs.getString("COLUMN_NAME")
        val rs = md.getColumns(catalog, schemaPattern, table, "%")
        val cols = scala.collection.mutable.ArrayBuffer.empty[ColumnMeta]
        while (rs.next()) {
          val name = rs.getString("COLUMN_NAME")
          cols += ColumnMeta(
            name,
            rs.getString("TYPE_NAME").toLowerCase,
            rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
            pks.contains(name),
            Option(rs.getString("COLUMN_DEF")).map(_.trim),
            "YES".equalsIgnoreCase(rs.getString("IS_AUTOINCREMENT")))
        }
        cols.toSeq
      }
      val viaSchema = reflect(null, schema)
      val cols = if (viaSchema.nonEmpty) viaSchema else reflect(schema, null)
      TableMeta(table, cols)
    } finally conn.close()
  }

  private def sparkTypeName(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case DateType => "date"
    case TimestampType => "datetime"
    case TimestampNTZType => "datetime" // parquet isAdjustedToUTC=false
    case BinaryType => "blob"
    // composite types have no MySQL analogue: mark for passthrough so the
    // cleaner never stringifies an array/map/struct column
    case _: ArrayType => "array"
    case _: MapType => "map"
    case _: StructType => "struct"
    case StringType => "varchar"
    case _ => "varchar"
  }

  /** S2/P4 — table discovery filters: system schemas excluded unless
    * allowed, then whitelist/blacklist by `schema.table` or bare name
    * (tools/gen_pipeline.py:29-56; tools/ingest_runner.py:2045-2046,
    * 2179-2188; tools/multi_database_ingest.py:66-82). */
  val systemSchemas: Set[String] =
    Set("mysql", "information_schema", "performance_schema", "sys")

  def filterTables(
      tables: Seq[String], // "schema.table"
      include: Set[String] = Set.empty,
      exclude: Set[String] = Set.empty,
      allowSystemSchemas: Boolean = false): Seq[String] = {
    def bare(t: String) = t.split('.').last
    tables
      .filter(t => allowSystemSchemas || !systemSchemas.contains(t.split('.').head))
      .filter(t => include.isEmpty || include.contains(t) || include.contains(bare(t)))
      .filterNot(t => exclude.contains(t) || exclude.contains(bare(t)))
  }
}
