package graft.clean

import graft.schema.{ColumnMeta, TableMeta}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-metadata-driven whole-table cleaner: the distributed equivalent
  * of the reference's per-chunk pandas pipeline `coerce_datetime_columns →
  * process_mysql_date_columns → normalize_for_clickhouse`
  * (tools/ingest_runner.py:1366-1413), with PK/nullability metadata
  * deciding NULL-vs-default semantics (tools/ingest_runner.py:598-655).
  *
  * Every rule is a Column expression (CleanRules), so the whole pass is a
  * single narrow projection: no shuffle, fully codegen'd, scales linearly
  * with input size.
  */
object TableCleaner {

  /** Clean one column according to its reflected source type + constraints.
    * `actual` is the column's arrival type: already-typed timestamps skip
    * the 5-format string parse (a large per-row cost at scale) and go
    * straight to the range guards. */
  def cleanColumn(c: Column, meta: ColumnMeta,
      actual: DataType = StringType): Column = {
    import CleanRules._
    val t = meta.sourceType.toLowerCase
    val base: Column =
      if (t.startsWith("date") || t.startsWith("timestamp")) {
        // D1-D3: strings go through zero-date NULLing + multi-format
        // parse; typed arrivals only need the guards.
        val parsed = actual match {
          case TimestampType | TimestampNTZType | DateType => c.cast("timestamp")
          case _ => cleanDateStringOrTyped(c)
        }
        nullifyOutsideSupportedRange(nullifyOutOfRangeYears(parsed))
      } else if (t == "time") {
        timeToHms(c.cast("string"))
      } else if (t.startsWith("tinyint") && t.contains("(1)") || t == "bool" || t == "boolean") {
        // try_cast: ANSI mode (Spark 4 default) makes plain cast THROW on
        // junk strings — cleaning must coerce, never fail (errors='coerce')
        c.try_cast("boolean")
      } else if (Seq("tinyint", "smallint", "int", "integer", "mediumint", "bigint").exists(t.startsWith)) {
        // typed integer arrivals skip the string round-trip entirely —
        // N1's parsing exists for dirty STRING input, not for columns the
        // source already delivers as integers
        val required = meta.isPk || !meta.nullable
        val cleaned = actual match {
          case LongType | IntegerType | ShortType | ByteType =>
            val base = c.cast("bigint")
            if (required) coalesce(base, lit(0L)) else base
          case _ => cleanInteger(c, required)
        }
        if (t.startsWith("bigint")) cleaned
        else int32RangeGuard(cleaned).cast("int")
      } else if (Seq("float", "real", "double").exists(t.startsWith)) {
        nanInfToNull(c.try_cast("double"))
      } else if (t.startsWith("decimal") || t.startsWith("numeric")) {
        c // DecimalType is exact; no string hack needed (SURVEY §1.2 N5)
      } else if (t.startsWith("binary") || t.startsWith("varbinary") || t.endsWith("blob")) {
        c
      } else if (t == "array" || t == "map" || t == "struct") {
        c // composite columns pass through untouched
      } else {
        // char/varchar/text/enum/set/json: T1-T4 pipeline
        val cleaned = cleanString(c.cast("string"))
        if (meta.isPk) pkStringDefault(cleaned, meta.name)
        else if (!meta.nullable) notNullStringDefault(cleaned)
        else cleaned
      }
    base
  }

  /** Typed timestamps skip the string parse; strings go through D1+D6. */
  private def cleanDateStringOrTyped(c: Column): Column =
    CleanRules.parseMultiFormat(CleanRules.nullifyZeroDates(c.cast("string")))

  /** Apply the full cleaning pass to every column named in `meta`;
    * unlisted columns pass through untouched. */
  def clean(df: DataFrame, meta: TableMeta): DataFrame = {
    val byName = meta.columns.map(c => c.name -> c).toMap
    val actualTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(df.columns.toIndexedSeq.map { name =>
      byName.get(name) match {
        case Some(cm) => cleanColumn(col(name), cm, actualTypes(name)).as(name)
        case None => col(name)
      }
    }: _*)
  }
}
