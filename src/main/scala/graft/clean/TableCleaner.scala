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

  /** Clean one column according to its reflected source type + constraints. */
  def cleanColumn(c: Column, meta: ColumnMeta): Column = {
    import CleanRules._
    val t = meta.sourceType.toLowerCase
    val base: Column =
      if (t.startsWith("date") || t.startsWith("timestamp")) {
        // D1-D3: arrives as string from the raw read (zero-date survival);
        // typed arrivals pass through the same guards.
        nullifyOutsideSupportedRange(
          nullifyOutOfRangeYears(cleanDateStringOrTyped(c)))
      } else if (t == "time") {
        timeToHms(c.cast("string"))
      } else if (t.startsWith("tinyint") && t.contains("(1)") || t == "bool" || t == "boolean") {
        // try_cast: ANSI mode (Spark 4 default) makes plain cast THROW on
        // junk strings — cleaning must coerce, never fail (errors='coerce')
        c.try_cast("boolean")
      } else if (Seq("tinyint", "smallint", "int", "integer", "mediumint", "bigint").exists(t.startsWith)) {
        val cleaned = cleanInteger(c, required = meta.isPk || !meta.nullable)
        if (t.startsWith("bigint")) cleaned
        else int32RangeGuard(cleaned).cast("int")
      } else if (Seq("float", "real", "double").exists(t.startsWith)) {
        nanInfToNull(c.try_cast("double"))
      } else if (t.startsWith("decimal") || t.startsWith("numeric")) {
        c // DecimalType is exact; no string hack needed (SURVEY §1.2 N5)
      } else if (t.startsWith("binary") || t.startsWith("varbinary") || t.endsWith("blob")) {
        c
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
    df.select(df.columns.toIndexedSeq.map { name =>
      byName.get(name) match {
        case Some(cm) => cleanColumn(col(name), cm).as(name)
        case None => col(name)
      }
    }: _*)
  }
}
