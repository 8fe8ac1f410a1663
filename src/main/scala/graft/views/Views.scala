package graft.views

import graft.clean.CleanRules
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytics-view generator (tools/generate_analytics_views.py:83-171):
  * pass all columns through and add a `<col>_date` helper for every
  * date-ish column, per the D7 rules —
  *   - TimestampType  -> to_date(c)
  *   - DateType       -> c (passthrough copy)
  *   - StringType whose NAME matches the fecha regex -> best-effort ISO
  *     parse, else DD-MM-YYYY, else NULL
  * then register as `{db}_analytics__{table}_v`.
  *
  * Pure projection — views add zero execution cost until queried, and
  * Catalyst prunes unused helper columns from the scan.
  */
object Views {

  private val fechaRe = CleanRules.fechaNameRegex.r

  /** Columns that get a helper, with the helper expression. */
  def dateHelperFor(field: StructField): Option[org.apache.spark.sql.Column] =
    field.dataType match {
      // NTZ included: parquet timestamp WITHOUT timezone (the fixtures'
      // and most warehouses' physical type) arrives as TimestampNTZType,
      // which a TimestampType-only match silently skips
      case TimestampType | TimestampNTZType => Some(to_date(col(field.name)))
      case DateType => Some(col(field.name))
      case StringType if fechaRe.findFirstIn(field.name).isDefined =>
        Some(CleanRules.stringDateHelper(col(field.name)))
      case _ => None
    }

  /** All original columns + `<col>_date` helpers. */
  def withDateHelpers(df: DataFrame): DataFrame = {
    val helpers = df.schema.fields.toSeq.flatMap { field =>
      dateHelperFor(field).map(_.as(s"${field.name}_date"))
    }
    df.select(df.columns.map(col).toIndexedSeq ++ helpers: _*)
  }

  /** M7 — idempotent CREATE OR REPLACE VIEW in the session catalog.
    * Temp-view names cannot contain dots, so `{db}_analytics.{table}_v`
    * becomes `{db}_analytics__{table}_v`. */
  def registerAnalyticsView(spark: SparkSession, df: DataFrame,
      db: String, table: String): String = {
    val name = s"${db}_analytics__${table}_v"
    withDateHelpers(df).createOrReplaceTempView(name)
    name
  }

  /** The whole-database sweep (generate_analytics_views.py main loop):
    * one `*_v` analytics view per table DISCOVERED in the parquet
    * directory (S2 discovery, like the reference enumerating
    * information_schema — not a hardcoded list: extra tables are swept,
    * missing ones simply absent). Returns the registered view names. */
  def registerAll(spark: SparkSession, dir: String,
      db: String = "graft"): Seq[String] =
    graft.sources.Sources.discoverParquetTables(spark, dir).map { n =>
      registerAnalyticsView(spark, graft.Tables.load(spark, dir, n), db, n)
    }
}
