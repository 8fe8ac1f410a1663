package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * here; `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * correctness gate (omitted only for ops that aren't SQL-expressible, which
  * get a rows-only check).
  */
object SparkEntry {

  /** All query groups; grows as modules land. */
  private def allQ: Seq[Q] =
    Relational.all ++ Cleaning.all ++ LlmData.all ++ Pipeline.all ++
      Profiling.all ++ Curation.all ++ SqlGates.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship BI shape: GROUP BY date ORDER BY date DESC
    * LIMIT (superset_bootstrap/test_sql_lab.py:144). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02_orders_by_date.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
