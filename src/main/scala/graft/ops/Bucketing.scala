package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins (brief: "use bucketing for
  * co-located joins"). Writing both sides of a hot join bucketed+sorted on
  * the join key lets sort-merge join run with ZERO exchanges — at 100 TB
  * that turns the dominant shuffle of repeated fact-to-fact joins into a
  * local merge per bucket. Requires a catalog table (bucket metadata lives
  * in the catalog, not the files).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted catalog table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, keyCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket key —
    * shuffle-free when bucket counts match. The merge hint keeps the
    * planner on sort-merge (broadcast would hide the co-location). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keyCols: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), keyCols, joinType)
}
