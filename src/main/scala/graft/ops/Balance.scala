package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for per-row-CPU operators (hashing, vector
  * math): a small/single-file source arrives as 1-2 partitions and would
  * serialize all compute on one core. No-op when the input is already
  * partitioned at cluster scale.
  */
object Balance {
  def apply(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, par / 2)) df.repartition(par)
    else df
  }
}
