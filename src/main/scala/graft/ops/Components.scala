package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over candidate-pair edges — the step AFTER LSH
  * candidate generation in a dedup pipeline: pairs (from
  * `Dedup.minhashCandidates` / `Similarity.cosineNearDupPairs`, both of
  * which guarantee hot-bucket connectivity via star pairs) become
  * duplicate CLUSTERS, from which one representative per cluster is kept.
  *
  * Algorithm: iterative min-label propagation with pointer jumping —
  * each round every node takes the min of (its label, its neighbors'
  * labels, its label's label). Plain propagation needs diameter rounds;
  * the pointer-jump (label-of-label) halves remaining chain length per
  * round, so convergence is O(log diameter) — dup clusters (stars/
  * cliques + short chains) converge in 2-4 rounds. Each round is two
  * hash joins + an aggregate; `localCheckpoint` cuts the growing lineage
  * so round N's plan doesn't replay rounds 1..N-1.
  */
object Components {

  /** @param edges columns (src, dst), undirected semantics
    * @return (id, cluster) where cluster = min id reachable */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    // Track each round's checkpoint RDD DIRECTLY from the dataset's plan
    // (a LogicalRDD after localCheckpoint). Diffing the SparkContext-global
    // persistent-RDD registry instead would race concurrent jobs on the
    // same session and could unpersist THEIR blocks — fatal for a
    // lineage-truncated localCheckpoint, whose blocks are the only copy.
    def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
        case _ => None // unexpected plan shape: leak to GC rather than guess
      }
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var prevRoundRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // min label among neighbors
      val nbr = und
        .join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("nlbl").as("nbrMin"))
      // pointer jump: my label's current label
      val jump = labels
        .join(labels.select(col("id").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"), "left")
      val next = jump
        .join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbrMin"), col("lbl")),
            coalesce(col("lbl2"), col("lbl"))).as("newLbl"),
          col("lbl"))
      // localCheckpoint is REQUIRED here, not an optimization: the
      // pointer-jump join references `labels` twice, so without plan
      // truncation the logical plan doubles per round and Catalyst
      // analysis goes exponential (a persist() caches data but not the
      // plan — measured: the 200-node chain test burned an hour of CPU
      // in the analyzer). Eager, so the round is materialized before we
      // free the round-before-last's blocks below.
      // the convergence metric rides the checkpoint's materialization job
      // via observe() — no separate aggregate job per round
      val obs = new org.apache.spark.sql.Observation()
      val stepped = next
        .select(col("id"), col("newLbl").as("lbl"),
          (col("newLbl") =!= col("lbl")).cast("long").as("__chg"))
        .observe(obs, coalesce(sum("__chg"), lit(0L)).as("chg"))
        .localCheckpoint(true)
      changed = obs.get("chg").asInstanceOf[Long]
      // free the blocks of the round before last (localCheckpoint pins
      // its RDD until GC otherwise — one full label-table copy per round)
      prevRoundRdd.foreach(_.unpersist(blocking = false))
      prevRoundRdd = checkpointRdd(stepped)
      labels = stepped.select("id", "lbl")
      i += 1
    }
    labels
  }
}
