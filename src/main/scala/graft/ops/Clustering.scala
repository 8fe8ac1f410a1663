package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an `array<double>` embedding column —
  * the coarse-quantizer TRAINER for the IVF index (`Similarity.ivfTopK`
  * consumes the centroids; its scaladoc calls them "in a real index the
  * output of k-means" — this is that trainer).
  *
  * Deterministic by construction (gate-grade, oracle-reproducible):
  *  - init = the k lowest-id vectors (a production run would swap in
  *    k-means||; the init strategy is orthogonal to the iteration plan)
  *  - E-step = argmin over BROADCAST centroids via the native
  *    NearestCentroids kernel — exact IEEE doubles, deterministic cid
  *    tie-break, a NARROW per-row pass (no join, no row explosion; the
  *    same shape as `Similarity.ivfTopK` assignment), and O(1) plan size
  *    in k·dim (the matrix rides a torrent broadcast, not plan literals)
  *  - M-step = per-dimension mean with DECIMAL accumulation: distributed
  *    double summation is order-nondeterministic, decimal sums are exact
  *    and order-free; ONE decimal→double rounding then one double
  *    division, bit-identical in the DuckDB oracle.
  *
  * Scale: each iteration is one narrow argmin projection + one posexplode
  * shuffle keyed (cid, dim) — work linear in corpus × dim. Centroids
  * (k × dim doubles) ride to the driver once per iteration; k is bounded
  * by design (IVF practice: ~sqrt(N), trained on a sample). Clusters that
  * lose every member simply drop out (documented Lloyd behavior; k-means||
  * re-seeding is an init-side concern).
  */
object Clustering {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Nearest-centroid id via the broadcast NearestCentroids kernel — the
    * centroid matrix rides a torrent broadcast (once per executor) and the
    * plan holds only the handle, so plan size is O(1) in k·dim (the old
    * typedLit struct-array argmin grew the plan with every centroid
    * component — a few thousand 1024-dim centroids would blow Catalyst
    * analysis and codegen method limits). Same (distance, cid) argmin
    * tie-break, bit-identical IEEE distances. */
  private def assignCol(bc: org.apache.spark.broadcast.Broadcast[
      graft.functions.CentroidMatrix], v: Column): Column =
    element_at(graft.functions.columns.nearestCentroids(v, bc, keep = 1), 1)

  private def toBroadcast(corpus: DataFrame, cents: Seq[(Long, Seq[Double])]) =
    corpus.sparkSession.sparkContext.broadcast(graft.functions.CentroidMatrix(
      cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))

  /** One E-step: corpus rows tagged with their nearest centroid id. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("cid", assignCol(toBroadcast(corpus, cents), col("v")))

  /** Fit `iters` Lloyd iterations; returns (cid, cv array<double>, n)
    * where n is the cluster size in the FINAL assignment (the E-step the
    * last M-step averaged over). */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters > 0, s"k=$k iters=$iters must be positive")
    // cached: read once per iteration for the E-step plus once for init;
    // unpersisted before returning (the returned frame is a materialized
    // local relation, so nothing references the cache afterwards)
    val e = Balance(corpus)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .cache()
    var cents: Seq[(Long, Seq[Double])] = e.orderBy("id").limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(cents.nonEmpty, "kmeans: corpus is empty — no init centroids")
    if (cents.length < k)
      log.warn(
        s"kmeans: corpus has only ${cents.length} vectors < k=$k; " +
          s"training ${cents.length} clusters")
    var fittedRows: Array[org.apache.spark.sql.Row] = Array.empty
    var fittedSchema: org.apache.spark.sql.types.StructType = null
    (1 to iters).foreach { _ =>
      // per-iteration broadcast of this E-step's centroids; released as
      // soon as the M-step collect below has consumed the assignment
      val bc = toBroadcast(corpus, cents)
      val assigned = e.withColumn("cid", assignCol(bc, col("v")))
      val fitted = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        // exact order-free sum, ONE rounding to double, one division —
        // the arithmetic the oracle replicates verbatim
        .agg((sum(col("x").cast("decimal(25,10)")).cast("double") /
          count(lit(1))).as("m"),
          count(lit(1)).as("__n"))
        .groupBy("cid")
        .agg(
          expr("transform(array_sort(collect_list(struct(dim, m))), s -> s.m)")
            .as("cv"),
          first("__n").as("n"))
      fittedRows = fitted.collect()
      fittedSchema = fitted.schema
      bc.unpersist(blocking = false)
      cents = fittedRows
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    }
    e.unpersist()
    // centroids are ALREADY on the driver (the loop collected them to feed
    // the next E-step) — return them as a materialized local frame instead
    // of the lazy plan, which would re-execute the whole final iteration on
    // every caller action
    corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(fittedRows: _*), fittedSchema)
  }
}
