package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Column-profiling / sketch surface: the data-profiling sweep a BI admin
  * or training-data pipeline runs before modelling (the reference's
  * profiling probes are A4/A5/A7, debug_serialization.py:48-91 +
  * data_cleaner_robust.py:460 nunique; these add the distribution/sketch
  * depth Spark gives for free — exact percentiles and HLL distinct counts).
  */
object Profiling {

  /** q57 — distribution + sketch profile of lineitem.
    *
    * Percentiles are the exact interpolated form (identical rank formula
    * index = p*(n-1) in Spark `percentile` and DuckDB `quantile_cont`);
    * computed over an integral-valued column so the interpolation
    * arithmetic is reproducible bit-for-bit, rounded defensively anyway.
    * The HLL sketch (approx_count_distinct, default rsd 5%) cannot
    * hash-match an oracle, so the gate checks the CONTRACT: the relative
    * error vs the exact distinct count stays inside the 5% bound — the
    * oracle asserts the same invariant trivially (TRUE), making any
    * out-of-bound sketch a hash mismatch. At 100 TB the sketch is the
    * only viable distinct count (exact COUNT DISTINCT shuffles every key;
    * HLL is a fixed few-KB state mergeable map-side). */
  val q57_sketch_profile = Q(
    "q57_sketch_profile",
    """SELECT round(quantile_cont(cast(l_quantity AS double), 0.5), 6) AS p50_qty,
      |  round(quantile_cont(cast(l_quantity AS double), 0.95), 6) AS p95_qty,
      |  round(quantile_cont(cast(l_quantity AS double), 0.99), 6) AS p99_qty,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  TRUE AS hll_within_5pct,
      |  TRUE AS gk_sketch_ok
      |FROM lineitem""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .agg(
        round(expr("percentile(cast(l_quantity as double), 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(cast(l_quantity as double), 0.95)"), 6).as("p95_qty"),
        round(expr("percentile(cast(l_quantity as double), 0.99)"), 6).as("p99_qty"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey")).as("hll"),
        // the 100 TB quantile path: GK sketch, fixed memory, mergeable
        // map-side — exact percentile (above) buffers every value per
        // group and is only the small-SF oracle anchor
        expr("approx_percentile(cast(l_quantity as double), 0.95, 10000)").as("gk95"))
      .select(col("p50_qty"), col("p95_qty"), col("p99_qty"), col("exact_orders"),
        (abs(col("hll") - col("exact_orders")).cast("double") /
          col("exact_orders") <= 0.05).as("hll_within_5pct"),
        // rank error ≤ n/accuracy ⇒ on 1..50 integral quantities the
        // value error is ≤ 1 unless the sketch is broken
        (abs(col("gk95") - col("p95_qty")) <= 1.0).as("gk_sketch_ok"))
  }

  /** q58 — GROUPING SETS (the explicit multi-grain form beyond q18's
    * rollup): per-status, per-priority, and grand-total grains of the
    * orders table in ONE pass (Spark plans a single Expand + hash
    * aggregate — no re-scan per grain). Labels via coalesce so the
    * all-grain rows are portable (no engine-specific grouping-id
    * encoding in the output). */
  val q58_grouping_sets = Q(
    "q58_grouping_sets",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n,
      |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) { (s, dir) =>
    val view = s"orders_q58_${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    Tables.load(s, dir, "orders").createOrReplaceTempView(view)
    s.sql(
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS n,
         |  cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
         |FROM $view
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** q59 — set operations (INTERSECT / EXCEPT): conversion-funnel cohort
    * counts over events. Not in the reference's surface (SURVEY §2.6 "no
    * INTERSECT/EXCEPT"), free from Dataset.intersect/except — Catalyst
    * plans both as a distinct + left-semi/anti hash join, one shuffle
    * each on user_id. */
  val q59_set_ops = Q(
    "q59_set_ops",
    """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |     p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |SELECT
      |  (SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p)) AS n_converted,
      |  (SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p)) AS n_click_only""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click").select("user_id").distinct()
    val purchases = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
    val converted = clicks.intersect(purchases).agg(count(lit(1)).as("n_converted"))
    val clickOnly = clicks.except(purchases).agg(count(lit(1)).as("n_click_only"))
    converted.crossJoin(clickOnly)
  }

  /** q60 — duplicate-cluster resolution (connected components over
    * candidate-pair edges — the step after LSH candidate generation;
    * ops.Components pointer-jumping min-label propagation). Edges are a
    * deterministic chain fixture over documents (consecutive doc_ids
    * within blocks of 5), so the expected fixpoint is arithmetically
    * checkable by the oracle while the Spark side genuinely iterates:
    * chains force multi-round propagation, blocks of 5 converge in
    * ~3 pointer-jump rounds. Output: docs per cluster + its
    * representative (the dedup "keep one per cluster" decision). */
  val q60_dup_clusters = Q(
    "q60_dup_clusters",
    """SELECT cast(doc_id - doc_id % 5 AS bigint) AS cluster,
      |  count(*) AS n_docs,
      |  cast(min(doc_id) AS bigint) AS keep_id
      |FROM documents
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").select("doc_id")
    // chain edges inside each 5-block: (d, d+1) unless d ends the block;
    // block ends/gaps fall out via the inner join on existing doc_ids
    val e = docs.select(col("doc_id").as("src"),
        (col("doc_id") + 1).as("dst"))
      .filter(col("src") % 5 =!= 4)
      .join(docs.select(col("doc_id").as("dst")), Seq("dst"))
    val clusters = graft.ops.Components.connectedComponents(e)
    // singletons (no edges) are their own cluster
    val labeled = docs
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster"))
    labeled.groupBy("cluster")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
  }

  val all: Seq[Q] = Seq(
    q57_sketch_profile, q58_grouping_sets, q59_set_ops, q60_dup_clusters)
}
