package graft.ingest

import graft.SparkSpec
import graft.ingest.IncrementalAgg.Measure
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Incremental aggregate maintenance: the merge algebra must make
  * batch boundaries invisible — N appendBatch calls followed by
  * finalizeState must equal one aggregate over the concatenated raw
  * batches, for ANY split, and compaction must be a pure part-count
  * optimization (results identical before/after, one live part after).
  */
class IncrementalAggSpec extends SparkSpec {

  private val st = StructType(Seq(
    StructField("k", StringType, true),
    StructField("n", LongType, true),
    StructField("price", DoubleType, true)))

  private val measures = Seq(
    Measure("cnt", "*", "count"),
    Measure("n_sum", "n", "sum_long"),
    Measure("price_sum", "price", "sum_dec"),
    Measure("n_min", "n", "min"),
    Measure("n_max", "n", "max"))

  private def resultMap(root: String): Map[String, (Long, Long, Double, Long, Long)] =
    IncrementalAgg.finalizeState(spark, root, Seq("k"), measures)
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5)))
      }.toMap

  test("batch boundaries are invisible: 3 appends == one full aggregate") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    val batches = Seq(
      Seq(Row("a", 1L, 1.10), Row("a", 5L, 2.20), Row("b", 3L, 0.30)),
      Seq(Row("a", 2L, 4.40), Row("c", 7L, 7.70)),
      Seq(Row("b", 9L, 0.01), Row("a", 4L, 0.02)))
    batches.foreach { rows =>
      IncrementalAgg.appendBatch(spark, root, mkDf(st, rows: _*), Seq("k"), measures)
    }
    assert(ManifestCommit.readManifest(spark, root).get.dirs.size === 3)
    val got = resultMap(root)
    // hand-computed over the concatenation
    assert(got("a") === ((4L, 12L, 7.72, 1L, 5L)))
    assert(got("b") === ((2L, 12L, 0.31, 3L, 9L)))
    assert(got("c") === ((1L, 7L, 7.70, 7L, 7L)))
  }

  test("compaction folds parts to one and changes nothing observable") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    (1 to 4).foreach { i =>
      IncrementalAgg.appendBatch(spark, root,
        mkDf(st, Row("x", i.toLong, i / 100.0), Row("y", -i.toLong, 0.05)),
        Seq("k"), measures)
    }
    val before = resultMap(root)
    IncrementalAgg.compactStates(spark, root, Seq("k"), measures)
    assert(ManifestCommit.readManifest(spark, root).get.dirs.size === 1)
    assert(resultMap(root) === before)
    // and a post-compaction batch merges with the compacted part cleanly
    // (state schema is canonical — the decimal narrowing contract)
    IncrementalAgg.appendBatch(spark, root,
      mkDf(st, Row("x", 100L, 1.00)), Seq("k"), measures)
    val after = resultMap(root)
    assert(after("x") === ((5L, 110L, before("x")._3 + 1.00, 1L, 100L)))
    assert(after("y") === before("y"))
  }

  test("decimal state sums are exact under any merge order") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    // 0.1-style values whose double partial sums would drift by order
    (1 to 10).foreach { _ =>
      IncrementalAgg.appendBatch(spark, root,
        mkDf(st, Seq.fill(7)(Row("k", 1L, 0.10)): _*), Seq("k"), measures)
    }
    IncrementalAgg.compactStates(spark, root, Seq("k"), measures)
    assert(resultMap(root)("k")._3 === 7.00)
  }

  test("all-null measure column stays null through merge, not zero") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    IncrementalAgg.appendBatch(spark, root,
      mkDf(st, Row("z", null, null)), Seq("k"), measures)
    IncrementalAgg.appendBatch(spark, root,
      mkDf(st, Row("z", null, null)), Seq("k"), measures)
    val r = IncrementalAgg.finalizeState(spark, root, Seq("k"), measures).collect()(0)
    assert(r.getLong(1) === 2L, "count counts rows")
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
      "sum/min/max of all-null input must be null")
  }

  // ---- change-feed maintenance (signed deltas) ----

  private val retractable = Seq(
    Measure("cnt", "*", "count"),
    Measure("n_sum", "n", "sum_long"),
    Measure("price_sum", "price", "sum_dec"))

  private val feedSt = StructType(st.fields :+
    StructField(ChangeFeed.ChangeType, StringType, true))

  test("applyChanges retracts exactly: delete, update, group move") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    IncrementalAgg.appendBatch(spark, root, mkDf(st,
      Row("a", 1L, 1.00), Row("a", 2L, 2.00), Row("b", 3L, 3.00),
      Row("b", 4L, 4.00)), Seq("k"), retractable)
    // feed: delete (a,1); update (a,2)->(a,20) in place; move (b,3)->(a,3)
    IncrementalAgg.applyChanges(spark, root, mkDf(feedSt,
      Row("a", 1L, 1.00, "delete"),
      Row("a", 2L, 2.00, "update_preimage"),
      Row("a", 20L, 2.50, "update_postimage"),
      Row("b", 3L, 3.00, "update_preimage"),
      Row("a", 3L, 3.00, "update_postimage")), Seq("k"), retractable)
    val got = IncrementalAgg.finalizeState(spark, root, Seq("k"), retractable,
      dropEmptyGroups = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // a: rows {20, 3} plus... recompute: initial a = {1,2}; delete 1;
    // update 2->20 (price 2.00->2.50); move in (a,3) => {20,3}
    assert(got("a") === ((2L, 23L, 5.50)))
    // b: initial {3,4}; 3 moved out => {4}
    assert(got("b") === ((1L, 4L, 4.00)))
  }

  test("fully-retracted group vanishes with dropEmptyGroups") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    IncrementalAgg.appendBatch(spark, root, mkDf(st,
      Row("a", 1L, 1.00), Row("b", 2L, 2.00)), Seq("k"), retractable)
    IncrementalAgg.applyChanges(spark, root, mkDf(feedSt,
      Row("b", 2L, 2.00, "delete")), Seq("k"), retractable)
    val kept = IncrementalAgg.finalizeState(spark, root, Seq("k"),
      retractable, dropEmptyGroups = true).collect().map(_.getString(0)).toSet
    assert(kept === Set("a"))
    // without the flag, the zero-count tombstone row is visible (the raw
    // state algebra — callers see exactly what the parts merged to)
    val raw = IncrementalAgg.finalizeState(spark, root, Seq("k"),
      retractable).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw("b") === 0L)
  }

  test("min/max measures are rejected for change-feed maintenance") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.applyChanges(spark, root, mkDf(feedSt,
        Row("a", 1L, 1.00, "insert")), Seq("k"), measures) // has min/max
    }
    assert(e.getMessage.contains("not retractable"), e.getMessage)
  }

  test("applyChangesExact maintains min/max under deletes, rescanning only dirty groups") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    // base table state BEFORE changes
    val before = Seq(
      Row("a", 1L, 1.00), Row("a", 5L, 5.00), Row("a", 9L, 9.00),
      Row("b", 3L, 3.00), Row("b", 7L, 7.00),
      Row("c", 4L, 4.00))
    IncrementalAgg.appendBatch(spark, root, mkDf(st, before: _*), Seq("k"), measures)
    // changes: delete a's MINIMUM (1) — min must regress to 5;
    // insert b=2 — b's min improves monotonically, NO rescan needed;
    // c untouched
    val feed = mkDf(feedSt,
      Row("a", 1L, 1.00, "delete"),
      Row("b", 2L, 2.00, "insert"))
    val after = mkDf(st,
      Row("a", 5L, 5.00), Row("a", 9L, 9.00),
      Row("b", 3L, 3.00), Row("b", 7L, 7.00), Row("b", 2L, 2.00),
      Row("c", 4L, 4.00))
    val res = IncrementalAgg.applyChangesExact(spark, root, feed, after,
      Seq("k"), measures)
    // only group a is dirty; only its 2 surviving base rows were rescanned
    assert(res.dirtyGroups === 1L)
    assert(res.baseRowsRescanned === 2L)
    val got = resultMap(root)
    assert(got("a") === ((2L, 14L, 14.00, 5L, 9L)))
    assert(got("b") === ((3L, 12L, 12.00, 2L, 7L)))
    assert(got("c") === ((1L, 4L, 4.00, 4L, 4L)))
    // equivalent to a from-scratch aggregate over the post-change table
    val scratch = Files.createTempDirectory("incagg_spec_").toString + "/t2"
    IncrementalAgg.appendBatch(spark, root = scratch, after, Seq("k"), measures)
    assert(resultMap(scratch) === got)
    // state is one part (the stitch replaces the live set)
    assert(ManifestCommit.readManifest(spark, root).get.dirs.size === 1)

    // an update that REPLACES the max: preimage dirties the group, the
    // rescan finds the new exact max; fully-retracted group vanishes
    val feed2 = mkDf(feedSt,
      Row("a", 9L, 9.00, "update_preimage"),
      Row("a", 6L, 6.00, "update_postimage"),
      Row("c", 4L, 4.00, "delete"))
    val after2 = mkDf(st,
      Row("a", 5L, 5.00), Row("a", 6L, 6.00),
      Row("b", 3L, 3.00), Row("b", 7L, 7.00), Row("b", 2L, 2.00))
    val res2 = IncrementalAgg.applyChangesExact(spark, root, feed2, after2,
      Seq("k"), measures)
    assert(res2.dirtyGroups === 2L && res2.baseRowsRescanned === 2L)
    val fin = IncrementalAgg.finalizeState(spark, root, Seq("k"), measures,
      dropEmptyGroups = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(fin === Map(
      "a" -> ((2L, 11L, 11.00, 5L, 6L)),
      "b" -> ((3L, 12L, 12.00, 2L, 7L))))
  }

  test("null measure values contribute nothing in either direction") {
    val root = Files.createTempDirectory("incagg_spec_").toString + "/t"
    IncrementalAgg.appendBatch(spark, root, mkDf(st,
      Row("a", 1L, 1.00), Row("a", null, null)), Seq("k"), retractable)
    // delete the null-measure row: cnt 2->1, sums unchanged
    IncrementalAgg.applyChanges(spark, root, mkDf(feedSt,
      Row("a", null, null, "delete")), Seq("k"), retractable)
    val r = IncrementalAgg.finalizeState(spark, root, Seq("k"), retractable)
      .collect()(0)
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L && r.getDouble(3) === 1.00)
  }
}
