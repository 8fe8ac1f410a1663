package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Logical conflict reconciliation for replace-family commits
  * (`ManifestCommit.commitReconciled`): a commit described as a delta
  * against the generation its writer READ rebases onto generations
  * committed concurrently when the two provably commute — a disjoint
  * append no longer forces the whole MERGE/OPTIMIZE to re-run, while
  * every irreconcilable interleave (read-set rewritten, DV repointed,
  * possibly-overlapping concurrent dir, schema change) still aborts
  * with ConcurrentCommitException. The end-to-end tests drive REAL
  * concurrency deterministically: the in-flight operation's source
  * evaluation blocks on a latch, the interleaved commit lands, then the
  * operation resumes and must reconcile. */
class ConflictRebaseSpec extends SparkSpec {

  private val st = StructType(Seq(
    StructField("id", LongType, false),
    StructField("v", StringType, true)))

  /** One data dir of consecutive ids [lo, hi], committed stats on id. */
  private def writeDir(root: String, lo: Long, hi: Long): (String, Seq[ManifestCommit.ColStats]) = {
    val d = ManifestCommit.newDataDir(root)
    mkDf(st, (lo to hi).map(i => Row(i, s"v$i")): _*).write.parquet(d)
    d -> ManifestCommit.dirStats(spark, d, Seq("id"))
  }

  private def freshRoot(): String =
    Files.createTempDirectory("rebase_spec_").toString + "/t"

  /** Two-range table [1..100], [101..200] at generation 1. */
  private def rangedTable(): String = {
    val root = freshRoot()
    val d1 = writeDir(root, 1, 100)
    val d2 = writeDir(root, 101, 200)
    ManifestCommit.commitReplace(spark, root, Seq(d1._1, d2._1),
      pruneDisplaced = false, stats = Map(d1, d2))
    root
  }

  private def ids(root: String): Set[Long] =
    ManifestCommit.read(spark, root).select("id").collect().map(_.getLong(0)).toSet

  test("commitReconciled grafts a disjoint concurrent append into the rebased generation") {
    val root = rangedTable()
    val base = ManifestCommit.readManifest(spark, root).get
    // concurrent append lands after our writer read `base`
    val (capp, cstats) = writeDir(root, 301, 400)
    ManifestCommit.commitAppend(spark, root, capp, stats = cstats)
    // stale-base commit: displace dir#1, add a replacement
    val (repl, rstats) = writeDir(root, 1, 50)
    val m = ManifestCommit.commitReconciled(spark, root, base,
      displaced = Seq(base.dirs.head),
      added = Seq(repl), addedStats = Map(repl -> rstats),
      op = "merge", pinned = Set(base.dirs.head),
      disjoint = (_, stats) => stats.find(_.col == "id")
        .exists(cs => !cs.overlaps(Some("1"), Some("100"))))
    assert(m.gen === base.gen + 2)
    // rebased live set: kept dir2, concurrent append, our replacement
    assert(ids(root) === ((51L to 100L) ++ (101L to 200L) ++ (301L to 400L) ++ (1L to 50L)).toSet -- (51L to 100L))
    // kept + concurrent stats carried, ours installed
    val names = m.dirs.toSet
    assert(names.contains(new org.apache.hadoop.fs.Path(capp).getName))
    assert(m.stats.keySet === names)
  }

  test("commitReconciled aborts when a pinned dir was rewritten or its DV repointed") {
    val root = rangedTable()
    val base = ManifestCommit.readManifest(spark, root).get
    // concurrent commit displaces dir#1 (rewrites it)
    val (rw, rwStats) = writeDir(root, 1, 100)
    ManifestCommit.commitReconciled(spark, root, base,
      displaced = Seq(base.dirs.head), added = Seq(rw),
      addedStats = Map(rw -> rwStats), op = "merge",
      pinned = Set(base.dirs.head))
    val (mine, myStats) = writeDir(root, 1, 10)
    intercept[ManifestCommit.ConcurrentCommitException] {
      ManifestCommit.commitReconciled(spark, root, base,
        displaced = Seq(base.dirs.head), added = Seq(mine),
        addedStats = Map(mine -> myStats), op = "merge",
        pinned = Set(base.dirs.head))
    }

    // DV repoint on a pinned dir is the same irreconcilable interleave
    val root2 = rangedTable()
    val base2 = ManifestCommit.readManifest(spark, root2).get
    val dvName = "_dv_test0000000001"
    mkDf(StructType(Seq(StructField("id", LongType, false))), Row(5L))
      .coalesce(1).write.parquet(s"$root2/$dvName")
    ManifestCommit.commitReconciled(spark, root2, base2,
      displaced = Nil, added = Nil,
      dvUpdates = Map(base2.dirs.head -> dvName), op = "delete",
      pinned = Set(base2.dirs.head))
    val (mine2, myStats2) = writeDir(root2, 1, 10)
    intercept[ManifestCommit.ConcurrentCommitException] {
      ManifestCommit.commitReconciled(spark, root2, base2,
        displaced = Seq(base2.dirs.head), added = Seq(mine2),
        addedStats = Map(mine2 -> myStats2), op = "merge",
        pinned = Set(base2.dirs.head))
    }
  }

  test("commitReconciled aborts on a possibly-overlapping concurrent dir or schema change") {
    val root = rangedTable()
    val base = ManifestCommit.readManifest(spark, root).get
    // concurrent append whose range DOES overlap the in-flight predicate
    val (capp, cstats) = writeDir(root, 90, 110)
    ManifestCommit.commitAppend(spark, root, capp, stats = cstats)
    val (mine, myStats) = writeDir(root, 1, 10)
    intercept[ManifestCommit.ConcurrentCommitException] {
      ManifestCommit.commitReconciled(spark, root, base,
        displaced = Seq(base.dirs.head), added = Seq(mine),
        addedStats = Map(mine -> myStats), op = "merge",
        pinned = Set(base.dirs.head),
        disjoint = (_, stats) => stats.find(_.col == "id")
          .exists(cs => !cs.overlaps(Some("1"), Some("100"))))
    }

    // concurrent SCHEMA change can never be reconciled blindly
    val root2 = rangedTable()
    val base2 = ManifestCommit.readManifest(spark, root2).get
    ManifestCommit.commitReplace(spark, root2, base2.dirs.map(d => s"$root2/$d"),
      pruneDisplaced = false, stats = base2.stats,
      schema = Some(StructType(st.fields.map(_.copy(nullable = true)))))
    val (mine2, myStats2) = writeDir(root2, 1, 10)
    intercept[ManifestCommit.ConcurrentCommitException] {
      ManifestCommit.commitReconciled(spark, root2, base2,
        displaced = Nil, added = Seq(mine2),
        addedStats = Map(mine2 -> myStats2), op = "append",
        pinned = Set.empty)
    }
  }

  /** Gate a frame's evaluation: first task entry opens `entered`, then
    * every task waits for `proceed`. Lets the test interleave a commit
    * INSIDE another operation's read-compute-commit window, on one
    * partition so the blocked task holds a single core. The latches live
    * in a STATIC registry (local-mode tasks share this JVM) because the
    * task closure must not capture them — CountDownLatch is not
    * serializable. */
  private def gated(df: org.apache.spark.sql.DataFrame,
      entered: CountDownLatch, proceed: CountDownLatch): org.apache.spark.sql.DataFrame = {
    val key = java.util.UUID.randomUUID().toString
    ConflictRebaseSpec.gates.put(key, (entered, proceed))
    df.repartition(1).filter { (_: Row) =>
      val (e, p) = ConflictRebaseSpec.gates.get(key)
      e.countDown()
      assert(p.await(60, TimeUnit.SECONDS), "gate timed out")
      true
    }
  }

  test("concurrent disjoint append + MERGE both land with no caller retry, result equals serial") {
    val root = rangedTable()
    val entered = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    // the merge's source: updates inside dir#2's range, gated so the merge
    // blocks mid-flight (after it read the manifest) until the append lands
    val src = gated(
      mkDf(st, (150L to 160L).map(i => Row(i, "upd")): _*), entered, proceed)
    @volatile var res: MergeInto.MergeResult = null
    val t = new Thread(() => {
      res = MergeInto.merge(spark, root, src, Seq("id"))
    })
    t.start()
    assert(entered.await(60, TimeUnit.SECONDS), "merge never started evaluating")
    // interleaved commit: append a dir disjoint from the source's range
    val (capp, cstats) = writeDir(root, 301, 400)
    ManifestCommit.commitAppend(spark, root, capp, stats = cstats)
    proceed.countDown()
    t.join(120000)
    assert(res != null, "merge did not complete")
    assert(res.updated === 11L && res.dirsRewritten === 1)
    // serial-equivalent state: both commits visible, updates applied,
    // appended rows alive
    val live = ManifestCommit.read(spark, root)
    assert(live.filter(col("v") === "upd").count() === 11L)
    assert(ids(root) === ((1L to 200L) ++ (301L to 400L)).toSet)
    val m = ManifestCommit.readManifest(spark, root).get
    assert(m.dirs.contains(new org.apache.hadoop.fs.Path(capp).getName),
      "concurrent append's dir must survive the merge commit")
  }

  test("two overlapping concurrent MERGEs: one lands, the other aborts cleanly") {
    val root = rangedTable()
    val entered = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    val srcA = gated(
      mkDf(st, (10L to 20L).map(i => Row(i, "A")): _*), entered, proceed)
    @volatile var failure: Throwable = null
    val t = new Thread(() => {
      try MergeInto.merge(spark, root, srcA, Seq("id"))
      catch { case e: Throwable => failure = e }
    })
    t.start()
    assert(entered.await(60, TimeUnit.SECONDS))
    // merge B rewrites the SAME dir and commits first
    val resB = MergeInto.merge(spark, root,
      mkDf(st, (30L to 40L).map(i => Row(i, "B")): _*), Seq("id"))
    assert(resB.updated === 11L)
    proceed.countDown()
    t.join(120000)
    assert(failure != null, "merge A should have aborted — its read set was rewritten")
    assert(failure.isInstanceOf[ManifestCommit.ConcurrentCommitException], s"got $failure")
    // table state is exactly merge B's serial result; A left no trace
    val live = ManifestCommit.read(spark, root)
    assert(live.filter(col("v") === "B").count() === 11L)
    assert(live.filter(col("v") === "A").count() === 0L)
    assert(ids(root) === (1L to 200L).toSet)
    // and a caller-level retry of A now succeeds against the new generation
    val resA = MergeInto.merge(spark, root,
      mkDf(st, (10L to 20L).map(i => Row(i, "A")): _*), Seq("id"))
    assert(resA.updated === 11L)
    assert(ManifestCommit.read(spark, root).filter(col("v") === "A").count() === 11L)
  }

  test("deleteWhere rebases over a concurrent append proven free of the deleted keys") {
    val root = rangedTable()
    val entered = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    val keys = gated(mkDf(StructType(Seq(StructField("id", LongType, false))),
      (150L to 170L).map(Row(_)): _*), entered, proceed)
    @volatile var res: MergeInto.DeleteResult = null
    val t = new Thread(() => { res = MergeInto.deleteWhere(spark, root, keys) })
    t.start()
    assert(entered.await(60, TimeUnit.SECONDS))
    val (capp, cstats) = writeDir(root, 301, 400)
    ManifestCommit.commitAppend(spark, root, capp, stats = cstats)
    proceed.countDown()
    t.join(120000)
    assert(res != null && res.deleted === 21L && res.dvsWritten === 1)
    assert(ids(root) === ((1L to 200L).toSet -- (150L to 170L)) ++ (301L to 400L))
  }

  test("merge retries=1: both overlapping merges land with no caller-visible failure, staged dir reclaimed") {
    val root = rangedTable()
    val entered = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    val srcA = gated(
      mkDf(st, (10L to 20L).map(i => Row(i, "A")): _*), entered, proceed)
    @volatile var resA: MergeInto.MergeResult = null
    val t = new Thread(() => {
      resA = MergeInto.merge(spark, root, srcA, Seq("id"), retries = 1)
    })
    t.start()
    assert(entered.await(60, TimeUnit.SECONDS))
    // merge B rewrites the SAME dir and commits first — A's first attempt
    // must abort, its internal retry re-runs against B's generation
    MergeInto.merge(spark, root,
      mkDf(st, (30L to 40L).map(i => Row(i, "B")): _*), Seq("id"))
    proceed.countDown()
    t.join(120000)
    assert(resA != null, "merge A should have landed via its internal retry")
    assert(resA.updated === 11L)
    val live = ManifestCommit.read(spark, root)
    assert(live.filter(col("v") === "A").count() === 11L)
    assert(live.filter(col("v") === "B").count() === 11L)
    assert(ids(root) === (1L to 200L).toSet)
    // the aborted attempt's staged dir was reclaimed eagerly, not left
    // for pruneOrphans' freshness window
    assert(ManifestCommit.pruneOrphans(spark, root, minAgeMs = 0L).isEmpty,
      "conflict cleanup should leave no orphan staged dirs")
  }

  test("replaceWhere rebases over a concurrent append provably OUTSIDE the predicate") {
    val root = rangedTable() // ids 1..100, 101..200
    val entered = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    // replacement rows gated: replaceWhere blocks after its manifest
    // read + witness, before the insert write
    val src = gated(
      mkDf(st, (50L to 59L).map(i => Row(i, "rw")): _*), entered, proceed)
    @volatile var res: MergeInto.RowOpResult = null
    val t = new Thread(() => {
      res = MergeInto.replaceWhere(spark, root, src,
        col("id") >= 1 && col("id") <= 100)
    })
    t.start()
    assert(entered.await(60, TimeUnit.SECONDS), "replaceWhere never started")
    // concurrent append outside [1,100]: stats prove disjoint → rebase
    val (capp, cstats) = writeDir(root, 301, 400)
    ManifestCommit.commitAppend(spark, root, capp, stats = cstats)
    proceed.countDown()
    t.join(120000)
    assert(res != null, "replaceWhere did not complete")
    assert(ids(root) === ((50L to 59L) ++ (101L to 200L) ++ (301L to 400L)).toSet)
    val m = ManifestCommit.readManifest(spark, root).get
    assert(m.dirs.contains(new org.apache.hadoop.fs.Path(capp).getName),
      "concurrent append's dir must survive the replace_where commit")
  }

  test("replaceWhere aborts on a concurrent append possibly INSIDE the predicate") {
    val root = rangedTable()
    val entered = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    val src = gated(
      mkDf(st, (50L to 59L).map(i => Row(i, "rw")): _*), entered, proceed)
    @volatile var failed: Throwable = null
    val t = new Thread(() => {
      try MergeInto.replaceWhere(spark, root, src,
        col("id") >= 1 && col("id") <= 100)
      catch { case e: Throwable => failed = e }
    })
    t.start()
    assert(entered.await(60, TimeUnit.SECONDS), "replaceWhere never started")
    // concurrent append INSIDE the replaced range: our commit would
    // silently delete or double the appended rows — must abort
    val (capp, cstats) = writeDir(root, 60, 80)
    ManifestCommit.commitAppend(spark, root, capp, stats = cstats)
    proceed.countDown()
    t.join(120000)
    assert(failed != null &&
      failed.isInstanceOf[ManifestCommit.ConcurrentCommitException],
      s"expected ConcurrentCommitException, got $failed")
    // the append survives untouched; the replace left no trace (ids
    // 60..80 now legitimately appear twice — 200 + 21 live rows)
    assert(ids(root) === (1L to 200L).toSet)
    assert(ManifestCommit.read(spark, root).count() === 221L)
    assert(ManifestCommit.read(spark, root)
      .filter(col("v") === "rw").count() === 0L)
  }

  test("compactStates never loses a concurrently-appended state part (lost-update fix)") {
    import IncrementalAgg.Measure
    val root = freshRoot()
    val measures = Seq(Measure("n", "*", "count"), Measure("s", "x", "sum_long"))
    val batch = mkDf(StructType(Seq(
      StructField("g", LongType, false), StructField("x", LongType, false))),
      (1L to 20L).map(i => Row(i % 4, i)): _*)
    IncrementalAgg.appendBatch(spark, root, batch, Seq("g"), measures)
    // racing appenders vs. interleaved compactions: every append must
    // survive (graft), so the final totals are exact whatever interleave
    // the scheduler produced
    val appends = 12
    val threads = (1 to 3).map { _ =>
      new Thread(() => (1 to appends / 3).foreach { _ =>
        IncrementalAgg.appendBatch(spark, root, batch, Seq("g"), measures)
      })
    }
    threads.foreach(_.start())
    (1 to 3).foreach { _ =>
      IncrementalAgg.compactStates(spark, root, Seq("g"), measures)
    }
    threads.foreach(_.join(120000))
    IncrementalAgg.compactStates(spark, root, Seq("g"), measures)
    val out = IncrementalAgg.finalizeState(spark, root, Seq("g"), measures)
      .agg(sum("n"), sum("s")).collect()(0)
    val loads = (1 + appends).toLong
    assert(out.getLong(0) === 20L * loads)
    assert(out.getLong(1) === (1L to 20L).sum * loads)
    assert(ManifestCommit.readManifest(spark, root).get.dirs.size === 1)
  }
}

object ConflictRebaseSpec {
  /** Static gate registry — see [[ConflictRebaseSpec.gated]]. */
  val gates = new java.util.concurrent.ConcurrentHashMap[
    String, (CountDownLatch, CountDownLatch)]()
}
