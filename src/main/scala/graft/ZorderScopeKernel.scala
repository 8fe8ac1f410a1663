package graft

import org.apache.spark.sql.functions._

/** Measurement kernel for predicate-scoped Z-ORDER (round 17): a
  * sliced table (~80 month dirs at sf0.1) re-clusters ONE hot month via
  * `Optimize.zorderWhere` vs the whole-table `zorderCompactN`. Reports
  * min-of-3 wall seconds and ROWS REWRITTEN — derived from the
  * manifest's exact per-dir `__rows` stats over the displaced dirs
  * (listener-based row accounting was abandoned: the listener bus
  * flushes seconds late under these job bursts and mis-attributed the
  * fixture build to the measured phase). The rows are the 100-TB
  * story: the scoped rewrite's cost follows the hot partition while
  * the whole-table form grows with the table; at sf0.1 the wall is
  * dominated by fixed per-job costs, which is exactly why the ROWS
  * ratio is the reported scaling evidence. Each rep rebuilds the table
  * so both variants always rewrite the same un-clustered input.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.ZorderScopeKernel"`.
  */
object ZorderScopeKernel {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv("graft-zscope-kernel")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import graft.ingest.{ManifestCommit, Optimize}

    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .cache()
    orders.count()

    def build(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft_zsk_")
        .toString + "/t"
      val dirs = ManifestCommit.writeSliced(spark, root, orders,
        expr("date_format(o_orderdate, 'yyyyMM')"),
        Seq("o_orderdate", "o_custkey", "o_orderkey",
          ManifestCommit.RowCountStat))
      ManifestCommit.commitReplace(spark, root, dirs.map(_._1),
        pruneDisplaced = false, stats = dirs.toMap,
        schema = Some(org.apache.spark.sql.types.StructType(
          orders.schema.fields.map(_.copy(nullable = true)))),
        slice = Some("date_format(o_orderdate, 'yyyyMM')"))
      root
    }

    // hot month = one calendar month of the fixture's ~6.5-year span.
    // Deliberately the DSL cast shape (ltz literal vs the fixture's ntz
    // column): scoping through it exercises whereScope's cast-unwrap
    // normalization — before round 17's fix this shape silently widened
    // to a whole-table rewrite (this kernel caught it).
    val hot = col("o_orderdate") >= lit("1996-03-01").cast("timestamp") &&
      col("o_orderdate") <= lit("1996-03-31 23:59:59").cast("timestamp")

    def rowsOf(m: ManifestCommit.Manifest, ds: Seq[String]): Long =
      ds.flatMap(d => m.stats.getOrElse(d, Nil)
        .find(_.col == ManifestCommit.RowCountStat).map(_.min.toLong)).sum

    def run(mode: String): (Double, Long, Int) = {
      def once(): (Double, Long, Int) = {
        val root = build()
        val before = ManifestCommit.readManifest(spark, root).get
        val t0 = System.nanoTime()
        val after = mode match {
          case "whole" => Optimize.zorderCompactN(spark, root,
            Seq("o_custkey", "o_orderkey"), targetDirs = before.dirs.size)
          case "scoped" => Optimize.zorderWhere(spark, root, hot,
            Seq("o_custkey", "o_orderkey"))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val displaced = before.dirs.filterNot(after.dirs.toSet)
        (sec, rowsOf(before, displaced), displaced.size)
      }
      val reps = (1 to 3).map(_ => once())
      (reps.map(_._1).min, reps.head._2, reps.head._3)
    }

    run("scoped") // JIT/codegen warm-up
    val results = Seq("whole", "scoped").map(m => m -> run(m))
    val (baseS, baseR, _) = results.head._2
    results.foreach { case (m, (s, r, d)) =>
      println(f"[zscope-kernel] sf=$sfDir variant=$m%-6s min3=$s%.3f s " +
        f"(${s / baseS}%.2fx)  rowsRewritten=$r%d " +
        f"(${r.toDouble / baseR}%.4fx, $d%d dirs)")
    }

    // ---- rank-bucketed vs linear z-keys on a Zipf dimension (r18) ----
    // 90% of rows carry head values 0..8, 10% scatter to ~1e9 (the hot-
    // account / hot-domain shape). Linear min/max scaling maps the whole
    // head onto ONE z-slot, so the head packs into a few fat dirs and a
    // head-value probe scans ~90% of the table; rank bucketing
    // (Delta's range_partition_id idea) spends ~90% of the slots on the
    // head and the same probe scans a sliver.
    val zipf = orders.select(
      when(col("o_orderkey") % 10 < 9, col("o_orderkey") % 9)
        .otherwise(pmod(hash(col("o_orderkey")).cast("long"),
          lit(1000000000L)) + 10).cast("long").as("k"),
      pmod(col("o_custkey"), lit(8)).cast("long").as("y"),
      col("o_totalprice")).cache()
    val zn = zipf.count()
    def buildZ(): String = {
      val root = java.nio.file.Files.createTempDirectory("graft_zrk_")
        .toString + "/t"
      val d = ingest.ManifestCommit.newDataDir(root)
      zipf.write.parquet(d)
      ingest.ManifestCommit.commitReplace(spark, root, Seq(d),
        pruneDisplaced = false,
        stats = Map(d -> ingest.ManifestCommit.dirStats(spark, d,
          Seq("k", "y", ingest.ManifestCommit.RowCountStat))),
        schema = Some(org.apache.spark.sql.types.StructType(
          zipf.schema.fields.map(_.copy(nullable = true)))))
      root
    }
    def probeZ(root: String): (Long, Int, Int) = {
      val (df, kept, total) = Optimize.readPrunedMulti(spark, root,
        Seq(("k", Some("4"), Some("4"))))
      (df.count(), kept, total)
    }
    Seq("linear" -> 0, "rank" -> 256).foreach { case (label, rb) =>
      def once(): (Double, (Long, Int, Int)) = {
        val root = buildZ()
        val t0 = System.nanoTime()
        Optimize.zorderCompactN(spark, root, Seq("k", "y"),
          targetDirs = 64, rankBuckets = rb)
        ((System.nanoTime() - t0) / 1e9, probeZ(root))
      }
      val reps = (1 to 3).map(_ => once())
      val (sec, (rows, kept, total)) = (reps.map(_._1).min, reps.head._2)
      println(f"[zrank-kernel] sf=$sfDir variant=$label%-6s min3=$sec%.3f s " +
        f"headProbeRows=$rows%d (${rows.toDouble / zn}%.4f of $zn%d)  " +
        f"dirsKept=$kept%d/$total%d")
    }
    spark.stop()
  }
}
