package graft

import graft.ingest.{DedupMode, Ingest}
import graft.schema.SchemaReflector

/** Dev-only phase profiler for the ingest path (not part of the driver
  * contract; remove or ignore in review). */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // comma-separated phase selector: q51,q31,q47,ingest (default: all)
    val phases = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "q51,q31,q47,ingest")
      .split(",").map(_.trim).toSet
    val spark = GraftSession.fromEnv("graft-profile")
    Tables.load(spark, dir, "region").count() // warm

    val out = java.nio.file.Files.createTempDirectory("graft_prof_").toString
    // q47 bisect: where does the embedding near-dup pipeline spend time?
    if (phases("q47")) {
      import org.apache.spark.sql.functions._
      def t(label: String)(f: => Any): Unit = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        println(f"[profile] q47 $label%-36s wall ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      val base = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val copies = base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 100000).as("vec_id"),
          expr("transform(v, x -> x * 1.01d)").as("v"))
      val e = base.unionByName(copies)
      t("load+count")(e.count())
      t("hyperplaneSig")(e.withColumn("bucket",
        graft.ops.Similarity.hyperplaneSig("v", 8, 64)).groupBy("bucket").count().count())
      (1 to 3).foreach { rep =>
        t(s"full cosineNearDupPairs rep $rep")(graft.ops.Similarity.cosineNearDupPairs(
          e, "vec_id", "v", threshold = 0.9999, bits = 8, dim = 64,
          maxBucketSize = Int.MaxValue).count())
      }
    }
    // q51 shape: concurrent all-table ingest + audit
    if (phases("q51")) {
      val names = Tables.names
      val tables = names.map { name =>
        (SchemaReflector.fromParquet(spark, s"$dir/$name.parquet", name),
          Tables.load(spark, dir, name))
      }
      (1 to 8).foreach { round =>
        val o = graft.GraftTmp.dir(s"prof_q51_$round")
        time(s"q51 ingestAll round $round") {
          Ingest.ingestAll(spark, tables, o, DedupMode.NoDedup, parallelism = 4)
        }
        val lm = spark.listenerManager
        val f = lm.getClass.getDeclaredMethods.find(_.getName.contains("listListeners"))
        f.foreach { m =>
          m.setAccessible(true)
          println(s"[profile] exec listeners after round $round: " +
            m.invoke(lm).asInstanceOf[Array[_]].length)
        }
      }
      graft.GraftTmp.purge()
    }
    // q31 bisect: where does the minhash pipeline spend CPU?
    if (phases("q31")) {
      import org.apache.spark.sql.functions._
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
      }
      spark.sparkContext.addSparkListener(listener)
      def t(label: String)(f: => Any): Unit = {
        spark.catalog.clearCache()
        // listener-bus delivery is async (and the bus is private[spark]):
        // a short settle keeps one phase's tail CPU from being credited
        // to the next — good enough for a dev bisect
        def drained(): Long = { Thread.sleep(300); taskMs.get() }
        val c0 = drained(); val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[profile] q31 $label%-36s wall $wall%6.2f s  task ${(drained() - c0) / 1e3}%6.2f s")
      }
      val (base, copies) = graft.queries.LlmData.nearDupFixture(spark, dir)
      val ad = base.unionByName(copies)
      t("tokenize+count")(ad.count())
      t("shingleHashes")(ad.withColumn("hs",
        graft.functions.columns.shingleHashes(col("tok"), 3, mod32 = true))
        .select(sum(size(col("hs")))).collect())
      t("sig (hashes+minhash)")(ad.withColumn("hs",
        graft.functions.columns.shingleHashes(col("tok"), 3, mod32 = true))
        .withColumn("sig", graft.functions.columns.minhashSig(
          col("hs"), 8, graft.ops.TextHash.minhashP, graft.ops.TextHash.minhashABase, graft.ops.TextHash.minhashBBase))
        .select(sum(size(col("sig")))).collect())
      t("bands explode")(ad.withColumn("hs",
        graft.functions.columns.shingleHashes(col("tok"), 3, mod32 = true))
        .withColumn("sig", graft.functions.columns.minhashSig(
          col("hs"), 8, graft.ops.TextHash.minhashP, graft.ops.TextHash.minhashABase, graft.ops.TextHash.minhashBBase))
        .select(col("id"), explode(graft.ops.TextHash.lshBands("sig", 4, 2)).as("b"))
        .count())
      t("full candidates")(graft.ops.Dedup.minhashCandidatesFromTokens(
        ad, 3, 8, 4, maxBucketSize = Int.MaxValue).count())
      t("full candidates (2nd)")(graft.ops.Dedup.minhashCandidatesFromTokens(
        ad, 3, 8, 4, maxBucketSize = Int.MaxValue).count())
    }

    (if (phases("ingest")) Seq("lineitem", "events") else Seq.empty[String]).foreach { n =>
      val meta = SchemaReflector.fromParquet(spark, s"$dir/$n.parquet", n)
      val src = Tables.load(spark, dir, n)
      println(s"[profile] $n partitions=${src.rdd.getNumPartitions}")
      time(s"$n raw count") { src.count() }
      val cleaned = graft.clean.TableCleaner.clean(src, meta)
      time(s"$n clean+count") { cleaned.count() }
      time(s"$n clean+write") {
        cleaned.write.mode("overwrite").parquet(s"$out/${n}_cw")
      }
      time(s"$n write-only") {
        src.write.mode("overwrite").parquet(s"$out/${n}_w")
      }
      time(s"$n sortWithin+write") {
        val sortKey = meta.sortingKey.filter(src.columns.contains)
        cleaned.sortWithinPartitions(sortKey.map(org.apache.spark.sql.functions.col): _*)
          .write.mode("overwrite").parquet(s"$out/${n}_sw")
      }
      time(s"$n full ingestTable") {
        Ingest.ingestTable(spark, src, meta, out, DedupMode.NoDedup)
      }
      // bisect: clean only one type family at a time
      import org.apache.spark.sql.types._
      def familyClean(pred: DataType => Boolean, label: String): Unit = {
        val actual = src.schema.fields.map(f => f.name -> f.dataType).toMap
        val byName = meta.columns.map(c => c.name -> c).toMap
        val picked = src.select(src.columns.toIndexedSeq.map { cn =>
          if (pred(actual(cn)) && byName.contains(cn))
            graft.clean.TableCleaner.cleanColumn(
              org.apache.spark.sql.functions.col(cn), byName(cn), actual(cn)).as(cn)
          else org.apache.spark.sql.functions.col(cn)
        }: _*)
        time(s"$n clean[$label]+write") {
          picked.write.mode("overwrite").parquet(s"$out/${n}_$label")
        }
      }
      familyClean(_ == StringType, "str")
      familyClean(t => t == DateType || t == TimestampType || t == TimestampNTZType, "date")
      familyClean(t => t.isInstanceOf[NumericType], "num")
      if (n == "lineitem") {
        println("=== codegen stats of full clean ===")
        import org.apache.spark.sql.execution.debug._
        val codegen = cleaned.queryExecution.debug.codegenToSeq()
        codegen.foreach { case (subtree, code, _) =>
          println(s"--- subtree (code ${code.length} chars): " + subtree.linesIterator.next())
        }
      }
    }
    spark.stop()
  }
}
