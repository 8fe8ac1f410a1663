package graft

import graft.ingest.{DedupMode, Ingest}
import graft.ops.{Dedup, Similarity}
import graft.schema.SchemaReflector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scaling experiment: replicate the sf0.1 fixtures N× (ids
  * re-keyed so dedup/join cardinalities scale honestly), run the operator
  * kernels at 1× and N×, and report wall-clock ratios. A kernel whose
  * ratio is ≤ ~N scales linearly on fixed cores; findings recorded in
  * SCALE.md. Usage: SPARK_GRAFT_SCALE_N=8 sbt "runMain graft.ScaleCheck".
  */
object ScaleCheck {

  /** Executor task-time (CPU) per kernel, not wall — this sandbox has
    * episodic external CPU/IO interference that corrupts wall ratios
    * (observed 8x runs "faster" than 1x). Task time is what actually
    * scales with data. */
  private val taskMs = new java.util.concurrent.atomic.AtomicLong

  private var session: SparkSession = _

  def time[A](label: String)(f: => A): Double = {
    // two reps, min task time: robust to interference episodes and to
    // first-rep codegen warm-up. Cache cleared per rep — operators that
    // cache internally would otherwise make rep 2 free (CacheManager
    // dedups identical plans).
    val reps = (1 to 2).map { _ =>
      session.catalog.clearCache()
      val t0 = System.nanoTime()
      val task0 = taskMs.get()
      f
      ((System.nanoTime() - t0) / 1e9, (taskMs.get() - task0) / 1e3)
    }
    val (wall, task) = reps.minBy(_._2)
    println(f"[scale] $label%-42s wall $wall%7.2f s  task $task%8.2f s")
    task
  }

  /** N copies with disjoint id spaces (offset per replica). */
  def replicate(df: DataFrame, n: Int, idCols: Seq[String], offset: Long): DataFrame =
    (0 until n).map { r =>
      idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(r * offset)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.fromEnv("graft-scale")
    session = spark
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
    })
    Tables.load(spark, sf, "region").count()

    val base = GraftTmp.dir("scalecheck_")

    // materialize 1x and Nx inputs once so kernel timings exclude the
    // replication cost itself
    def mat(name: String, df: DataFrame): String = {
      val p = s"$base/$name"
      df.write.mode("overwrite").parquet(p)
      p
    }
    val docs1 = mat("docs1", Tables.load(spark, sf, "documents"))
    val docsN = mat("docsN", replicate(
      Tables.load(spark, sf, "documents"), n, Seq("doc_id"), 10_000_000L))
    val line1 = mat("line1", Tables.load(spark, sf, "lineitem"))
    val lineN = mat("lineN", replicate(
      Tables.load(spark, sf, "lineitem"), n, Seq("l_orderkey"), 100_000_000L))
    val emb1 = mat("emb1", Tables.load(spark, sf, "embeddings"))
    val embN = mat("embN", replicate(
      Tables.load(spark, sf, "embeddings"), n, Seq("vec_id"), 10_000_000L))
    // media payloads: one deterministic WAV per document id, encoded ONCE
    // here so the decode kernel times the operator, not the fixture
    def toMedia(docsPath: String): DataFrame = {
      import spark.implicits._
      spark.read.parquet(docsPath).select(col("doc_id")).as[Long].map(id =>
        graft.multimodal.MediaRow(id, "audio/wav",
          graft.multimodal.Multimodal.encodeWav(id, 8000, 1, 64 + (id % 64).toInt)))
        .toDF()
    }
    val media1 = mat("media1", toMedia(docs1))
    val mediaN = mat("mediaN", toMedia(docsN))

    // comma-separated kernel-name filter for focused re-measurement
    // (JIT/interference triage): SPARK_GRAFT_KERNELS=bloom_decontam,...
    val kernelFilter = sys.env.get("SPARK_GRAFT_KERNELS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    def kernels(tag: String, docs: String, line: String, emb: String,
        media: String): Map[String, Double] = {
      val d = spark.read.parquet(docs)
      val l = spark.read.parquet(line)
      val e = spark.read.parquet(emb)
      val all = scala.collection.mutable.Map[String, Double]()
      val r = new {
        def update(k: String, v: => Double): Unit =
          if (kernelFilter.forall(_.contains(k))) all(k) = v
      }
      r("ingest_clean_write") = time(s"$tag ingest lineitem (clean+sort+write)") {
        val meta = SchemaReflector.fromParquet(spark, line, "lineitem")
        Ingest.ingestTable(spark, l, meta, s"$base/out_$tag", DedupMode.NoDedup)
      }
      r("exact_dedup") = time(s"$tag exact dedup documents") {
        Dedup.exact(d, "doc_id", "text").count()
      }
      r("media_decode") = time(s"$tag media decode (WAV codec, mapPartitions)") {
        // the multimodal scan shape at 100 TB: decode runs entirely
        // executor-side in partition batches over pre-materialized
        // payloads — the fixture ENCODE is excluded (test scaffolding,
        // not the shipped operator). Fixed 16-way repartition at BOTH
        // scales: the 1x fixture is a single parquet file (1 task on a
        // dedicated core) while 8x runs 8 concurrent tasks, and
        // SMT/core-sharing inflates per-task CPU ~2x — equal concurrency
        // is what makes the task-CPU ratio measure DATA scaling (the
        // same reason the shuffle kernels compare at 32 partitions on
        // both sides).
        import spark.implicits._
        val ds = spark.read.parquet(media)
          .repartition(16).as[graft.multimodal.MediaRow]
        graft.multimodal.Multimodal.decodeAudioFeatures(ds)
          .filter(_.frames > 0).count()
      }
      r("minhash_lsh") = time(s"$tag minhash LSH candidates") {
        Dedup.minhashCandidates(d, "doc_id", "text").count()
      }
      r("simhash") = time(s"$tag simhash fingerprints") {
        Dedup.simhashFingerprints(d, "doc_id", "text").count()
      }
      r("window_dedup") = time(s"$tag W1 latest-version dedup lineitem") {
        Ingest.dedupLatest(l, Seq("l_orderkey"), Some("l_shipdate"), Seq("l_linenumber")).count()
      }
      // ~50% of ALL rows share ONE key (the PK-default-0-after-N1-cleaning
      // shape): the row_number window form funnels every duplicate of the
      // hot key through one task; the max_by aggregate form keeps one row
      // per key per map task (partial agg), so the hot key ships #tasks
      // rows. The pair quantifies the structural gap SCALE.md cites.
      r("hotkey_dedup_agg") = time(s"$tag hot-key latest dedup (max_by aggregate)") {
        val hot = l.withColumn("k",
          when(col("l_orderkey") % 2 === 0, lit(0L)).otherwise(col("l_orderkey")))
        Ingest.dedupLatest(hot, Seq("k"), Some("l_shipdate"),
          Seq("l_orderkey", "l_linenumber")).count()
      }
      r("hotkey_dedup_window") = time(s"$tag hot-key latest dedup (row_number window)") {
        val hot = l.withColumn("k",
          when(col("l_orderkey") % 2 === 0, lit(0L)).otherwise(col("l_orderkey")))
        Ingest.dedupLatestWindow(hot, Seq("k"), Some("l_shipdate"),
          Seq("l_orderkey", "l_linenumber")).count()
      }
      r("ann_lsh") = time(s"$tag ANN LSH (corpus bucket join)") {
        // fixed 5-query set (base replica only): the kernel must scale
        // the CORPUS alone, or the ratio yardstick is corpus x queries
        val q = e.filter(col("vec_id") < 5)
        Similarity.lshTopK(e, q, "vec_id", "embedding", k = 10, bits = 8, dim = 64).count()
      }
      r("ann_ivf") = time(s"$tag ANN IVF (narrow argmin assignment)") {
        // centroids live only in the base replica (vec_id 100..107): a
        // FIXED coarse quantizer while the corpus scales — assignment
        // must stay one narrow pass, linear in corpus size
        val q = e.filter(col("vec_id") < 5)
        val cent = e.filter(col("vec_id").between(100, 107))
        Similarity.ivfTopK(e, q, cent, "vec_id", "embedding",
          k = 10, nprobe = 2).count()
      }
      r("ann_ivf_wide") = time(s"$tag ANN IVF wide quantizer (k=1024 broadcast)") {
        // a realistic coarse-quantizer width: 1024 centroids ride ONE
        // torrent broadcast; assignment stays a narrow codegen'd pass
        // (the old plan-literal form would not even analyze at this k)
        val q = e.filter(col("vec_id") < 5)
        val cent = e.filter(col("vec_id") >= 100 && col("vec_id") < 1124)
        Similarity.ivfTopK(e, q, cent, "vec_id", "embedding",
          k = 10, nprobe = 4).count()
      }
      r("ann_pq") = time(s"$tag ANN PQ (codes-only ADC scoring)") {
        // fixed 16-entry codebooks from the base replica; the corpus
        // scales while encode stays one narrow m-argmin projection and
        // scoring touches codes only — never the original vectors
        val q = e.filter(col("vec_id") < 5)
        val cbs = Similarity.pqCodebooks(
          e.filter(col("vec_id").between(200, 215)), "vec_id", "embedding",
          m = 8, dsub = 8, ks = 16)
        Similarity.pqTopK(e, q, cbs, "vec_id", "embedding", k = 10).count()
      }
      r("ann_pq_wide") = time(s"$tag ANN PQ wide codebooks (ks=256 broadcast ADC)") {
        // production codebook width: 256 entries/subspace ride ONE
        // broadcast AdcScore payload (the old typedLit-map ADC would
        // re-enter m·ks·dsub plan literals at this ks); encode + scoring
        // must stay one narrow codegen'd pass, linear in corpus size
        val q = e.filter(col("vec_id") < 5)
        val cbs = Similarity.pqCodebooks(
          e.filter(col("vec_id").between(200, 455)), "vec_id", "embedding",
          m = 8, dsub = 8, ks = 256)
        Similarity.pqTopK(e, q, cbs, "vec_id", "embedding", k = 10).count()
      }
      // the replicated corpus duplicates every vector N times — the
      // duplication-heavy stress for the adaptive refinement + star cap
      r("cosine_near_dup") = time(s"$tag cosine near-dup pairs") {
        Similarity.cosineNearDupPairs(
          e, "vec_id", "embedding", threshold = 0.9999, bits = 8, dim = 64).count()
      }
      r("group_agg") = time(s"$tag hash agg (q01 shape)") {
        l.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1))).count()
      }
      r("skewed_agg") = time(s"$tag skewed hot-key agg (salted two-stage)") {
        // ~50% of ALL rows share ONE key (the viral-user / default-PK
        // shape, and the q79 hot-domain condition at its extreme).
        // Replication multiplies the hot key's row count 8x; the salted
        // two-stage agg spreads it over 16 partials so the worst task
        // stays bounded — a plain groupBy would funnel half the corpus
        // through a single reducer however many executors exist
        val skewed = l.withColumn("k",
          when(col("l_orderkey") % 2 === 0, lit(0L)).otherwise(col("l_orderkey")))
        graft.ops.Salting.saltedSum(skewed, "k", "l_quantity",
          col("l_orderkey") * 8 + col("l_linenumber")).count()
      }
      // replicated docs repeat every line N times → N-fold drops: the
      // hash-count + join-back + reassembly path under max duplication
      r("line_dedup") = time(s"$tag C4 line-level dedup") {
        graft.ops.Corpus.lineDedup(
          d.select(col("doc_id"),
            regexp_replace(col("text"), " (the|a) ", "\n").as("text")),
          "doc_id", "text").agg(sum("n_dropped")).collect()
      }
      r("seq_packing") = time(s"$tag sequence packing (two-phase scan)") {
        graft.ops.Corpus.packSequences(
          d.select(col("doc_id"), col("n_chars").as("tok")),
          "doc_id", "tok", budget = 4096L).count()
      }
      r("domain_cap") = time(s"$tag per-domain cap (hot-domain window)") {
        // replication multiplies per-source occupancy N-fold — exactly the
        // hot-domain condition the operator exists for; work must stay
        // linear because WindowGroupLimit prunes to cap rows map-side
        graft.ops.Corpus.domainCap(
          d.select(col("doc_id"), col("source"), col("n_chars")),
          "source", cap = 5,
          priority = Seq(col("n_chars").desc, col("doc_id").asc)).count()
      }
      r("sketch_union") = time(s"$tag HLL sketch build+union") {
        l.withColumn("__shard", pmod(col("l_orderkey"), lit(8)))
          .groupBy("__shard")
          .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).collect()
      }
      r("kmeans_train") = time(s"$tag k-means train (2 Lloyd iterations, k=8)") {
        // fixed k while the corpus scales: E-step argmin is a narrow pass,
        // M-step shuffles (cid, dim, decimal) rows — both linear in rows
        graft.ops.Clustering.kmeans(e, "vec_id", "embedding", k = 8, iters = 2)
          .count()
      }
      r("stream_window_agg") = time(s"$tag streaming window agg (drain via AvailableNow)") {
        // the streaming family's scaling shape: state is one row per open
        // (window, key) — fixed by the fixture's time span — while the
        // DATA scales 8x, so drain time must grow at most linearly.
        // Each rep gets its own source stage + checkpoint (file-source
        // offsets would otherwise dedup rep 2 to a no-op).
        import org.apache.spark.sql.streaming.Trigger
        val stageDir = GraftTmp.dir("scale_stream_")
        val srcDf = spark.read.parquet(line)
          .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").as("ts"),
            col("l_quantity"))
        srcDf.write.mode("overwrite").parquet(s"$stageDir/src")
        val schema = spark.read.parquet(s"$stageDir/src").schema
        val cnt = new java.util.concurrent.atomic.AtomicLong
        spark.readStream.schema(schema).parquet(s"$stageDir/src")
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "30 days"), col("l_orderkey") % 16)
          .agg(count(lit(1)).as("n"))
          .writeStream
          .outputMode("complete")
          .option("checkpointLocation", s"$stageDir/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            cnt.set(b.count())
          }
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        assert(cnt.get() > 0)
      }
      // ---- manifest-family kernels: the claims are O(touched), not
      // O(table), so the table is laid out as FIXED-SIZE dirs whose
      // COUNT scales with the data (4 per replica) and each kernel
      // touches a replica-0-sized slice. Linear-in-table would show
      // ratios near n; the design target is ~1. Setup (dir writes,
      // stats, initial states) happens OUTSIDE the timed closures.
      val manifestKernels = Set("manifest_merge_hot", "dv_sparse_delete",
        "incr_agg_load")
      if (kernelFilter.forall(f => manifestKernels.exists(f.contains))) {
        import graft.ingest.{IncrementalAgg, ManifestCommit, MergeInto}
        val repOffset = 100_000_000L
        val lk = l.select("l_orderkey", "l_quantity", "l_extendedprice")
        val baseMax = lk.agg(max(col("l_orderkey") % repOffset))
          .collect()(0).getLong(0)
        val qWidth = baseMax / 4 + 1
        def commitSliced(prefix: String): String = {
          val root = GraftTmp.dir(prefix) + "/t"
          val staging = s"$root/__staging"
          lk.withColumn("__slice",
            concat(col("l_orderkey") / repOffset cast "long", lit("_"),
              (col("l_orderkey") % repOffset) / qWidth cast "long"))
            .write.partitionBy("__slice").parquet(staging)
          val fsys = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val dirs = fsys.listStatus(new org.apache.hadoop.fs.Path(staging)).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("__slice="))
            .map { st =>
              val d = ManifestCommit.newDataDir(root)
              fsys.rename(st.getPath, new org.apache.hadoop.fs.Path(d))
              d -> ManifestCommit.dirStats(spark, d, Seq("l_orderkey"))
            }
          fsys.delete(new org.apache.hadoop.fs.Path(staging), true)
          ManifestCommit.commitReplace(spark, root, dirs.map(_._1),
            pruneDisplaced = false, stats = dirs.toMap)
          root
        }
        // time() runs TWO reps and a merge/delete MUTATES its table —
        // rep 2 on the same root would measure the no-op path. Each rep
        // consumes its own pre-built root (setup excluded from timing).
        locally {
          val roots = Seq(commitSliced("scale_merge_"),
            commitSliced("scale_merge_")).iterator
          // source: a band strictly inside replica 0's SECOND quartile —
          // exactly one dir of 4 (1x) / 4n (Nx) rewrites
          val src = lk.filter(col("l_orderkey").between(
            qWidth + qWidth / 4, 2 * qWidth - qWidth / 4))
            .withColumn("l_quantity", col("l_quantity") + 1)
            .dropDuplicates("l_orderkey")
          r("manifest_merge_hot") = time(s"$tag MERGE one hot dir (dir count ∝ data)") {
            val res = MergeInto.merge(spark, roots.next(), src, Seq("l_orderkey"))
            assert(res.dirsRewritten == 1, s"expected 1 dir, got ${res.dirsRewritten}")
          }
        }
        locally {
          val roots = Seq(commitSliced("scale_dv_"),
            commitSliced("scale_dv_")).iterator
          // delete set: every 97th key of replica 0 — touches replica 0's
          // 4 dirs only, whatever the table's total dir count
          val keys = lk.filter(col("l_orderkey") < repOffset &&
            col("l_orderkey") % 97 === 0).select("l_orderkey").distinct()
          r("dv_sparse_delete") = time(s"$tag DV sparse delete (fixed key set)") {
            val res = MergeInto.deleteWhere(spark, roots.next(), keys)
            assert(res.deleted > 0, s"dv kernel: $res")
          }
        }
        locally {
          val rollup = GraftTmp.dir("scale_incr_") + "/r"
          val measures = Seq(
            IncrementalAgg.Measure("n", "*", "count"),
            IncrementalAgg.Measure("qty", "l_quantity", "sum_dec"))
          // history: one state part per (replica, quartile) — 4 at 1x,
          // 4n at Nx — the standing-rollup shape after many loads
          val nRep = (lk.agg(max("l_orderkey")).collect()(0).getLong(0) /
            repOffset + 1).toInt
          for (rep <- 0 until nRep; i <- 0 until 4) {
            IncrementalAgg.appendBatch(spark, rollup,
              lk.filter(col("l_orderkey") / repOffset === rep &&
                (col("l_orderkey") % repOffset) / qWidth === i)
                .withColumn("g", col("l_orderkey") % 512),
              Seq("g"), measures)
          }
          val batch = lk.filter(col("l_orderkey") < repOffset / 64)
            .withColumn("g", col("l_orderkey") % 512)
          r("incr_agg_load") = time(s"$tag incremental-agg load (fixed batch, history ∝ data)") {
            IncrementalAgg.appendBatch(spark, rollup, batch, Seq("g"), measures)
          }
        }
      }
      r("bloom_decontam") = time(s"$tag bloom decontamination") {
        // fixed bench set (base replica, every 50th doc) while the corpus
        // scales — the broadcast-filter side must stay constant
        val sh = d.select(col("doc_id"), graft.ops.TextHash.tokens(col("text")).as("tok"))
          .filter(size(col("tok")) >= 6)
          .select(col("doc_id"), explode(
            graft.functions.columns.shingleHashes(col("tok"), 6, mod32 = false)).as("h"))
        val bench = sh.filter(col("doc_id") < 10_000_000L && col("doc_id") % 50 === 0)
        graft.ops.Corpus.bloomDecontaminate(
          sh.filter(col("doc_id") % 50 =!= 0), bench).count()
      }
      all.toMap
    }

    println(s"[scale] --- 1x (sf0.1) ---")
    val one = kernels("1x", docs1, line1, emb1, media1)
    println(s"[scale] --- ${n}x ---")
    val big = kernels(s"${n}x", docsN, lineN, embN, mediaN)
    println(f"[scale] ratios at ${n}x data (linear == ≤ $n%d on fixed cores):")
    one.keys.toSeq.sorted.foreach { k =>
      println(f"[scale]   $k%-20s ${big(k) / one(k)}%6.2f x")
    }
    GraftTmp.purge()
    spark.stop()
  }
}
