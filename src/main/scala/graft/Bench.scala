package graft

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. Failures are
  * reported per-query (negative sentinel + errors map) instead of being
  * swallowed as fast "passes".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv("graft-bench")

    // Warm the session (JVM/codegen/parquet footer caches) on the smallest
    // table so the first timed query doesn't absorb startup cost. Non-fatal:
    // a broken sfDir must still produce the JSON line (with per-query errors).
    try Tables.load(spark, sfDir, "region").count()
    catch { case e: Throwable => System.err.println(s"[bench] warm-up failed: ${e.getMessage}") }

    // Optional comma-separated subset (dev profiling): SPARK_GRAFT_ONLY=q51,q45
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(f => f.exists(n.startsWith)))

    // Aggregate executor task time per query: wall >> task flags external
    // interference (this sandbox's CPU/IO contention comes in episodes),
    // wall ≈ task flags genuine compute. Attribution smears slightly when
    // listener events drain late; good enough for triage.
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
    })
    var errors = List.empty[(String, String)]
    var taskSecs = List.empty[(String, Double)]
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val task0 = taskMs.get()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          // getMessage can be null (NPE, some SparkExceptions)
          val msg = Option(e.getMessage).getOrElse(e.toString)
          // strip everything JSON-hostile (backslashes included: a regex
          // in an exception message would otherwise emit illegal escapes)
          errors ::= (name -> msg.take(200).replaceAll("[\"\\\\\\p{Cntrl}]", " "))
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      taskSecs ::= (name -> (taskMs.get() - task0) / 1e3)
      // Each query is timed standalone; drop its cached blocks so later
      // queries aren't taxed by accumulated executor-memory pressure/GC
      // from earlier ones (q31/q47 cache small tables by design).
      spark.catalog.clearCache()
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    val taskJson = taskSecs.reverse.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${errors.size},"errors":$errJson,"task_sec":$taskJson,"sf":"$sfDir"}""")
    GraftTmp.purge()
    spark.stop()
  }
}
