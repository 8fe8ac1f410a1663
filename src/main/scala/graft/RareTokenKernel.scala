package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Measurement kernel for the rare-token filter's two plans (VERDICT r16
  * "Next round" #1): `rareTokenFlags` (exact join-back — every token
  * OCCURRENCE shuffles on the skewed token string key) vs
  * `rareTokenFlagsBroadcast` (common-set inversion — the LM shuffle plus
  * ONE pre-aggregated row per document; the flag pass is a map-side
  * broadcast hash join). Reports min-of-3 wall seconds AND total shuffle
  * WRITE bytes per variant — the bytes are the 100-TB story: the exact
  * form's shuffle grows with the tokenized corpus, the broadcast form's
  * with (distinct tokens + documents).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.RareTokenKernel"`.
  */
object RareTokenKernel {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.fromEnv("graft-raretoken-kernel")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // at gate scale AQE quietly BROADCASTS the exact form's LM side and
    // hides the production story — at 100 TB the LM (every distinct
    // token) never fits a broadcast, the join-back is a real SMJ of all
    // token occurrences. Pin that regime for the exact variant; the
    // bcast variant's explicit broadcast() hint overrides the threshold,
    // so it measures its true plan either way.
    def plan(mode: String): DataFrame = mode match {
      case "exact" =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        ops.TextAnalysis.rareTokenFlags(docs, "doc_id", "text", 3L, 20)
      case "bcast" =>
        ops.TextAnalysis.rareTokenFlagsBroadcast(docs, "doc_id", "text", 3L, 20)
    }

    def drainListeners(): Unit = Thread.sleep(1500) // let the bus flush

    def run(mode: String): (Double, Long) = {
      // one timed-out-of-band pass for bytes (deterministic per plan),
      // then min-of-3 for seconds
      drainListeners(); shuffleBytes.set(0L)
      plan(mode).count()
      drainListeners()
      val bytes = shuffleBytes.get()
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        plan(mode).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (secs, bytes)
    }

    plan("exact").count() // JIT/codegen warm-up
    val results = Seq("exact", "bcast").map(m => m -> run(m))
    val (baseS, baseB) = results.head._2
    results.foreach { case (m, (s, b)) =>
      val ratio = if (baseB == 0L) 1.0 else b.toDouble / baseB
      println(f"[raretoken-kernel] sf=$sfDir variant=$m%-6s min3=$s%.3f s " +
        f"(${s / baseS}%.2fx)  shuffleWrite=${b / 1024.0 / 1024.0}%.2f MiB " +
        f"($ratio%.3fx)")
    }
    spark.stop()
  }
}
