package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.fromEnv("graft-verify")
    // Fixture drift produces ONE diagnostic here instead of N cryptic
    // per-query analysis errors; unaffected queries still run (so a
    // single drifted table costs its own gates, not the whole round).
    try FixtureContract.check(spark, sfDir)
    catch { case e: IllegalStateException =>
      System.err.println(s"[verify] FIXTURE CONTRACT: ${e.getMessage}")
    }
    new java.io.File(outDir).mkdirs()
    // Concurrent query dumps (same pattern as Ingest.ingestAll): the
    // lineages are independent — distinct output dirs, UUID/unique temp
    // scratch — and concurrent jobs overlap small-query scheduling gaps
    // with big-query compute. Failure isolation preserved per query.
    locally {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // optional dev-only subset (driver sets no env → all queries)
      val picked = GraftSession.selectedNames(SparkEntry.queries.keys.toSeq).toSet
      val fs = SparkEntry.queries.toSeq
        .filter { case (name, _) => picked(name) }
        .map { case (name, fn) =>
        Future {
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
      try Await.result(Future.sequence(fs), Duration.Inf)
      finally pool.shutdown()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    GraftTmp.purge()
    spark.stop()
  }
}
