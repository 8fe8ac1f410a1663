package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** W1 dedup-by-latest-version semantics (ingest_runner.py:1576-1592):
  * row_number over PARTITION BY key ORDER BY version DESC NULLS LAST,
  * keep rn=1. The NULLS LAST detail is the subtle part — a NULL version
  * must never beat a real one (SURVEY.md §7 hard parts).
  */
class WindowDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType, false),
    StructField("ver", TimestampType, true),
    StructField("payload", StringType, true)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("W1: latest version wins; NULL version loses to any real version") {
    val df = mkDf(schema,
      Row(1, ts("2021-01-01 00:00:00"), "old"),
      Row(1, ts("2021-06-01 00:00:00"), "new"),
      Row(2, null, "null-ver"),
      Row(2, ts("2020-01-01 00:00:00"), "real-ver"),
      Row(3, null, "only-null"))
    val w = Window.partitionBy($"k").orderBy($"ver".desc_nulls_last)
    val out = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .drop("rn").orderBy("k").collect()
    assert(out.map(_.getAs[String]("payload")).toSeq ===
      Seq("new", "real-ver", "only-null"))
  }

  test("W1: desc (plain) is already nulls-last in Spark — guard against regression") {
    // SURVEY §7: verify Spark's default so a refactor to .desc stays safe.
    val df = mkDf(schema, Row(1, null, "n"), Row(1, ts("2020-01-01 00:00:00"), "r"))
    val out = df.withColumn("rn",
        row_number().over(Window.partitionBy($"k").orderBy($"ver".desc)))
      .filter($"rn" === 1).collect()
    assert(out(0).getAs[String]("payload") === "r")
  }

  test("dedupLatest aggregate form matches the window form, incl. NULL version") {
    val df = mkDf(schema,
      Row(1, ts("2021-01-01 00:00:00"), "old"),
      Row(1, ts("2021-06-01 00:00:00"), "new"),
      Row(2, null, "null-ver"),
      Row(2, ts("2020-01-01 00:00:00"), "real-ver"),
      Row(3, null, "only-null"),
      Row(4, ts("2022-01-01 00:00:00"), "same-a"),
      Row(4, ts("2022-01-01 00:00:00"), "same-b")) // version tie → payload breaks it
    def asSet(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getInt(0), r.getAs[String]("payload"))).toSet
    val agg = graft.ingest.Ingest.dedupLatest(df, Seq("k"), Some("ver"), Seq("payload"))
    val win = graft.ingest.Ingest.dedupLatestWindow(df, Seq("k"), Some("ver"), Seq("payload"))
    assert(asSet(agg) === asSet(win))
    assert(asSet(agg) === Set((1, "new"), (2, "real-ver"), (3, "only-null"), (4, "same-b")))
    assert(agg.columns.toSeq === df.columns.toSeq, "column order preserved")
    assert(agg.schema.map(_.dataType) === df.schema.map(_.dataType))
  }

  test("dedupLatest plans as partial+final aggregation, never a window funnel") {
    val df = mkDf(schema, Row(1, ts("2021-01-01 00:00:00"), "x"))
    val plan = graft.ingest.Ingest.dedupLatest(df, Seq("k"), Some("ver"), Seq("payload"))
      .queryExecution.executedPlan.toString
    // the skew-safe property IS the plan shape: a map-side partial
    // aggregate before the key shuffle (one row per key per task), no
    // Window node (which would funnel a hot key into one task)
    assert(!plan.contains("Window"), s"window funnel crept back:\n$plan")
    val aggNodes = "(?i)aggregate".r.findAllIn(plan).size
    assert(aggNodes >= 2, s"expected partial+final aggregate nodes:\n$plan")
  }

  private implicit class Dollar(sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
