package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ValidateSpec extends SparkSpec {
  import Validate._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def fixture = mkDf(schema,
    Row(1L, "a", 1.0),
    Row(2L, "a", 2.5),
    Row(3L, "b", 0.5),
    Row(3L, null, 4.0)) // duplicate id + null grp

  test("report evaluates all checks in one pass, long form, name-ordered") {
    val rep = Validate.report(fixture, Seq(
      RowCountAtLeast(3),
      Completeness("grp", 0.9),
      Uniqueness(Seq("id")),
      MinBound("v", 0.0),
      MaxBound("v", 3.0),
      DistinctCountAtMost("grp", 5)))
    val rows = rep.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    val m = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("row_count") == ((4.0, 1L)))
    assert(m("completeness_grp") == ((0.75, 0L))) // 3/4 < 0.9 → fail
    assert(m("uniqueness_id") == ((0.75, 0L))) // 3 distinct of 4 → fail
    assert(m("min_v") == ((0.5, 1L)))
    assert(m("max_v") == ((4.0, 0L))) // 4.0 > 3.0 → fail
    assert(m("distinct_grp") == ((2.0, 1L))) // nulls not counted
  }

  test("single-pass plan: exactly one aggregate over the input") {
    val rep = Validate.report(fixture, Seq(
      Completeness("grp", 0.5),
      Uniqueness(Seq("id", "grp")),
      MinBound("v", 0.0)))
    // One scan feeding one aggregation — the plan must not re-read the
    // input once per check.
    val plan = rep.queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 1, s"expected 1 scan, plan:\n$plan")
  }

  test("report rejects duplicate check names and empty suites") {
    intercept[IllegalArgumentException](Validate.report(fixture, Seq.empty))
    intercept[IllegalArgumentException](Validate.report(fixture,
      Seq(MinBound("v", 0.0), MinBound("v", 1.0))))
  }
}
