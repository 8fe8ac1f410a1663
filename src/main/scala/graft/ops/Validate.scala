package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (Deequ-style), evaluated in a
  * SINGLE aggregate pass over the table.
  *
  * Reference analog: the pipeline validator's post-ingest data checks
  * (`tools/dynamic_pipeline_validator.py:244-323` walks every table and
  * asserts row counts > 0; `tools/ingest_runner.py` audits per-table
  * row parity). This operator generalizes those to column-level
  * constraints — completeness, key uniqueness, value bounds, domain
  * cardinality — while keeping the reference's one-shot report shape.
  *
  * Scale design: every check compiles to an aggregate expression and ALL
  * of them run in ONE `df.agg(...)` — a single scan + a single partial/
  * final combine regardless of how many constraints are attached, which
  * is the only acceptable cost model at 100 TB (Deequ's documented
  * "scan-sharing" design). The wide one-row result is then unpivoted
  * driver-side-free via `inline` into the (check_name, metric, passed)
  * long report. Only count/min/max/distinct-count aggregates are used —
  * no floating-point SUM/AVG — so the report is bit-deterministic under
  * any row order (integer counts are exact; IEEE division is correctly
  * rounded; min/max are order-free).
  */
object Validate {

  /** One constraint: a named aggregate metric + a pass predicate over it.
    * `agg` must be a Spark aggregate expression; `pass` is applied to the
    * computed metric (as DOUBLE) after the single pass. */
  sealed trait Check {
    def name: String
    private[ops] def agg: Column
    private[ops] def pass(metric: Column): Column
  }

  /** Non-null fraction of `column` must be >= `atLeast`. Metric is exact:
    * count(col)/count(*) — integer counts, one IEEE division. */
  final case class Completeness(column: String, atLeast: Double)
      extends Check {
    val name = s"completeness_$column"
    private[ops] def agg: Column =
      count(col(column)).cast("double") / count(lit(1))
    private[ops] def pass(m: Column): Column = m >= atLeast
  }

  /** `columns` must form a unique key. Metric = distinct/total ratio
    * (1.0 iff unique). NULL-safe: counts distinct tuples via a struct. */
  final case class Uniqueness(columns: Seq[String]) extends Check {
    val name = s"uniqueness_${columns.mkString("_")}"
    private[ops] def agg: Column =
      count_distinct(struct(columns.map(col): _*))
        .cast("double") / count(lit(1))
    private[ops] def pass(m: Column): Column = m >= 1.0
  }

  /** min(column) must be >= `atLeast`. */
  final case class MinBound(column: String, atLeast: Double) extends Check {
    val name = s"min_$column"
    private[ops] def agg: Column = min(col(column)).cast("double")
    private[ops] def pass(m: Column): Column = m >= atLeast
  }

  /** max(column) must be <= `atMost`. */
  final case class MaxBound(column: String, atMost: Double) extends Check {
    val name = s"max_$column"
    private[ops] def agg: Column = max(col(column)).cast("double")
    private[ops] def pass(m: Column): Column = m <= atMost
  }

  /** Exact distinct count of `column` must be <= `atMost` (domain /
    * enum-cardinality check). */
  final case class DistinctCountAtMost(column: String, atMost: Long)
      extends Check {
    val name = s"distinct_$column"
    private[ops] def agg: Column = count_distinct(col(column)).cast("double")
    private[ops] def pass(m: Column): Column = m <= atMost.toDouble
  }

  /** Table must have at least `atLeast` rows. */
  final case class RowCountAtLeast(atLeast: Long) extends Check {
    val name = "row_count"
    private[ops] def agg: Column = count(lit(1)).cast("double")
    private[ops] def pass(m: Column): Column = m >= atLeast.toDouble
  }

  /** Evaluate `checks` over `df` in one aggregate pass; returns the long
    * report (check_name STRING, metric DOUBLE, passed BIGINT), one row
    * per check, ordered by check_name for a stable gate. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.agg.as(s"__m$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"__m$i").as("metric"),
        when(c.pass(col(s"__m$i")), 1L).otherwise(0L).as("passed"))
    }
    wide.select(inline(array(rows: _*))).orderBy("check_name")
  }
}
