package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** As-of join semantics: latest at-or-before match per key, inclusive
  * ties, NULL when nothing precedes, cross-key isolation.
  */
class AsOfJoinSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, false),
    StructField("k", StringType, false),
    StructField("ts", TimestampType, false)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("latest at-or-before right row wins; no-match is NULL; keys isolated") {
    val left = mkDf(schema,
      Row(100L, "a", ts("2024-01-01 10:00:00")), // after r1,r2 -> r2
      Row(101L, "a", ts("2024-01-01 08:30:00")), // between r1,r2 -> r1
      Row(102L, "a", ts("2024-01-01 07:00:00")), // before all -> NULL
      Row(103L, "b", ts("2024-01-01 12:00:00")), // b has no rights -> NULL
      Row(104L, "a", ts("2024-01-01 09:00:00"))) // EQUAL to r2 -> r2 (inclusive)
    val right = mkDf(schema,
      Row(1L, "a", ts("2024-01-01 08:00:00")),
      Row(2L, "a", ts("2024-01-01 09:00:00")))
    val out = AsOfJoin.lastAtOrBefore(left, right, "k", "ts", "ts", "id", "m")
      .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("m"))).map(_.asInstanceOf[Long])).toMap
    assert(out === Map(
      100L -> Some(2L), 101L -> Some(1L), 102L -> None,
      103L -> None, 104L -> Some(2L)))
  }

  test("plan: one shuffle on the key, no range cross product") {
    val left = mkDf(schema, Row(1L, "a", ts("2024-01-01 10:00:00")))
    val right = mkDf(schema, Row(2L, "a", ts("2024-01-01 09:00:00")))
    val plan = AsOfJoin.lastAtOrBefore(left, right, "k", "ts", "ts", "id", "m")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
