package graft

import org.apache.spark.sql.functions._

/** The BI-over-SQL surface (SURVEY.md §3.3): registered catalog views +
  * `spark.sql` — what a Thrift-server/Spark-Connect BI client would issue.
  * Plus the at-scale approximate-distinct path for A7.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registered views serve the reference's flagship BI SQL shapes") {
    Tables.registerAll(spark, dir)
    // test_sql_lab.py:144 shape
    val byDate = spark.sql(
      """SELECT o_orderdate, count(*) AS n FROM orders
        |GROUP BY o_orderdate ORDER BY o_orderdate DESC LIMIT 10""".stripMargin)
    assert(byDate.count() === 10)
    // LEFT JOIN shape (test_sql_lab.py:151-160)
    val joined = spark.sql(
      """SELECT c_name, count(*) AS orders FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name ORDER BY orders DESC, c_name LIMIT 5""".stripMargin)
    assert(joined.count() === 5)
    // repair_encoding is callable from plain SQL via the extension
    val re = spark.sql("SELECT repair_encoding('cafÃ©') AS r").collect()
    assert(re(0).getString(0) === "café")
  }

  test("A7 at scale: approx_count_distinct within 5% of exact") {
    val events = Tables.load(spark, dir, "events")
    val row = events.agg(
      countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id", 0.02).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
