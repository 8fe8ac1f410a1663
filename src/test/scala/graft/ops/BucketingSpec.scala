package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Bucketed co-located join: both sides bucketed+sorted on the key →
  * sort-merge join with NO shuffle exchange in the plan.
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without any Exchange") {
    val base = Files.createTempDirectory("bucketing_spec_").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    Bucketing.writeBucketed(orders, "orders_b", s"$base/orders_b", 4, Seq("o_custkey"))
    Bucketing.writeBucketed(customer, "customer_b", s"$base/customer_b", 4, Seq("o_custkey"))
    try {
      val joined = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // correctness: same result as the plain join
      val expected = orders.join(customer, Seq("o_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
