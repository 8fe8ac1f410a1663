package graft.ingest

import graft.SparkSpec
import graft.schema.SchemaReflector
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Month-partitioned writes must produce partition-PRUNED reads: the scan
  * of one month may not touch the other months' files (the point of the
  * reference's PARTITION BY toYYYYMM at 100 TB).
  */
class PartitionPruningSpec extends SparkSpec {

  test("filter on __yyyymm becomes a PartitionFilter, not a data filter") {
    val out = Files.createTempDirectory("pruning_spec_").toString
    val dir = "/root/testdata/sf0.001"
    val meta = SchemaReflector.fromParquet(spark, s"$dir/orders.parquet", "orders")
    Ingest.ingestTable(spark, spark.read.parquet(s"$dir/orders.parquet"), meta,
      out, DedupMode.NoDedup, monthPartitionCol = Some("o_orderdate"))

    val pruned = spark.read.parquet(s"$out/orders")
      .filter(col("__yyyymm") === "199501")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
    assert(scan.contains("__yyyymm"), s"partition col missing from filters:\n$scan")
    // data-level pushed filter on __yyyymm would indicate pruning FAILED
    // (the column only exists at partition level)
    val n199501 = pruned.count()
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .filter(date_format(col("o_orderdate"), "yyyyMM") === "199501").count()
    assert(n199501 === expected && expected > 0)
  }
}
