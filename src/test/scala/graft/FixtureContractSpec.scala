package graft

import java.nio.file.{Files, Paths}

/** FixtureContract: the real fixtures satisfy it; a deliberately-drifted
  * schema is rejected with a diagnostic naming the table, column, and
  * found type (the round-8 lesson: 25 queries died with cryptic analysis
  * errors because events.ts silently changed physical type). */
class FixtureContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("real driver fixtures pass the contract") {
    assume(Files.exists(Paths.get(sfDir)))
    FixtureContract.check(spark, sfDir) // must not throw
  }

  test("drifted events.ts type is named in the diagnostic") {
    assume(Files.exists(Paths.get(sfDir)))
    import org.apache.spark.sql.functions._
    val bad = Files.createTempDirectory("graft_fixture_bad_").toString
    // clone the real fixtures, then drift ONE column: ts → string
    Tables.names.foreach { n =>
      val src = s"$sfDir/$n.parquet"
      if (n == "events")
        spark.read.parquet(src)
          .withColumn("ts", col("ts").cast("string"))
          .write.mode("overwrite").parquet(s"$bad/$n.parquet")
      else
        Files.copy(Paths.get(src), Paths.get(s"$bad/$n.parquet"))
    }
    val e = intercept[IllegalStateException](FixtureContract.check(spark, bad))
    assert(e.getMessage.contains("events.ts"), e.getMessage)
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
    // the diagnostic names ONLY the drifted column, not false positives
    assert(!e.getMessage.contains("lineitem"), e.getMessage)
  }

  test("missing column is named with the columns actually present") {
    assume(Files.exists(Paths.get(sfDir)))
    val bad = Files.createTempDirectory("graft_fixture_bad2_").toString
    Tables.names.foreach { n =>
      val src = s"$sfDir/$n.parquet"
      if (n == "documents")
        spark.read.parquet(src).drop("lang")
          .write.mode("overwrite").parquet(s"$bad/$n.parquet")
      else
        Files.copy(Paths.get(src), Paths.get(s"$bad/$n.parquet"))
    }
    val e = intercept[IllegalStateException](FixtureContract.check(spark, bad))
    assert(e.getMessage.contains("documents.lang"), e.getMessage)
    assert(e.getMessage.contains("column missing"), e.getMessage)
  }

  test("normalizeTs handles all three physical variants identically") {
    import org.apache.spark.sql.functions._
    val micros = 1700000000123456L // some fixed post-epoch instant
    import spark.implicits._
    val fromLong = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("ts")) // nanos as Long
    val fromNtz = Tables.normalizeTs(
      Seq(micros).toDF("us").select(
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    val fromTs = Tables.normalizeTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))
    val vals = Seq(fromLong, fromNtz, fromTs).map { df =>
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    }
    assert(vals.distinct == Seq(micros), vals)
  }
}
