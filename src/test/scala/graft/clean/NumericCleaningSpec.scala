package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-rules: integer/numeric cleaning (SURVEY.md §2.7, ingest_runner.py
  * clean_integer_column :506-574 and the `cell` normalizer :764-992).
  */
class NumericCleaningSpec extends SparkSpec {
  import CleanRules._

  private val strSchema = StructType(Seq(StructField("x", StringType, true)))

  private def cleanInts(required: Boolean, vals: String*): Seq[Any] = {
    val df = mkDf(strSchema, vals.map(Row(_)): _*)
      .select(cleanInteger(col("x"), required).as("c"))
    df.collect().toSeq.map(_.get(0))
  }

  test("N1: plain and float-repr integers parse; non-integral/garbage -> NULL") {
    assert(cleanInts(required = false, "7", "8.0", " 9 ", "-3", "1e4") ===
      Seq(7L, 8L, 9L, -3L, 10000L))
    assert(cleanInts(required = false, "8.5", "abc", "null", "", "NaN", null) ===
      Seq(null, null, null, null, null, null))
  }

  test("N1: PK/NOT-NULL columns default NULL -> 0 (ingest_runner.py:527-531)") {
    assert(cleanInts(required = true, "7", "abc", null, "") === Seq(7L, 0L, 0L, 0L))
  }

  test("N1: overflow beyond bigint -> NULL, not garbage") {
    assert(cleanInts(required = false, "123456789012345678901234567890") === Seq(null))
  }

  test("N2: int32 range guard (ingest_runner.py:916-919)") {
    val schema = StructType(Seq(StructField("x", LongType, true)))
    val df = mkDf(schema, Row(2147483648L), Row(-2147483649L), Row(42L), Row(null))
      .select(int32RangeGuard(col("x")).as("c"))
    assert(df.collect().toSeq.map(_.get(0)) === Seq(null, null, 42L, null))
  }

  test("N3: range clamp to bounds, NULL preserved (data_cleaner_robust.py:54-65)") {
    val schema = StructType(Seq(StructField("x", DoubleType, true)))
    val df = mkDf(schema, Row(1e9), Row(-1e9), Row(3.5), Row(null))
      .select(rangeClamp(col("x"), -100.0, 100.0).as("c"))
    assert(df.collect().toSeq.map(_.get(0)) === Seq(100.0, -100.0, 3.5, null))
  }

  test("N4: NaN/Inf -> NULL (ingest_runner.py:764-992)") {
    val schema = StructType(Seq(StructField("x", DoubleType, true)))
    val df = mkDf(schema, Row(Double.NaN), Row(Double.PositiveInfinity),
      Row(Double.NegativeInfinity), Row(1.5), Row(null))
      .select(nanInfToNull(col("x")).as("c"))
    assert(df.collect().toSeq.map(_.get(0)) === Seq(null, null, null, 1.5, null))
  }

  test("N6: bool -> int (ingest_runner.py:909-910)") {
    val schema = StructType(Seq(StructField("x", BooleanType, true)))
    val df = mkDf(schema, Row(true), Row(false), Row(null))
      .select(boolToInt(col("x")).as("c"))
    assert(df.collect().toSeq.map(_.get(0)) === Seq(1, 0, null))
  }

  test("N7: numeric inference keeps integers exact, falls back to string (ingest_runner.py:658-685)") {
    val df = mkDf(strSchema, Row("7"), Row("7.25"), Row("abc"))
      .select(inferNumeric(col("x")).as("c"))
    assert(col0[String](df) === Seq("7", "7.25", "abc"))
  }
}
