package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.10 custom Catalyst expression: latin1→utf8 re-decode semantics
  * (ingest_runner.py:308-341), Column DSL, SQL registration, and codegen
  * participation.
  */
class RepairEncodingSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("s", StringType, true)))

  private def repair(vals: String*): Seq[String] = {
    val df = mkDf(schema, vals.map(Row(_)): _*)
      .select(columns.repairEncoding(col("s")).as("r"))
    col0[String](df)
  }

  test("utf8-misread-as-latin1 strings are re-decoded") {
    assert(repair("cafÃ©") === Seq("café"))
    assert(repair("maÃ±ana Ã³ptimo") === Seq("mañana óptimo"))
    assert(repair("Ã¡Ã©Ã­Ã³ÃºÃ±") === Seq("áéíóúñ"))
  }

  test("genuine latin1/ascii/unicode text is untouched; null stays null") {
    assert(repair("café") === Seq("café"))     // 0xE9 alone is invalid UTF-8
    assert(repair("plain") === Seq("plain"))
    assert(repair("日本語") === Seq("日本語")) // >0xFF code points: not a misread
    assert(repair(null.asInstanceOf[String]) === Seq(null))
  }

  test("registered SQL function works via GraftExtensions injection") {
    val df = mkDf(schema, Row("cafÃ©"))
    df.createOrReplaceTempView("re_test")
    val out = spark.sql("SELECT repair_encoding(s) AS r FROM re_test").collect()
    assert(out(0).getString(0) === "café")
  }

  test("CollapseRepairEncoding optimizer rule removes nested applications") {
    val df = mkDf(schema, Row("cafÃ©"))
      .select(columns.repairEncoding(columns.repairEncoding(col("s"))).as("r"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("repair_encoding".r.findAllIn(optimized).size <= 1,
      s"nested repair_encoding not collapsed:\n$optimized")
    assert(df.collect()(0).getString(0) === "café")
  }

  test("expression stays inside whole-stage codegen (no fallback)") {
    // A local relation constant-folds away; use a parquet scan so the
    // projection actually plans + runs through generated code.
    val dir = java.nio.file.Files.createTempDirectory("re_codegen_").toString
    mkDf(schema, Row("cafÃ©"), Row("plain")).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(columns.repairEncoding(col("s")).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators compiled into a codegen stage
    assert(plan.linesIterator.next().trim.startsWith("*(1) Project [repair_encoding"),
      s"expected the projection inside a codegen stage:\n$plan")
    assert(col0[String](df).sorted === Seq("café", "plain"))
  }
}
