package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T-rules: string/encoding cleaning (SURVEY.md §2.7;
  * ingest_runner.py:308-341 mojibake, data_cleaner_robust.py:32-159).
  */
class StringCleaningSpec extends SparkSpec {
  import CleanRules._

  private val schema = StructType(Seq(StructField("s", StringType, true)))

  private def apply1(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      vals: String*): Seq[String] = {
    val df = mkDf(schema, vals.map(Row(_)): _*).select(c(col("s")).as("c"))
    col0[String](df)
  }

  test("T1: mojibake repair table (ingest_runner.py:308-341)") {
    assert(apply1(repairMojibake, "Actualizaci??n") === Seq("Actualización"))
    assert(apply1(repairMojibake, "se??or") === Seq("seóor")) // ?? -> ó, reference semantics
    assert(apply1(repairMojibake, "Ã¡Ã©Ã­Ã³ÃºÃ±") === Seq("áéíóúñ"))
    assert(apply1(repairMojibake, "clean text") === Seq("clean text"))
    assert(apply1(repairMojibake, null.asInstanceOf[String]) === Seq(null))
  }

  test("T2: control chars stripped (data_cleaner_robust.py:32-123)") {
    assert(apply1(stripControlChars, "abcd") === Seq("abcd"))
    assert(apply1(stripControlChars, "keep spaces ok") === Seq("keep spaces ok"))
  }

  test("T3: whitespace collapse + empty -> NULL (data_cleaner_robust.py:125-159)") {
    assert(apply1(normalizeWhitespace, "  a \n b  ") === Seq("a b"))
    assert(apply1(normalizeWhitespace, "tab\there") === Seq("tab here"))
    assert(apply1(normalizeWhitespace, "a\r\nb") === Seq("a b"))
    assert(apply1(normalizeWhitespace, "", "   ", null) === Seq(null, null, null))
  }

  test("T4: NOT NULL / PK defaults (ingest_runner.py:637-655)") {
    assert(apply1(notNullStringDefault, null.asInstanceOf[String], "x") === Seq("N/A", "x"))
    assert(apply1(pkStringDefault(_, "code"), null.asInstanceOf[String], "c1") ===
      Seq("default_code_pk", "c1"))
  }

  test("T5: base64 round-trip (gen_pipeline.py:121)") {
    val df = mkDf(schema, Row("hello"))
      .select(fromBase64(toBase64(col("s").cast("binary"))).cast("string").as("c"))
    assert(col0[String](df) === Seq("hello"))
  }

  test("cleanString composes: control-strip -> whitespace -> mojibake -> NULL on empty") {
    assert(apply1(cleanString, "  Actualizaci??n \n ya  ") === Seq("Actualización ya"))
    assert(apply1(cleanString, "  ") === Seq(null))
  }
}
