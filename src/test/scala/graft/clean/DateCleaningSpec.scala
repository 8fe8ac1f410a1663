package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden date-cleaning semantics ported from the reference's own
  * expectations (/root/reference/test_date_processing.py:69-99, transcribed
  * in FIXTURES.md §3): the `agencias` fixture must yield fechaini 3 NULL /
  * 2 valid and fechafin 4 NULL / 1 valid after the year-range rule.
  */
class DateCleaningSpec extends SparkSpec {
  import CleanRules._

  private val agenciasSchema = StructType(Seq(
    StructField("id", IntegerType, false),
    StructField("fechaini", StringType, true),
    StructField("fechafin", StringType, true)))

  // test_date_processing.py:21-53 values (dates arrive as strings from the
  // raw read, matching the reference's object-dtype read path).
  private val agencias = Seq(
    (1, "1900-01-01", "1900-01-01"),
    (2, "2020-05-15", "1900-01-01"),
    (3, null, "2021-12-31"),
    (4, "1900-01-01", null),
    (5, "2023-08-10", "1900-01-01"))

  test("golden: agencias fechaini -> 3 NULL / 2 valid (test_date_processing.py:72-81)") {
    val df = mkDf(agenciasSchema, agencias.map { case (i, a, b) => Row(i, a, b) }: _*)
      .select(cleanDateString(col("fechaini")).as("c"))
    val vals = col0[java.sql.Timestamp](df)
    assert(vals.count(_ == null) === 3)
    assert(vals.count(_ != null) === 2)
  }

  test("golden: agencias fechafin -> 4 NULL / 1 valid (test_date_processing.py:82-90)") {
    val df = mkDf(agenciasSchema, agencias.map { case (i, a, b) => Row(i, a, b) }: _*)
      .select(cleanDateString(col("fechafin")).as("c"))
    val vals = col0[java.sql.Timestamp](df)
    assert(vals.count(_ == null) === 4)
    assert(vals.count(_ != null) === 1)
  }

  private def cleanOne(s: String): Any = {
    val df = mkDf(StructType(Seq(StructField("ds", StringType, true))), Row(s))
      .select(cleanDateString(col("ds")).as("c"))
    df.collect()(0).get(0)
  }

  test("D1: zero-dates and null-ish strings -> NULL (ingest_runner.py:262-267)") {
    for (s <- Seq("0000-00-00", "0000-00-00 00:00:00", "", "NULL", "None", "nan"))
      assert(cleanOne(s) == null, s"'$s' should clean to NULL")
  }

  test("D2: year <=1900 or >=2100 -> NULL; boundary years inclusive (ingest_runner.py:290-297)") {
    assert(cleanOne("1900-12-31") == null)
    assert(cleanOne("2100-01-01") == null)
    assert(cleanOne("2350-01-01") == null)
    assert(cleanOne("1901-01-01") != null)
    assert(cleanOne("2099-12-31") != null)
  }

  test("D6: multi-format parse — ISO, DD/MM/YYYY, YYYYMMDD, garbage->NULL (data_cleaner_robust.py:253-279)") {
    assert(cleanOne("2021-03-15 10:11:12").toString.startsWith("2021-03-15 10:11:12"))
    assert(cleanOne("15/03/2021").toString.startsWith("2021-03-15"))
    assert(cleanOne("20210315").toString.startsWith("2021-03-15"))
    assert(cleanOne("20210315101112").toString.startsWith("2021-03-15 10:11:12"))
    assert(cleanOne("garbage") == null)
    assert(cleanOne("2021-13-45") == null)
  }

  test("D3: outside [1970, 2299-12-31] -> NULL (ingest_runner.py:807-876)") {
    val schema = StructType(Seq(StructField("ts", TimestampType, true)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = mkDf(schema,
      Row(ts("1969-12-31 23:59:59")), Row(ts("1970-01-01 00:00:00")),
      Row(ts("2299-12-31 23:59:59")), Row(ts("2300-01-01 00:00:00")), Row(null))
      .select(nullifyOutsideSupportedRange(col("ts")).as("c"))
    val vals = col0[java.sql.Timestamp](df)
    assert(vals(0) == null && vals(3) == null && vals(4) == null)
    assert(vals(1) != null && vals(2) != null)
  }

  test("D5: TIME/timedelta repr -> HH:MM:SS (ingest_runner.py:380-405)") {
    val schema = StructType(Seq(StructField("t", StringType, true)))
    val df = mkDf(schema, Row("0 days 12:02:03"), Row("12:02:03"), Row("1:02:03"),
      Row("12:02:03.500000"), Row("garbage"), Row(null))
      .select(timeToHms(col("t")).as("c"))
    assert(col0[String](df) === Seq("12:02:03", "12:02:03", "01:02:03", "12:02:03", null, null))
  }

  test("D7: fecha string helper — ISO else DD-MM-YYYY else NULL (generate_analytics_views.py:83-143)") {
    val schema = StructType(Seq(StructField("fecha", StringType, true)))
    val df = mkDf(schema, Row("2021-03-15"), Row("15-03-2021"), Row("garbage"), Row(null))
      .select(stringDateHelper(col("fecha")).cast("string").as("c"))
    assert(col0[String](df) === Seq("2021-03-15", "2021-03-15", null, null))
  }

  test("D7: fecha column-name trigger regex (generate_analytics_views.py:96)") {
    val re = fechaNameRegex.r
    for (n <- Seq("fecha", "fecha_inicio", "alta_fecha"))
      assert(re.findFirstIn(n).isDefined, s"$n should match")
    for (n <- Seq("fechas", "ts", "fecha2"))
      assert(re.findFirstIn(n).isEmpty, s"$n should not match")
  }

  test("D4: tz-aware -> UTC naive (ingest_runner.py:210-224)") {
    val schema = StructType(Seq(StructField("ts", TimestampType, true)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // session TZ is UTC; a naive Mexico_City noon is 18:00 UTC
    val df = mkDf(schema, Row(ts("2021-01-01 12:00:00")), Row(null))
      .select(toUtcNaive(col("ts"), "America/Mexico_City").cast("string").as("c"))
    assert(col0[String](df) === Seq("2021-01-01 18:00:00", null))
  }

  test("D8: toStartOfDay / toYYYYMM (verify_sql_lab.py:74-76)") {
    val schema = StructType(Seq(StructField("ts", TimestampType, true)))
    val df = mkDf(schema, Row(java.sql.Timestamp.valueOf("2021-03-15 10:11:12")))
      .select(toStartOfDay(col("ts")).cast("string").as("d"), toYYYYMM(col("ts")).as("m"))
    val r = df.collect()(0)
    assert(r.getString(0) === "2021-03-15 00:00:00")
    assert(r.getString(1) === "202103")
  }
}
