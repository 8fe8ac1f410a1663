package graft.queries

import graft.clean.CleanRules._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The cleaning/normalization layer (SURVEY.md §2.7, D/N/T rules) exposed
  * as oracle-checked queries over inline dirty fixtures (FIXTURES.md §6).
  *
  * Each query builds the fixture with a deterministic VALUES list that the
  * DuckDB oracle reproduces verbatim, applies the Spark-side CleanRules
  * expressions, and the oracle applies the same semantics in portable SQL —
  * so the driver's hash compare certifies rule-for-rule parity. Fixtures
  * ignore the sfDir argument (they are schema fixtures, not scale data).
  */
object Cleaning {

  private def df(s: SparkSession, schema: StructType, rows: Row*): DataFrame =
    s.createDataFrame(new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)

  /** D1+D2+D6 — zero-dates, null-ish strings, multi-format parse, year
    * range guard (ingest_runner.py:262-297; data_cleaner_robust.py:253-279;
    * golden counts test_date_processing.py:69-99). */
  val q20_clean_dates = Q(
    "q20_clean_dates",
    """WITH v(id, ds) AS (VALUES
      |  (1,'2020-05-15'), (2,'0000-00-00'), (3,'0000-00-00 00:00:00'),
      |  (4,''), (5,'NULL'), (6,'None'), (7,'1899-12-31'), (8,'2150-06-01'),
      |  (9,'15/03/2021'), (10,'20210315'), (11,'garbage'), (12,NULL),
      |  (13,'2021-03-15 10:11:12'), (14,'1900-01-01')),
      |p AS (SELECT id, coalesce(
      |    try_cast(trim(ds) AS timestamp),
      |    try_strptime(trim(ds), '%d/%m/%Y %H:%M:%S'),
      |    try_strptime(trim(ds), '%d/%m/%Y'),
      |    try_strptime(trim(ds), '%Y%m%d%H%M%S'),
      |    try_strptime(trim(ds), '%Y%m%d')) AS ts
      |  FROM v)
      |SELECT id, CASE WHEN year(ts) <= 1900 OR year(ts) >= 2100
      |  THEN NULL ELSE ts END AS cleaned
      |FROM p ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false), StructField("ds", StringType, true)))
    val rows = Seq(
      1 -> "2020-05-15", 2 -> "0000-00-00", 3 -> "0000-00-00 00:00:00",
      4 -> "", 5 -> "NULL", 6 -> "None", 7 -> "1899-12-31", 8 -> "2150-06-01",
      9 -> "15/03/2021", 10 -> "20210315", 11 -> "garbage", 12 -> null,
      13 -> "2021-03-15 10:11:12", 14 -> "1900-01-01")
    df(s, schema, rows.map { case (i, d) => Row(i, d) }: _*)
      .select(col("id"), cleanDateString(col("ds")).as("cleaned"))
      .orderBy("id")
  }

  /** D7 — view-layer fecha string helper: ISO parse else DD-MM-YYYY else
    * NULL (generate_analytics_views.py:83-143). */
  val q21_view_date_helper = Q(
    "q21_view_date_helper",
    """WITH v(id, fecha) AS (VALUES
      |  (1,'2021-03-15'), (2,'15-03-2021'), (3,'garbage'), (4,NULL),
      |  (5,'2021-03-15 10:00:00'), (6,'31-12-2020'))
      |SELECT id, coalesce(
      |  cast(try_cast(trim(fecha) AS timestamp) AS date),
      |  cast(try_strptime(trim(fecha), '%d-%m-%Y') AS date)) AS fecha_date
      |FROM v ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false), StructField("fecha", StringType, true)))
    val rows = Seq(1 -> "2021-03-15", 2 -> "15-03-2021", 3 -> "garbage",
      4 -> null, 5 -> "2021-03-15 10:00:00", 6 -> "31-12-2020")
    df(s, schema, rows.map { case (i, d) => Row(i, d) }: _*)
      .select(col("id"), stringDateHelper(col("fecha")).as("fecha_date"))
      .orderBy("id")
  }

  /** D5 — MySQL TIME / timedelta repr → "HH:MM:SS"
    * (ingest_runner.py:380-405). */
  val q22_clean_time = Q(
    "q22_clean_time",
    """WITH v(id, t) AS (VALUES
      |  (1,'0 days 12:02:03'), (2,'12:02:03'), (3,'1:02:03'),
      |  (4,'12:02:03.500000'), (5,'garbage'), (6,NULL), (7,' 23:59:59 ')),
      |m AS (SELECT id, trim(t) AS t FROM v)
      |SELECT id, CASE
      |  WHEN regexp_extract(t, '(\d{1,2}):(\d{2}):(\d{2})(\.\d+)?$', 0) = '' THEN NULL
      |  ELSE lpad(regexp_extract(t, '(\d{1,2}):(\d{2}):(\d{2})(\.\d+)?$', 1), 2, '0')
      |    || ':' || regexp_extract(t, '(\d{1,2}):(\d{2}):(\d{2})(\.\d+)?$', 2)
      |    || ':' || regexp_extract(t, '(\d{1,2}):(\d{2}):(\d{2})(\.\d+)?$', 3)
      |  END AS hms
      |FROM m ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false), StructField("t", StringType, true)))
    val rows = Seq(1 -> "0 days 12:02:03", 2 -> "12:02:03", 3 -> "1:02:03",
      4 -> "12:02:03.500000", 5 -> "garbage", 6 -> null, 7 -> " 23:59:59 ")
    df(s, schema, rows.map { case (i, d) => Row(i, d) }: _*)
      .select(col("id"), timeToHms(col("t")).as("hms"))
      .orderBy("id")
  }

  /** N1+N2 — integer cleaning with PK/NOT-NULL → 0 default and the
    * nullable variant side by side (ingest_runner.py:506-574). */
  val q23_clean_integers = Q(
    "q23_clean_integers",
    """WITH v(id, x) AS (VALUES
      |  (1,'7'), (2,'8.0'), (3,'null'), (4,''), (5,'abc'), (6,'8.5'),
      |  (7,'NaN'), (8,NULL), (9,' 9 '), (10,'2147483648'), (11,'-3'),
      |  (12,'1e4'), (13,'123456789012345678901234567890')),
      |p AS (SELECT id, CASE WHEN x IS NULL OR trim(x) IN
      |    ('','null','NULL','None','none','nan','NaN','na','NA','NaT')
      |    THEN NULL ELSE trim(x) END AS s
      |  FROM v),
      |c AS (SELECT id, coalesce(
      |    CASE WHEN regexp_matches(s, '^[+-]?[0-9]+$')
      |      THEN try_cast(s AS bigint) END,
      |    CASE WHEN try_cast(s AS double) IS NULL OR isnan(try_cast(s AS double))
      |           OR try_cast(s AS double) != floor(try_cast(s AS double))
      |      THEN NULL ELSE try_cast(try_cast(s AS double) AS bigint) END) AS cleaned
      |  FROM p)
      |SELECT id, cleaned, coalesce(cleaned, 0) AS cleaned_required
      |FROM c ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false), StructField("x", StringType, true)))
    val rows = Seq(1 -> "7", 2 -> "8.0", 3 -> "null", 4 -> "", 5 -> "abc",
      6 -> "8.5", 7 -> "NaN", 8 -> null, 9 -> " 9 ", 10 -> "2147483648",
      11 -> "-3", 12 -> "1e4", 13 -> "123456789012345678901234567890")
    df(s, schema, rows.map { case (i, d) => Row(i, d) }: _*)
      .select(col("id"),
        cleanInteger(col("x")).as("cleaned"),
        cleanInteger(col("x"), required = true).as("cleaned_required"))
      .orderBy("id")
  }

  /** N3+N4 — range clamp to explicit bounds and NaN/Inf → NULL
    * (data_cleaner_robust.py:54-65,161-202; ingest_runner.py:764-992). */
  val q24_clean_numeric = Q(
    "q24_clean_numeric",
    """WITH v(id, x, y) AS (VALUES
      |  (1, 1.5::double, 1.5::double),
      |  (2, 1e9::double, 'NaN'::double),
      |  (3, -1e9::double, 'Infinity'::double),
      |  (4, 1000.0::double, '-Infinity'::double),
      |  (5, NULL::double, NULL::double),
      |  (6, -1000.5::double, 0.0::double))
      |SELECT id,
      |  CASE WHEN x IS NULL THEN NULL
      |       ELSE greatest(least(x, 1000.0), -1000.0) END AS clamped,
      |  CASE WHEN isnan(y) OR isinf(y) THEN NULL ELSE y END AS definite
      |FROM v ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false),
      StructField("x", DoubleType, true), StructField("y", DoubleType, true)))
    val rows: Seq[(Int, Any, Any)] = Seq(
      (1, 1.5, 1.5), (2, 1e9, Double.NaN), (3, -1e9, Double.PositiveInfinity),
      (4, 1000.0, Double.NegativeInfinity), (5, null, null), (6, -1000.5, 0.0))
    df(s, schema, rows.map { case (i, x, y) => Row(i, x, y) }: _*)
      .select(col("id"),
        rangeClamp(col("x"), -1000.0, 1000.0).as("clamped"),
        nanInfToNull(col("y")).as("definite"))
      .orderBy("id")
  }

  /** T2+T3 — control-char strip, whitespace collapse, empty → NULL
    * (data_cleaner_robust.py:32-159; ingest_runner.py:786-787). */
  val q25_clean_strings = Q(
    "q25_clean_strings",
    """WITH v(id, st) AS (VALUES
      |  (1, '  a ' || chr(10) || ' b  '), (2, 'tab' || chr(9) || 'here'),
      |  (3, chr(1) || 'bad' || chr(7)), (4, ''), (5, '   '), (6, NULL),
      |  (7, 'ok'), (8, 'a' || chr(13) || chr(10) || 'b')),
      |c AS (SELECT id, trim(regexp_replace(regexp_replace(
      |    regexp_replace(st, '[\x01-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
      |    '[\r\n\t]+', ' ', 'g'), ' {2,}', ' ', 'g')) AS cs
      |  FROM v)
      |SELECT id, CASE WHEN cs = '' THEN NULL ELSE cs END AS cleaned
      |FROM c ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false), StructField("st", StringType, true)))
    val rows = Seq(1 -> "  a \n b  ", 2 -> "tab\there", 3 -> "bad",
      4 -> "", 5 -> "   ", 6 -> null, 7 -> "ok", 8 -> "a\r\nb")
    df(s, schema, rows.map { case (i, d) => Row(i, d) }: _*)
      .select(col("id"),
        normalizeWhitespace(stripControlChars(col("st"))).as("cleaned"))
      .orderBy("id")
  }

  /** T1 — mojibake repair table (ingest_runner.py:308-341). */
  val q26_clean_mojibake = Q(
    "q26_clean_mojibake",
    """WITH v(id, st) AS (VALUES
      |  (1, 'Actualizaci??n'), (2, 'se??or'), (3, 'Ã¡Ã©Ã­Ã³ÃºÃ±'),
      |  (4, 'clean text'), (5, NULL), (6, 'maÃ±ana Ã³ptimo'))
      |SELECT id,
      |  replace(replace(replace(replace(replace(replace(replace(replace(
      |    st, 'Actualizaci??n', 'Actualización'), '??', 'ó'),
      |    'Ã¡', 'á'), 'Ã©', 'é'), 'Ã­', 'í'), 'Ã³', 'ó'), 'Ãº', 'ú'),
      |    'Ã±', 'ñ') AS repaired
      |FROM v ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false), StructField("st", StringType, true)))
    val rows = Seq(1 -> "Actualizaci??n", 2 -> "se??or", 3 -> "Ã¡Ã©Ã­Ã³ÃºÃ±",
      4 -> "clean text", 5 -> null, 6 -> "maÃ±ana Ã³ptimo")
    df(s, schema, rows.map { case (i, d) => Row(i, d) }: _*)
      .select(col("id"), repairMojibake(col("st")).as("repaired"))
      .orderBy("id")
  }

  /** T4+N1 — NOT-NULL/PK defaults from reflected metadata: int PK NULL→0,
    * NOT NULL string → 'N/A', PK string → 'default_<col>_pk'
    * (ingest_runner.py:598-655). */
  val q27_clean_defaults = Q(
    "q27_clean_defaults",
    """WITH v(id_raw, name_raw, code_raw) AS (VALUES
      |  ('1', 'x', 'c1'), (NULL, NULL, NULL), ('3', '', 'c3'),
      |  ('4', '  ', 'c4')),
      |c AS (SELECT
      |    coalesce(try_cast(id_raw AS bigint), 0) AS id,
      |    nullif(trim(coalesce(name_raw, '')), '') AS name_clean,
      |    nullif(trim(coalesce(code_raw, '')), '') AS code_clean
      |  FROM v)
      |SELECT id, coalesce(name_clean, 'N/A') AS name,
      |  coalesce(code_clean, 'default_code_pk') AS code
      |FROM c ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id_raw", StringType, true),
      StructField("name_raw", StringType, true),
      StructField("code_raw", StringType, true)))
    val rows: Seq[(String, String, String)] = Seq(
      ("1", "x", "c1"), (null, null, null), ("3", "", "c3"), ("4", "  ", "c4"))
    df(s, schema, rows.map { case (i, n, c) => Row(i, n, c) }: _*)
      .select(
        cleanInteger(col("id_raw"), required = true).as("id"),
        notNullStringDefault(normalizeWhitespace(col("name_raw"))).as("name"),
        pkStringDefault(normalizeWhitespace(col("code_raw")), "code").as("code"))
      .orderBy("id")
  }

  /** §2.10 — byte-level latin1→utf8 re-decode (custom Catalyst
    * expression graft.functions.RepairEncoding, with codegen) composed
    * with the T1 mojibake table. Not expressible in DuckDB SQL, so the
    * oracle is the GOLDEN expected output for this fixed fixture
    * (derived from ingest_runner.py:308-341 semantics). */
  val q28_repair_encoding = Q(
    "q28_repair_encoding",
    """WITH v(id, repaired, full_t1) AS (VALUES
      |  (1, 'café', 'café'),
      |  (2, 'café', 'café'),
      |  (3, 'plain', 'plain'),
      |  (4, 'mañana óptimo', 'mañana óptimo'),
      |  (5, NULL, NULL),
      |  (6, 'Actualizaci??n', 'Actualización'))
      |SELECT id, repaired, full_t1 FROM v ORDER BY id""".stripMargin) { (s, _) =>
    val schema = StructType(Seq(
      StructField("id", IntegerType, false), StructField("st", StringType, true)))
    val rows = Seq(1 -> "cafÃ©", 2 -> "café", 3 -> "plain",
      4 -> "maÃ±ana Ã³ptimo", 5 -> null, 6 -> "Actualizaci??n")
    val re = graft.functions.columns.repairEncoding(col("st"))
    df(s, schema, rows.map { case (i, d) => Row(i, d) }: _*)
      .select(col("id"), re.as("repaired"), repairMojibake(re).as("full_t1"))
      .orderBy("id")
  }

  val all: Seq[Q] = Seq(
    q20_clean_dates, q21_view_date_helper, q22_clean_time,
    q23_clean_integers, q24_clean_numeric, q25_clean_strings,
    q26_clean_mojibake, q27_clean_defaults, q28_repair_encoding)
}
