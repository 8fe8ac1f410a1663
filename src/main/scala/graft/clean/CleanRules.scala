package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's row-level cleaning/normalization layer (SURVEY.md §2.7)
  * re-expressed as composable, codegen-friendly `Column => Column`
  * transforms — no UDFs in the hot path, so every rule stays inside
  * whole-stage codegen and distributes trivially at 100 TB.
  *
  * Rule numbering follows SURVEY.md §2.7 (D = dates, N = numerics,
  * T = strings/text). Reference citations are into /root/reference/.
  * All parsing uses try_* variants so the rules behave identically under
  * Spark 4's default ANSI mode (invalid input → NULL, never an exception —
  * matching the reference's errors='coerce' pandas semantics).
  */
object CleanRules {

  /** Strings the reference treats as SQL NULL regardless of column type
    * (tools/ingest_runner.py:262-267 dates, :506-574 integers). */
  val nullishStrings: Seq[String] =
    Seq("", "null", "NULL", "None", "none", "nan", "NaN", "na", "NA", "NaT")

  /** MySQL zero-dates (tools/ingest_runner.py:262-267). */
  val zeroDates: Seq[String] = Seq("0000-00-00", "0000-00-00 00:00:00")

  // ---------------------------------------------------------------- dates

  /** D1 — zero-dates / null-ish strings → NULL, before any parse attempt
    * (tools/ingest_runner.py:262-267,459-463,891-895). Input: string col. */
  def nullifyZeroDates(c: Column): Column =
    when(trim(c).isin(zeroDates ++ nullishStrings: _*), lit(null).cast("string"))
      .otherwise(c)

  /** D6 — multi-format best-effort parse (tools/data_cleaner_robust.py:
    * 253-279): ISO datetime[.frac], ISO date, DD/MM/YYYY[ HH:MM:SS],
    * YYYYMMDD[HHMMSS], else NULL. */
  def parseMultiFormat(c: Column): Column = {
    val s = trim(c)
    coalesce(
      try_to_timestamp(s), // yyyy-MM-dd [HH:mm:ss[.S]]
      try_to_timestamp(s, lit("dd/MM/yyyy HH:mm:ss")),
      try_to_timestamp(s, lit("dd/MM/yyyy")),
      try_to_timestamp(s, lit("yyyyMMddHHmmss")),
      try_to_timestamp(s, lit("yyyyMMdd")))
  }

  /** D2/D3 bounds — the single source for every date guard. */
  val usefulYearMin = 1900
  val usefulYearMax = 2100
  val supportedLo = "1970-01-01 00:00:00"
  val supportedHi = "2299-12-31 23:59:59"

  /** D2 — "useful range" guard: year ≤ 1900 or ≥ 2100 → NULL, NULL kept
    * (tools/ingest_runner.py:290-297; golden expectations
    * test_date_processing.py:69-99). Input: timestamp/date col. */
  def nullifyOutOfRangeYears(ts: Column): Column =
    when(year(ts) <= usefulYearMin || year(ts) >= usefulYearMax,
      lit(null).cast("timestamp"))
      .otherwise(ts.cast("timestamp"))

  /** D3 — hard clamp to the target engine's representable range
    * [1970-01-01, 2299-12-31]; outside → NULL (the →NULL variant of
    * tools/ingest_runner.py:807-876; the clamp-to-bounds variant at
    * :833-841 is intentionally not implemented — SURVEY.md §7 picks one). */
  def nullifyOutsideSupportedRange(ts: Column): Column =
    when(ts < to_timestamp(lit(supportedLo)) || ts > to_timestamp(lit(supportedHi)),
      lit(null).cast("timestamp")).otherwise(ts.cast("timestamp"))

  /** D2+D3 as ONE CASE over an already-materialized timestamp attribute —
    * the form TableCleaner's stage 2 applies (nesting the two rules would
    * re-expand the inner guard inside the outer one's branches). */
  def dateRangeGuard(a: Column): Column =
    when(
      year(a) <= usefulYearMin || year(a) >= usefulYearMax ||
        a < to_timestamp(lit(supportedLo)) || a > to_timestamp(lit(supportedHi)),
      lit(null).cast("timestamp")).otherwise(a.cast("timestamp"))

  /** D1+D6+D2 composed: the full string-date ingestion pipeline the
    * reference applies to every MySQL date/datetime column read as string
    * (process_mysql_date_columns, tools/ingest_runner.py:227-305). */
  def cleanDateString(c: Column): Column =
    nullifyOutOfRangeYears(parseMultiFormat(nullifyZeroDates(c)))

  /** D4 — tz-aware → UTC naive (tools/ingest_runner.py:210-224,426-435).
    * `tz` is the source zone of naive inputs; session TZ is already UTC. */
  def toUtcNaive(ts: Column, tz: String): Column = to_utc_timestamp(ts, tz)

  /** D5 — MySQL TIME / pandas timedelta repr → "HH:MM:SS" string,
    * including "0 days 12:02:03" → "12:02:03"
    * (tools/ingest_runner.py:380-405). Unparseable → NULL. */
  /** D5 split into the staged pair TableCleaner uses: one extraction
    * (group 1 = the H:MM:SS slice, fraction dropped), then null-guard +
    * zero-pad (padding the whole slice to 8 chars ≡ lpad of the hour
    * field). NULL input stays NULL (regexp_extract propagates it). */
  def timeHmsExtract(c: Column): Column =
    regexp_extract(trim(c), "(\\d{1,2}:\\d{2}:\\d{2})(?:\\.\\d+)?$", 1)
  def timeHmsFinish(a: Column): Column =
    when(a.isNull || a === "", lit(null).cast("string"))
      .otherwise(lpad(a, 8, "0"))

  def timeToHms(c: Column): Column = timeHmsFinish(timeHmsExtract(c))

  /** D7 — view-layer date helper for string columns whose NAME matches the
    * fecha regex (tools/generate_analytics_views.py:83-143): best-effort
    * ISO parse, else DD-MM-YYYY slice re-assembly, else NULL. */
  def stringDateHelper(c: Column): Column =
    coalesce(
      try_to_timestamp(trim(c)).cast("date"),
      try_to_timestamp(trim(c), lit("dd-MM-yyyy")).cast("date"))

  /** Column NAME pattern that triggers D7 in the view generator
    * (tools/generate_analytics_views.py:96). */
  val fechaNameRegex = "(^fecha$)|(^fecha_.*)|(.*_fecha$)"

  /** D8 — BI date bucketing (superset_bootstrap/verify_sql_lab.py:74-76). */
  def toStartOfDay(c: Column): Column = date_trunc("day", c)
  def toYYYYMM(c: Column): Column = date_format(c, "yyyyMM")

  // ------------------------------------------------------------- numerics

  /** N1 — integer cleaning (tools/ingest_runner.py:506-574
    * clean_integer_column): null-ish strings → NULL; "123.0" → 123;
    * non-integral or unparseable → NULL; if the column is PK/NOT-NULL,
    * NULL → 0. Works on any input type via string round-trip.
    *
    * Documented improvement over the reference: pure-integer strings cast
    * DIRECTLY to bigint, so values beyond 2^53 keep full precision — the
    * reference's `int(float(s))` (and a naive double round-trip) silently
    * corrupts them. The double path is only the fallback for float-repr
    * inputs like "123.0" / "1e4". */
  def cleanInteger(c: Column, required: Boolean = false): Column = {
    val s = trim(c.cast("string"))
    val pre = when(c.isNull || s.isin(nullishStrings: _*), lit(null).cast("string")).otherwise(s)
    // direct path ONLY for pure-integer strings: engines disagree on
    // decimal-string → int casts (Spark truncates, DuckDB rounds)
    val direct = when(pre.rlike("^[+-]?[0-9]+$"), pre.try_cast("bigint"))
    val d = pre.try_cast("double")
    val viaDouble = when(d.isNull || isnan(d), lit(null).cast("bigint"))
      .when(d =!= floor(d), lit(null).cast("bigint"))
      .otherwise(d.try_cast("bigint"))
    val asLong = coalesce(direct, viaDouble)
    if (required) coalesce(asLong, lit(0L)) else asLong
  }

  /** N2 — Int32 range guard: out-of-range → NULL
    * (tools/ingest_runner.py:916-919,944-947). */
  def int32RangeGuard(c: Column): Column =
    when(c < Int.MinValue.toLong || c > Int.MaxValue.toLong, lit(null)).otherwise(c)

  /** N3 — clamp to explicit numeric bounds, below min → min, above max →
    * max, NULL preserved (tools/data_cleaner_robust.py:54-65,161-202). */
  def rangeClamp(c: Column, min: Double, max: Double): Column =
    when(c.isNull, c).otherwise(greatest(least(c, lit(max)), lit(min)))

  /** N4 — NaN/±Inf → NULL (tools/ingest_runner.py:764-992 `cell`). */
  def nanInfToNull(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity,
      lit(null).cast("double")).otherwise(c)

  /** N6 — bool → int (tools/ingest_runner.py:909-910,976-977). */
  def boolToInt(c: Column): Column = c.cast("int")

  /** N7 — auto-inference for untyped string columns: parses as integer when
    * every non-null value is integral, as double when numeric, else keeps
    * the string (tools/ingest_runner.py:658-685 is majority-vote over a
    * pandas column; per-row coalesce is the distributable equivalent). */
  def inferNumeric(c: Column): Column =
    coalesce(cleanInteger(c).cast("string"), trim(c).try_cast("double").cast("string"), c)

  // ------------------------------------------------------- strings / text

  /** T1 — mojibake repair (tools/ingest_runner.py:308-341
    * fix_encoding_issues): the observed '??' pattern, then the UTF-8-read-
    * as-latin1 pair table. The byte-level latin1→utf8 re-decode retry is
    * graft.functions.RepairEncoding (custom expression); this is the
    * pure-builtin part. */
  def repairMojibake(c: Column): Column = {
    val specific = regexp_replace(c, "Actualizaci\\?\\?n", "Actualización")
    val qq = regexp_replace(specific, "\\?\\?", "ó")
    val chain = Seq("Ã¡" -> "á", "Ã©" -> "é", "Ã­" -> "í", "Ã³" -> "ó", "Ãº" -> "ú", "Ã±" -> "ñ")
      .foldLeft(qq) { case (acc, (broken, fixed)) =>
        regexp_replace(acc, broken, fixed)
      }
    // guard: one cheap rlike skips the 8-regex chain for the overwhelming
    // majority of clean rows (identity on non-matching input, so
    // semantics — and the oracle SQL — are unchanged)
    when(c.rlike("(\\?\\?)|Ã"), chain).otherwise(c)
  }

  /** T2 — strip C0/C1 control characters
    * (tools/data_cleaner_robust.py:32-123). */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]", "")

  /** T3 — whitespace normalization: CR/LF/TAB runs → space, multi-space →
    * single, trim; empty → NULL (tools/data_cleaner_robust.py:125-159;
    * empty-string→NULL tools/ingest_runner.py:786-787). */
  def normalizeWhitespace(c: Column): Column =
    // single \s+ pass ≡ the reference's two-step ([\r\n\t]+→' ' then
    // multi-space collapse). nullif (not when/otherwise) so the collapsed
    // expression is evaluated ONCE — a when(x==="",null).otherwise(x)
    // re-evaluates the whole upstream chain per reference, which
    // multiplies regex cost when rules compose (see cleanString).
    nullif(trim(regexp_replace(c, "\\s+", " ")), lit(""))

  /** T4 — NOT NULL defaults driven by reflected schema metadata
    * (tools/ingest_runner.py:637-655): plain NOT NULL string → 'N/A',
    * PK string → 'default_<col>_pk'. */
  def notNullStringDefault(c: Column): Column = coalesce(c, lit("N/A"))
  def pkStringDefault(c: Column, colName: String): Column =
    coalesce(c, lit(s"default_${colName}_pk"))

  /** T5 — bytes → UTF-8 string / base64 round-trip (Debezium
    * binary.handling.mode=base64, tools/gen_pipeline.py:121;
    * tools/ingest_runner.py:897-902). */
  def bytesToUtf8(c: Column): Column = decode(c, "UTF-8")
  def toBase64(c: Column): Column = base64(c)
  def fromBase64(c: Column): Column = unbase64(c)

  /** Single-scan probe matching exactly the rows the T1-T3 pipeline would
    * modify: control chars (incl. \t\n\r\f\x0b — every non-space member of
    * Java's ASCII \s), mojibake markers, a whitespace run, or edge
    * whitespace. A row it does NOT match passes repairMojibake,
    * stripControlChars, and `\s+`→" "+trim unchanged (only single interior
    * spaces remain), so the fast path below is identity-equal. */
  private val dirtyStringProbe =
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f\\t\\n\\r]|\\?\\?|Ã|\\s\\s|^\\s|\\s$"

  /** Full string-cleaning pipeline the reference applies to every textual
    * column, with NOT-NULL/PK defaults applied last.
    *
    * Composition order: mojibake FIRST so its three input references
    * (guard + chain + passthrough) hit the cheap raw attribute, not a
    * nested regex chain; control-strip and whitespace-normalize then each
    * reference their input exactly once. Equivalent to the reference's
    * order (the rule families touch disjoint character classes).
    *
    * Hot path: clean rows are the overwhelming majority of a 100 TB
    * corpus, and three regex scans per string cell dominated ingest cost
    * (6x the parquet write for lineitem at sf0.1). One probe scan decides;
    * dirty rows (rare) pay the full pipeline. */
  def cleanString(c: Column): Column = nullif(cleanStringCore(c), lit(""))

  /** cleanString WITHOUT the final empty→NULL (which references its input
    * twice): the stage-1 expression TableCleaner materializes so the
    * probe + repair chain is generated and evaluated exactly once. */
  def cleanStringCore(c: Column): Column =
    when(c.rlike(dirtyStringProbe),
      trim(regexp_replace(stripControlChars(repairMojibake(c)), "\\s+", " ")))
      .otherwise(c)
}
