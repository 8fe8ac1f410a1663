package graft.clean

import graft.schema.{ColumnMeta, TableMeta}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-metadata-driven whole-table cleaner: the distributed equivalent
  * of the reference's per-chunk pandas pipeline `coerce_datetime_columns →
  * process_mysql_date_columns → normalize_for_clickhouse`
  * (tools/ingest_runner.py:1366-1413), with PK/nullability metadata
  * deciding NULL-vs-default semantics (tools/ingest_runner.py:598-655).
  *
  * Every rule is a Column expression (CleanRules), so the whole pass is a
  * narrow projection: no shuffle, fully codegen'd, scales linearly with
  * input size.
  *
  * The pass is TWO stacked projections, not one. Guard rules are CASE
  * WHENs that reference their input several times (`when(year(x) <= 1900,
  * null).otherwise(x)`), and codegen does not subexpression-eliminate
  * inside conditional branches — one projection would inline the
  * expensive core (multi-format parse, mojibake/regex chain) once per
  * reference, tripling per-row CPU and bloating generated methods past
  * JIT limits. Stage 1 computes each column's expensive core exactly
  * once; stage 2 applies guards/defaults to the now-cheap attribute.
  * CollapseProject leaves the pair alone (its cost model refuses to
  * duplicate non-cheap expressions), so the split survives optimization.
  */
object TableCleaner {

  /** The cleaning rule for one column, split as (stage-1 core expression,
    * stage-2 guard applied to the materialized attribute). `actual` is the
    * column's arrival type: already-typed timestamps skip the 5-format
    * string parse (a large per-row cost at scale) and go straight to the
    * range guards. */
  def cleanColumnStaged(c: Column, meta: ColumnMeta,
      actual: DataType = StringType): (Column, Column => Column) = {
    import CleanRules._
    val t = meta.sourceType.toLowerCase
    if (t.startsWith("date") || t.startsWith("timestamp")) {
      // D1-D3: strings go through zero-date NULLing + multi-format parse
      // (expensive, stage 1); typed arrivals only need the guards.
      val parsed = actual match {
        case TimestampType | TimestampNTZType | DateType => c.cast("timestamp")
        case _ => cleanDateStringOrTyped(c)
      }
      (parsed, a => dateRangeGuard(a))
    } else if (t == "time") {
      // D5: one regex extraction in stage 1; null-guard + zero-pad after
      (timeHmsExtract(c.cast("string")), a => timeHmsFinish(a))
    } else if (t.startsWith("tinyint") && t.contains("(1)") || t == "bool" || t == "boolean") {
      // try_cast: ANSI mode (Spark 4 default) makes plain cast THROW on
      // junk strings — cleaning must coerce, never fail (errors='coerce')
      (c.try_cast("boolean"), identity)
    } else if (Seq("tinyint", "smallint", "int", "integer", "mediumint", "bigint").exists(t.startsWith)) {
      // typed integer arrivals skip the string round-trip entirely —
      // N1's parsing exists for dirty STRING input, not for columns the
      // source already delivers as integers
      val required = meta.isPk || !meta.nullable
      val core = actual match {
        case LongType | IntegerType | ShortType | ByteType =>
          val base = c.cast("bigint")
          if (required) coalesce(base, lit(0L)) else base
        case _ => cleanInteger(c, required)
      }
      if (t.startsWith("bigint")) (core, identity)
      else (core, a => int32RangeGuard(a).cast("int"))
    } else if (Seq("float", "real", "double").exists(t.startsWith)) {
      (c.try_cast("double"), a => nanInfToNull(a))
    } else if (t.startsWith("decimal") || t.startsWith("numeric")) {
      (c, identity) // DecimalType is exact; no string hack needed (SURVEY §1.2 N5)
    } else if (t.startsWith("binary") || t.startsWith("varbinary") || t.endsWith("blob")) {
      (c, identity)
    } else if (t == "array" || t == "map" || t == "struct") {
      (c, identity) // composite columns pass through untouched
    } else {
      // char/varchar/text/enum/set/json: T1-T3 core in stage 1 (probe +
      // repair chain evaluated once), empty→NULL + T4 defaults in stage 2
      val core = cleanStringCore(c.cast("string"))
      val finish: Column => Column = a => {
        val nulled = nullif(a, lit(""))
        if (meta.isPk) pkStringDefault(nulled, meta.name)
        else if (!meta.nullable) notNullStringDefault(nulled)
        else nulled
      }
      (core, finish)
    }
  }

  /** Single-expression form of the rule (tests / ad-hoc single columns).
    * Semantics identical to the staged pair composed. */
  def cleanColumn(c: Column, meta: ColumnMeta,
      actual: DataType = StringType): Column = {
    val (core, finish) = cleanColumnStaged(c, meta, actual)
    finish(core)
  }

  /** Typed timestamps skip the string parse; strings go through D1+D6. */
  private def cleanDateStringOrTyped(c: Column): Column =
    CleanRules.parseMultiFormat(CleanRules.nullifyZeroDates(c.cast("string")))

  /** Apply the full cleaning pass to every column named in `meta`;
    * unlisted columns pass through untouched. */
  def clean(df: DataFrame, meta: TableMeta): DataFrame = {
    val byName = meta.columns.map(c => c.name -> c).toMap
    val actualTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val staged = df.columns.toIndexedSeq.map { name =>
      byName.get(name) match {
        case Some(cm) =>
          val (core, finish) = cleanColumnStaged(col(name), cm, actualTypes(name))
          (core.as(name), finish)
        case None => (col(name), identity[Column] _)
      }
    }
    val mid = df.select(staged.map(_._1): _*)
    mid.select(df.columns.toIndexedSeq.zip(staged).map {
      case (name, (_, finish)) => finish(col(name)).as(name)
    }: _*)
  }
}
