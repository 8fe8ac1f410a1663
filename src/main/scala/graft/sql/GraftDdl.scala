package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{DataType, StructType}

/** Parse-time conversion of graft DDL. DDL must be claimed AT PARSE time
  * rather than by an injected analyzer rule: `ResolveSessionCatalog` runs
  * before custom resolution rules within each analyzer iteration and
  * converts `CreateTable`/`DropTable` into session-catalog v1 commands
  * (rejecting transforms like `months()` that v1 tables don't support)
  * before any injected rule can see them. Wrapping the parser —
  * `injectParser`, the public extension point Delta uses for its own DDL
  * — hands us the statement first; everything that is not graft DDL
  * delegates untouched. */
case class GraftSqlParser(spark: org.apache.spark.sql.SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    // OPTIMIZE / VACUUM are not in Spark's grammar at all (the delegate
    // would raise a ParseException) — recognized on the statement text,
    // the same route Delta's parser takes for its OPTIMIZE/VACUUM
    GraftDdl.parseMaintenance(spark, sqlText).getOrElse {
      val plan = delegate.parsePlan(sqlText)
      GraftDdl.convert(spark, plan).getOrElse(plan)
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftDdl {

  // OPTIMIZE graft.<name-or-`quoted`> [WHERE <pred>]
  //   [ZORDER BY (c1, c2[, c3]) [RANKED]] — RANKED swaps linear min/max
  //   z-scaling for per-dimension rank bucketing (skew-robust)
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+graft\.(`[^`]+`|[\w.]+)\s*(?:WHERE\s+(.+?)\s*)??""" +
      """(?:ZORDER\s+BY\s*\(\s*([\w`,\s.]+?)\s*\)\s*(RANKED)?)?\s*;?\s*""").r
  // VACUUM graft.<name> [RETAIN <n> GENERATIONS | RETAIN <n> HOURS] [DRY RUN]
  private val VacuumRe =
    """(?is)\s*VACUUM\s+graft\.(`[^`]+`|[\w.]+)\s*(?:RETAIN\s+(\d+)\s+(GENERATIONS|HOURS))?\s*(DRY\s+RUN)?\s*;?\s*""".r
  // RESTORE [TABLE] graft.<name> TO VERSION AS OF <n> | TO TIMESTAMP AS OF '<ts>'
  private val RestoreRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?graft\.(`[^`]+`|[\w.]+)\s+TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(?:'([^']*)'|([^\s;]+))\s*;?\s*""".r
  // CREATE TABLE [IF NOT EXISTS] graft.<new> SHALLOW|DEEP CLONE
  //   graft.<src> [VERSION|TIMESTAMP AS OF ...] [LOCATION '<path>'] —
  //   not in Spark's grammar; recognized on the statement text, the
  //   Delta-parser route. DEEP = shallow clone + materializeExternal
  //   (byte-copies of the referenced dirs, no source dependency left).
  private val CloneRe =
    ("""(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?graft\.(`[^`]+`|[\w.]+)""" +
      """\s+(SHALLOW|DEEP)\s+CLONE\s+graft\.(`[^`]+`|[\w.]+)""" +
      """\s*(?:(VERSION|TIMESTAMP)\s+AS\s+OF\s+(?:'([^']*)'|([^\s;]+)))?""" +
      """\s*(?:LOCATION\s+'([^']+)')?\s*;?\s*""").r

  // CONVERT TO GRAFT parquet.`/path` [AS graft.<name>] [STATS (c1, c2)]
  //   — the Delta CONVERT TO DELTA shape on the text route; STATS names
  //   the columns to meter per-dir min/max for (row counter always on)
  private val ConvertRe =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+parquet\.`([^`]+)`""" +
      """\s*(?:AS\s+graft\.(`[^`]+`|[\w.]+))?""" +
      """\s*(?:STATS\s*\(\s*([\w`,\s.]+?)\s*\))?\s*;?\s*""").r

  // ALTER TABLE graft.<name> SET PARTITIONED BY (<transform>[, ...]) /
  //   ALTER TABLE graft.<name> DROP PARTITIONING — partition evolution
  //   (the Iceberg partition-spec-evolution idea) on the text route:
  //   Spark's grammar has no ALTER ... PARTITIONED BY
  private val SetPartitionRe =
    ("""(?is)\s*ALTER\s+TABLE\s+graft\.(`[^`]+`|[\w.]+)""" +
      """\s+SET\s+PARTITIONED\s+BY\s*\(\s*(.+?)\s*\)\s*;?\s*""").r
  private val DropPartitionRe =
    """(?is)\s*ALTER\s+TABLE\s+graft\.(`[^`]+`|[\w.]+)\s+DROP\s+PARTITIONING\s*;?\s*""".r

  // INSERT INTO graft.<name> REPLACE WHERE <pred> <query> — Delta's
  //   replaceWhere on the text route (Spark's INSERT grammar has no
  //   REPLACE WHERE). The reluctant predicate capture ends at the first
  //   query-opening keyword, so the predicate itself may not contain a
  //   subquery — the executor's expr() parse would reject one anyway
  //   (rowOp requires a deterministic, stats-extractable condition).
  //   The query keyword must follow WHITESPACE, not just a word
  //   boundary: `ts_from >= 5` would otherwise split mid-identifier
  //   (pred "ts_", query "from >= 5 …").
  private val ReplaceWhereRe =
    ("""(?is)\s*INSERT\s+INTO\s+graft\.(`[^`]+`|[\w.]+)""" +
      """\s+REPLACE\s+WHERE\s+(.+?)\s+((?:SELECT|VALUES|WITH|TABLE|FROM)\b.*)""").r

  // ANALYZE TABLE graft.<name> COMPUTE STATISTICS [FOR COLUMNS a, b] —
  //   retrofit per-dir stats without rewriting data (claimed before the
  //   delegate: Spark's own ANALYZE would fail resolution on graft.*)
  private val AnalyzeRe =
    ("""(?is)\s*ANALYZE\s+TABLE\s+graft\.(`[^`]+`|[\w.]+)""" +
      """\s+COMPUTE\s+STATISTICS\s*(?:FOR\s+COLUMNS\s+([\w`,\s.]+?))?""" +
      """\s*(?:WITH\s+BLOOMS\s*\(\s*([\w`,\s.]+?)\s*\))?\s*;?\s*""").r

  private def unquote(n: String): String =
    if (n.startsWith("`") && n.endsWith("`")) n.substring(1, n.length - 1) else n

  // the CREATE-side transform vocabulary (TransformBridge.sliceSqlOf),
  // re-parsed from TEXT for the ALTER route
  private val YearsT = """(?i)^years\s*\(\s*(`[^`]+`|[\w.]+)\s*\)$""".r
  private val MonthsT = """(?i)^months\s*\(\s*(`[^`]+`|[\w.]+)\s*\)$""".r
  private val DaysT = """(?i)^days\s*\(\s*(`[^`]+`|[\w.]+)\s*\)$""".r
  private val HoursT = """(?i)^hours\s*\(\s*(`[^`]+`|[\w.]+)\s*\)$""".r
  private val BucketT = """(?i)^bucket\s*\(\s*(\d+)\s*,\s*(`[^`]+`|[\w.]+)\s*\)$""".r
  private val IdentT = """^(`[^`]+`|[\w.]+)$""".r
  private def sliceOfTransformTexts(raw: String): String = {
    val parts = raw.split(',').map(_.trim).filter(_.nonEmpty)
    // bucket(n, c) contains a comma — re-join split fragments whose
    // paren balance is open
    val joined = parts.foldLeft(List.empty[String]) { (acc, p) =>
      acc match {
        case h :: t if h.count(_ == '(') > h.count(_ == ')') =>
          (h + ", " + p) :: t
        case _ => p :: acc
      }
    }.reverse
    val rendered = joined.map {
      case YearsT(c) => s"date_format(${unquote(c)}, 'yyyy')"
      case MonthsT(c) => s"date_format(${unquote(c)}, 'yyyyMM')"
      case DaysT(c) => s"date_format(${unquote(c)}, 'yyyyMMdd')"
      case HoursT(c) => s"date_format(${unquote(c)}, 'yyyyMMddHH')"
      case BucketT(n, c) => s"pmod(hash(${unquote(c)}), $n)"
      case IdentT(c) => unquote(c)
      case other => throw new IllegalArgumentException(
        s"graft SET PARTITIONED BY: unsupported partition transform " +
          s"'$other' (supported: identity, years/months/days/hours(col), " +
          "bucket(n, col))")
    }
    if (rendered.size == 1) rendered.head
    else graft.ingest.ManifestCommit.compositeSlice(rendered)
  }

  /** The maintenance verbs Spark's grammar lacks, recognized on the raw
    * statement text: `OPTIMIZE graft.t` (fold small dirs), `OPTIMIZE
    * graft.t ZORDER BY (a, b)` (multi-dimensional re-layout), `VACUUM
    * graft.t RETAIN n GENERATIONS|HOURS` (snapshot retention + orphan
    * reclaim). Only statements addressed at `graft.` are claimed. */
  def parseMaintenance(spark: org.apache.spark.sql.SparkSession,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case CloneRe(ifNot, dst, depth, src, kind, quoted, bare, loc) =>
      val dstName = unquote(dst)
      val (srcRoot, srcGen) = GraftSql.lookup(unquote(src)).getOrElse(
        throw new IllegalArgumentException(
          s"graft SHALLOW CLONE: ${unquote(src)} is not a registered graft table"))
      require(srcGen.isEmpty,
        "graft SHALLOW CLONE: pin the source generation with VERSION AS OF, not @v")
      val (version, tsRaw) = Option(kind).map(_.toUpperCase(
          java.util.Locale.ROOT)) match {
        case Some("VERSION") =>
          val v = Option(quoted).getOrElse(bare)
          (Some(scala.util.Try(v.trim.toLong).getOrElse(
            throw new IllegalArgumentException(
              s"graft SHALLOW CLONE: expected a generation number, got '$v'"))),
            None)
        case Some(_) => (None, Some(Option(quoted).getOrElse(bare)))
        case None => (None, None)
      }
      val dstRoot = Option(loc).getOrElse {
        val wh = spark.sessionState.conf.getConf(
          org.apache.spark.sql.internal.StaticSQLConf.WAREHOUSE_PATH)
        s"${wh.stripSuffix("/")}/graft.db/${dstName.toLowerCase(java.util.Locale.ROOT)}"
      }
      Some(GraftShallowClone(dstRoot, dstName, srcRoot, version, tsRaw,
        ifNot != null, deep = depth.equalsIgnoreCase("DEEP")))
    case ConvertRe(path, name, stats) =>
      val statCols = Option(stats).map(_.split(",").toSeq
        .map(c => unquote(c.trim)).filter(_.nonEmpty)).getOrElse(Nil)
      Some(GraftConvert(path, Option(name).map(unquote), statCols))
    case ReplaceWhereRe(name, pred, query) =>
      val (root, gen) = GraftSql.lookup(unquote(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft REPLACE WHERE: ${unquote(name)} is not a registered graft table"))
      require(gen.isEmpty,
        "graft REPLACE WHERE: cannot write to a @v time-travel reference")
      Some(GraftReplaceWhere(root, pred.trim, query))
    case AnalyzeRe(name, colsRaw, bloomsRaw) =>
      val (root, gen) = GraftSql.lookup(unquote(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft ANALYZE: ${unquote(name)} is not a registered graft table"))
      require(gen.isEmpty,
        "graft ANALYZE: cannot analyze a @v time-travel reference")
      def split(raw: String) = Option(raw).map(_.split(",").toSeq
        .map(c => unquote(c.trim)).filter(_.nonEmpty)).getOrElse(Nil)
      Some(GraftAnalyze(root, split(colsRaw), split(bloomsRaw)))
    case SetPartitionRe(name, transforms) =>
      val (root, gen) = GraftSql.lookup(unquote(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft SET PARTITIONED BY: ${unquote(name)} is not a " +
            "registered graft table"))
      require(gen.isEmpty,
        "graft SET PARTITIONED BY: cannot alter a @v time-travel reference")
      Some(GraftSetSlice(root, Some(sliceOfTransformTexts(transforms))))
    case DropPartitionRe(name) =>
      val (root, gen) = GraftSql.lookup(unquote(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft DROP PARTITIONING: ${unquote(name)} is not a " +
            "registered graft table"))
      require(gen.isEmpty,
        "graft DROP PARTITIONING: cannot alter a @v time-travel reference")
      Some(GraftSetSlice(root, None))
    case OptimizeRe(name, where, zorder, ranked) =>
      val (root, gen) = GraftSql.lookup(unquote(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft OPTIMIZE: ${unquote(name)} is not a registered graft table"))
      require(gen.isEmpty, "graft OPTIMIZE: cannot optimize a @v time-travel reference")
      val zcols = Option(zorder).map(_.split(",").toSeq
        .map(c => unquote(c.trim)).filter(_.nonEmpty)).getOrElse(Nil)
      Some(GraftOptimize(root, zcols, Option(where).map(_.trim),
        ranked = ranked != null))
    case VacuumRe(name, n, unit, dry) =>
      val (root, gen) = GraftSql.lookup(unquote(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft VACUUM: ${unquote(name)} is not a registered graft table"))
      require(gen.isEmpty, "graft VACUUM: cannot vacuum a @v time-travel reference")
      val (keepLast, maxAgeMs) = (Option(n), Option(unit).map(_.toUpperCase)) match {
        case (Some(k), Some("GENERATIONS")) => (k.toInt, None)
        case (Some(h), Some("HOURS")) => (1, Some(h.toLong * 3600L * 1000L))
        case _ => (2, None) // bare VACUUM: keep the newest 2 generations
      }
      Some(GraftVacuum(root, keepLast, maxAgeMs, dryRun = dry != null))
    case RestoreRe(name, kind, quoted, bare) =>
      val (root, gen) = GraftSql.lookup(unquote(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft RESTORE: ${unquote(name)} is not a registered graft table"))
      require(gen.isEmpty, "graft RESTORE: cannot restore a @v time-travel reference")
      val value = Option(quoted).getOrElse(bare)
      kind.toUpperCase(java.util.Locale.ROOT) match {
        case "VERSION" =>
          val v = scala.util.Try(value.trim.toLong).getOrElse(
            throw new IllegalArgumentException(
              s"graft RESTORE: expected a generation number, got '$value'"))
          Some(GraftRestore(root, Some(v), None))
        case _ =>
          // raw literal carried to execution: resolved there under the
          // SESSION timezone (GraftSql.parseTsMillis), matching what a
          // SELECT ... TIMESTAMP AS OF of the same literal showed
          Some(GraftRestore(root, None, Some(value)))
      }
    case _ => None
  }

  private def graftName(p: LogicalPlan): Option[String] = p match {
    case u: UnresolvedIdentifier
        if u.nameParts.length == 2 && u.nameParts.head.equalsIgnoreCase("graft") =>
      Some(u.nameParts(1))
    case _ => None
  }

  /** Table root: explicit LOCATION, else a managed path under the
    * session warehouse dir (`<warehouse>/graft.db/<name>`). */
  private def rootFor(spark: org.apache.spark.sql.SparkSession,
      name: String, spec: Any): String = {
    val loc = spec match {
      case u: UnresolvedTableSpec => u.location
      case t: TableSpec => t.location
      case _ => None
    }
    loc.getOrElse {
      val wh = spark.sessionState.conf.getConf(
        org.apache.spark.sql.internal.StaticSQLConf.WAREHOUSE_PATH)
      s"${wh.stripSuffix("/")}/graft.db/${name.toLowerCase(java.util.Locale.ROOT)}"
    }
  }

  /** `PARTITIONED BY (<transform>[, <transform>…])` → the manifest
    * slicing expression (SQL text): identity → the column itself;
    * years/months/days/hours → the matching date_format bucket (the
    * reference's toYYYYMM partition key, create_clickhouse_models.py:57);
    * bucket(n, c) → a stable hash modulus. MULTIPLE transforms (the
    * Iceberg multi-transform partition spec, e.g. `(days(ts),
    * bucket(4, domain))`) compose into one expression via
    * [[graft.ingest.ManifestCommit.compositeSlice]] — one dir per
    * distinct (day, bucket) pair, each component pruning independently
    * through its own per-dir stats entry. */
  private def sliceOfTransforms(
      ts: Seq[org.apache.spark.sql.connector.expressions.Transform]): Option[String] =
    ts.map(org.apache.spark.sql.graftbridge.TransformBridge.sliceSqlOf) match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => Some(graft.ingest.ManifestCommit.compositeSlice(many))
    }

  /** Some(converted) when `plan` is graft DDL; None lets the statement
    * flow to Spark's own resolution untouched. */
  def convert(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case ct: CreateTable if graftName(ct.name).isDefined =>
      val name = graftName(ct.name).get
      val schema = StructType(ct.columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
      require(schema.nonEmpty, "graft CREATE: at least one column required")
      Some(GraftCreateTable(rootFor(spark, name, ct.tableSpec), name, schema,
        sliceOfTransforms(ct.partitioning), ct.ignoreIfExists))

    case cta: CreateTableAsSelect if graftName(cta.name).isDefined =>
      val name = graftName(cta.name).get
      // the SELECT is still unresolved at parse time — GraftCtas carries
      // it as innerChildren and the executor re-analyzes it (ofRows), so
      // it may itself reference graft tables
      Some(GraftCtas(rootFor(spark, name, cta.tableSpec), name,
        sliceOfTransforms(cta.partitioning), cta.query, cta.ignoreIfExists))

    case DropTable(u: UnresolvedIdentifier, ifExists, purge)
        if graftName(u).isDefined =>
      require(!purge, "graft DROP TABLE: PURGE is not supported " +
        "(graft tables are external — data stays; use retention/pruneOrphans)")
      Some(GraftDropTable(graftName(u).get, ifExists))

    case TruncateTable(u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable)
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          GraftSql.lookup(u.multipartIdentifier(1)).isDefined =>
      val (root, gen) = GraftSql.lookup(u.multipartIdentifier(1)).get
      require(gen.isEmpty, "graft TRUNCATE: cannot write to a @v time-travel reference")
      Some(GraftTruncate(root))

    case _ => None
  }
}
