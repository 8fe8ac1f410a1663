package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.analysis.{MultiInstanceRelation, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.optimizer.{CollapseProject, ColumnPruning, PushDownPredicates, RemoveNoopOperators}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{NumericType, StructType}

import graft.ingest.ManifestCommit
import graft.ingest.ManifestCommit.Manifest

/** SQL surface for manifest-committed (graft) tables: `spark.sql`
  * queries reference them as `graft`.`<name>` after [[GraftSql.register]]
  * (or `graft`.`/abs/table/root` ad hoc), with optional time travel via
  * a `@v<gen>` suffix — `SELECT * FROM graft.`orders@v3``.
  *
  * The reference exposes every table through a SQL endpoint (Superset /
  * ClickHouse HTTP — reference: superset_bootstrap/datasets.yaml and
  * the tools/sql_objects DDL scripts); here the same surface rides Spark's own
  * analyzer/optimizer through two injected rules instead of a copy of
  * the DataFrame plumbing:
  *
  *  - [[GraftResolveRelations]] (analyzer): resolves the identifier to a
  *    [[GraftRelation]] leaf pinned to ONE manifest generation — every
  *    query reads a consistent snapshot even under concurrent writers,
  *    and the whole relational planner (filter pushdown, column pruning,
  *    join planning, AQE) operates on it like any other relation.
  *  - [[GraftDataSkipping]] (pre-CBO optimizer): expands the leaf into
  *    the DV-aware manifest read, AFTER Catalyst has pushed filters down
  *    to it — so the expansion consults the manifest's per-dir min/max
  *    stats and bloom side files and plans ONLY the dirs the predicate
  *    can touch (the SQL path gets the same data skipping the
  *    programmatic `readPruned`/`readBloom` callers get), and answers
  *    bare `COUNT(*)` from manifest pseudo-stats with zero Spark jobs.
  *
  * Scale: resolution reads only the manifest (O(1) pointer + cached
  * delta-log records); skipping decisions are driver-side over in-memory
  * stats; the expanded plan is ordinary parquet relations, so a 1000-
  * executor cluster sees pruned file scans with pushed filters — no
  * extra shuffle, no driver data path. */
object GraftSql {
  /** registry: lowercase logical name -> table root. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(name: String, root: String): Unit = {
    require(!name.contains("@"), s"table name may not contain '@': $name")
    registry.put(name.toLowerCase(java.util.Locale.ROOT), root); ()
  }

  def unregister(name: String): Unit = {
    registry.remove(name.toLowerCase(java.util.Locale.ROOT)); ()
  }

  private val AtGen = "^(.*)@v([0-9]+)$".r

  /** Resolve `<name>` / `<name>@v<gen>` / `/abs/path[@v<gen>]` to
    * (root, pinned generation). */
  private[sql] def lookup(name: String): Option[(String, Option[Long])] = {
    val (base, gen) = name match {
      case AtGen(b, g) => (b, Some(g.toLong))
      case _ => (name, None)
    }
    Option(registry.get(base.toLowerCase(java.util.Locale.ROOT)))
      .orElse(if (base.startsWith("/")) Some(base) else None)
      .map(root => (root, gen))
  }
}

/** Analysis-time leaf for a graft table, pinned to the manifest
  * generation resolved when the query was analyzed (snapshot-consistent
  * reads under concurrent commits — the Delta/Iceberg scan-pinning
  * idea). Expanded to the physical read by [[GraftDataSkipping]]. */
case class GraftRelation(root: String, manifest: Manifest,
    readSchema: StructType, override val output: Seq[AttributeReference],
    timeTraveled: Boolean = false)
  extends LeafNode with MultiInstanceRelation {

  override def newInstance(): GraftRelation =
    copy(output = output.map(_.newInstance()))

  /** Manifest row counts feed the planner BEFORE expansion (join-order /
    * broadcast heuristics that consult logical stats must not see the
    * unknown-size default when the manifest knows better). */
  override def computeStats(): Statistics = {
    val rows = ManifestCommit.tableRowCountOf(manifest)
    val width = output.map(_.dataType.defaultSize).sum.max(1)
    Statistics(
      sizeInBytes = rows.map(n => BigInt(n) * width)
        .getOrElse(BigInt(conf.defaultSizeInBytes)),
      rowCount = rows.map(BigInt(_)))
  }

  override def simpleString(maxFields: Int): String =
    s"GraftRelation $root gen=${manifest.gen} dirs=${manifest.dirs.size}"
}

/** Analyzer rule: `graft`.`<name>` → [[GraftRelation]]. */
case class GraftResolveRelations(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def isGraftRef(u: UnresolvedRelation): Boolean =
    !u.isStreaming && u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
      GraftSql.lookup(u.multipartIdentifier(1)).isDefined

  private def resolveGraft(name: String): GraftRelation = {
    val (root, gen) = GraftSql.lookup(name).get
    val m = (gen match {
      case Some(g) => ManifestCommit.readManifestAt(spark, root, g)
      case None => ManifestCommit.readManifest(spark, root)
    }).getOrElse(throw new IllegalArgumentException(
      s"graft.$name: no manifest at $root" +
        gen.map(g => s" for generation $g").getOrElse("")))
    // Recorded schema = zero-I/O resolution; a pre-evolution table
    // without one pays a one-time footer-merge read here (documented
    // slow path, same as readDirsOf's own fallback).
    val schema0 = m.tableSchema.getOrElse(
      ManifestCommit.readDirsOf(spark, root, m, m.dirs).schema)
    // file-source reads are nullable-at-read regardless of the
    // written schema; declaring anything non-null here would let the
    // optimizer fold predicates the data can violate
    val readSchema = StructType(schema0.fields.map(_.copy(nullable = true)))
    val out = readSchema.fields.toIndexedSeq
      .map(f => AttributeReference(f.name, f.dataType, nullable = true)())
    GraftRelation(root, m, readSchema, out, timeTraveled = gen.isDefined)
  }

  /** `<name>#history` / `<name>#files` — the metadata-table idea
    * (Iceberg's `db.table.history`, Delta's DESCRIBE HISTORY/DETAIL):
    * commit provenance and per-dir file metadata queryable as ordinary
    * relations. Both are manifest-only driver builds — zero data I/O. */
  private val MetaRef = "^(.*)#(history|files)$".r

  private def metaRelation(base: String, kind: String): LogicalPlan = {
    val (root, gen) = GraftSql.lookup(base).get
    require(gen.isEmpty, s"graft.$base#$kind: metadata tables are not time-travelable")
    val df = kind match {
      case "history" => ManifestCommit.history(spark, root)
      case "files" =>
        val m = ManifestCommit.readManifest(spark, root).getOrElse(
          throw new IllegalArgumentException(s"graft.$base: no manifest at $root"))
        def stat(d: String, c: String): Option[Long] =
          m.stats.getOrElse(d, Nil).find(_.col == c).map(_.min.toLong)
        val rows = m.dirs.map { d =>
          org.apache.spark.sql.Row(
            d,
            stat(d, ManifestCommit.RowCountStat).map(Long.box).orNull,
            m.dvs.get(d).orNull,
            m.stats.getOrElse(d, Nil)
              .filterNot(s => ManifestCommit.PseudoStats(s.col))
              .map(s => s.col -> s"[${s.min}, ${s.max}]").toMap)
        }
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            java.util.Arrays.asList(rows: _*)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("dir",
              org.apache.spark.sql.types.StringType, false),
            org.apache.spark.sql.types.StructField("rows",
              org.apache.spark.sql.types.LongType, true),
            org.apache.spark.sql.types.StructField("dv",
              org.apache.spark.sql.types.StringType, true),
            org.apache.spark.sql.types.StructField("stats",
              org.apache.spark.sql.types.MapType(
                org.apache.spark.sql.types.StringType,
                org.apache.spark.sql.types.StringType), true))))
    }
    df.queryExecution.analyzed
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming &&
          u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          (u.multipartIdentifier(1) match {
            case MetaRef(base, _) => GraftSql.lookup(base).isDefined
            case _ => false
          }) =>
        val MetaRef(base, kind) = u.multipartIdentifier(1)
        SubqueryAlias(base.takeWhile(_ != '@'), metaRelation(base, kind))

      case u: UnresolvedRelation if isGraftRef(u) =>
        val name = u.multipartIdentifier(1)
        SubqueryAlias(name.takeWhile(_ != '@'), resolveGraft(name))

      // INSERT INTO / INSERT OVERWRITE graft.<name>. The target is NOT a
      // child of InsertIntoStatement (only `query` is), so it must be
      // resolved here, mirroring how Spark's own ResolveRelations
      // special-cases insert targets. Once the source query is resolved,
      // fold both into a leaf command holding the ALIGNED query (position
      // or BY NAME binding + store-assignment casts, the SQL insert
      // contract). A leaf (query as innerChildren, like Spark's own
      // InsertIntoDataSourceCommand) so the outer optimizer doesn't
      // double-optimize a plan the command re-plans at run().
      case i: InsertIntoStatement if i.query.resolved && (i.table match {
            case u: UnresolvedRelation => isGraftRef(u)
            case _ => false
          }) =>
        val g = resolveGraft(
          i.table.asInstanceOf[UnresolvedRelation].multipartIdentifier(1))
        require(!g.timeTraveled, "graft INSERT: cannot write to a @v time-travel reference")
        require(i.partitionSpec.isEmpty, "graft INSERT: PARTITION spec not supported")
        require(!i.ifPartitionNotExists, "graft INSERT: IF NOT EXISTS not supported")
        require(i.userSpecifiedCols.isEmpty, "graft INSERT: explicit column lists not supported (use BY NAME)")
        val fields = g.readSchema.fields
        def castTo(a: Attribute, f: org.apache.spark.sql.types.StructField): NamedExpression =
          if (a.dataType == f.dataType) Alias(a, f.name)()
          else Alias(Cast(a, f.dataType, Some(conf.sessionLocalTimeZone)), f.name)()
        val aligned: Seq[NamedExpression] =
          if (i.byName) fields.toIndexedSeq.map { f =>
            val a = i.query.output.find(a => conf.resolver(a.name, f.name))
              .getOrElse(throw new IllegalArgumentException(
                s"graft INSERT BY NAME: source query has no column ${f.name}"))
            castTo(a, f)
          } else {
            require(i.query.output.size == fields.length,
              s"graft INSERT: query provides ${i.query.output.size} columns, " +
                s"table has ${fields.length}")
            i.query.output.zip(fields.toIndexedSeq).map { case (a, f) => castTo(a, f) }
          }
        GraftInsert(g.root, g.readSchema, Project(aligned, i.query), i.overwrite)
    }
}

/** Logical leaf command for `INSERT [OVERWRITE] graft.<name> <query>`:
  * the aligned source query rides as innerChildren (already resolved;
  * re-planned independently at run time), executed by
  * [[GraftInsertExec]] via [[GraftWriteStrategy]]. */
case class GraftInsert(root: String, tableSchema: StructType,
    query: LogicalPlan, overwrite: Boolean) extends LeafCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def simpleString(maxFields: Int): String =
    s"GraftInsert $root overwrite=$overwrite"
}

/** Pre-CBO optimizer rule: expand every [[GraftRelation]] into its
  * DV-aware manifest read — consulting per-dir min/max stats and bloom
  * side files against the filter that Catalyst pushed down onto the
  * leaf, and short-circuiting bare COUNT(*) to manifest pseudo-stats
  * (zero jobs). Runs ONCE, after the operator-optimization fixed point,
  * so predicate pushdown and column pruning have already collapsed the
  * plan to `[Project] > [Filter] > leaf` shapes. */
case class GraftDataSkipping(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  /** Probing bloom side files is one filesystem round-trip per kept dir;
    * past this many dirs the probe costs more driver latency than the
    * scan it might save, and min/max pruning has already had its say. */
  private val BloomProbeMaxDirs = 1024

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if metadataCount(agg).isDefined =>
      metadataCount(agg).get
    case Project(ps, Filter(cond, g: GraftRelation)) if ps.forall(_.deterministic) =>
      localOptimize(Project(ps, Filter(cond, expand(g, keptDirs(cond, g)))))
    case Filter(cond, g: GraftRelation) =>
      localOptimize(Filter(cond, expand(g, keptDirs(cond, g))))
    case Project(ps, g: GraftRelation) if ps.forall(_.deterministic) =>
      localOptimize(Project(ps, expand(g, g.manifest.dirs)))
    case g: GraftRelation =>
      expand(g, g.manifest.dirs)
  }

  /** Build the real read plan over `dirs` and re-bind it to the leaf's
    * attribute ids positionally (readSchema fixes the column order, so
    * position is exact). A fresh plan per expansion keeps expression ids
    * unique when one table appears several times in a query. */
  private def expand(g: GraftRelation, dirs: Seq[String]): LogicalPlan = {
    val df = ManifestCommit.readDirsOf(spark, g.root, g.manifest, dirs,
      schemaOverride = Some(g.readSchema))
    // the fresh analyzed subtree may carry ResolvedHint (readDirsOf
    // broadcasts DV key sets); the optimizer's hint-normalization batch
    // already ran, so fold hints into join nodes here or the planner
    // rejects the plan
    val inner = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      df.queryExecution.analyzed)
    require(inner.output.length == g.output.length,
      s"graft expansion arity mismatch at ${g.root}: " +
        s"${inner.output.length} vs ${g.output.length}")
    Project(g.output.zip(inner.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId)
    }, inner)
  }

  /** The expansion happens after Catalyst's own pushdown batch already
    * ran, so re-run the four rules that matter LOCALLY on the expanded
    * subtree: pushes the surviving filter through the re-bind Project
    * (and through the DV anti-join's left side) into the parquet
    * relations, and prunes their read schema — `.explain` shows
    * PushedFilters/ReadSchema exactly as the programmatic path does. */
  private val cleanup: Seq[Rule[LogicalPlan]] =
    Seq(PushDownPredicates, ColumnPruning, CollapseProject, RemoveNoopOperators)

  private def localOptimize(p0: LogicalPlan): LogicalPlan = {
    var p = p0
    var i = 0
    var changed = true
    while (changed && i < 20) {
      val next = cleanup.foldLeft(p)((q, r) => r(q))
      changed = !next.fastEquals(p)
      p = next
      i += 1
    }
    p
  }

  /** Dirs the pushed-down filter can touch, per the pinned manifest:
    * min/max stats prune range/equality conjuncts; bloom side files
    * additionally prune point lookups. Conservative by construction —
    * unparseable conjuncts contribute nothing, stat-less dirs are kept,
    * and the full filter still runs on what's read. */
  private def keptDirs(cond: Expression, g: GraftRelation): Seq[String] = {
    val m = g.manifest
    val byId = g.output.map(a => a.exprId -> a.name).toMap
    def colOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => byId.get(a.exprId)
      case _ => None
    }
    def toScala(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    def render(l: Literal): Option[String] =
      if (l.value == null) None
      else Some(ManifestCommit.renderBound(toScala(l)))

    val bounds = scala.collection.mutable.ArrayBuffer
      .empty[(String, Option[String], Option[String])]
    val points = scala.collection.mutable.ArrayBuffer.empty[(String, Any)]

    def lo(c: Option[String], l: Literal): Unit =
      c.foreach(cc => render(l).foreach(v => bounds += ((cc, Some(v), None))))
    def hi(c: Option[String], l: Literal): Unit =
      c.foreach(cc => render(l).foreach(v => bounds += ((cc, None, Some(v)))))
    def eq(c: Option[String], l: Literal): Unit = c.foreach { cc =>
      render(l).foreach(v => bounds += ((cc, Some(v), Some(v))))
      toScala(l) match {
        case v @ (_: Long | _: Int | _: Short | _: Byte | _: String) =>
          points += ((cc, v))
        case _ => ()
      }
    }

    splitConjunctivePredicates(cond).foreach {
      case EqualTo(a, l: Literal) => eq(colOf(a), l)
      case EqualTo(l: Literal, a) => eq(colOf(a), l)
      case EqualNullSafe(a, l: Literal) if l.value != null => eq(colOf(a), l)
      case EqualNullSafe(l: Literal, a) if l.value != null => eq(colOf(a), l)
      case GreaterThanOrEqual(a, l: Literal) => lo(colOf(a), l)
      case GreaterThan(a, l: Literal) => lo(colOf(a), l)
      case LessThanOrEqual(a, l: Literal) => hi(colOf(a), l)
      case LessThan(a, l: Literal) => hi(colOf(a), l)
      case GreaterThanOrEqual(l: Literal, a) => hi(colOf(a), l)
      case GreaterThan(l: Literal, a) => hi(colOf(a), l)
      case LessThanOrEqual(l: Literal, a) => lo(colOf(a), l)
      case LessThan(l: Literal, a) => lo(colOf(a), l)
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        colOf(a).foreach { cc =>
          val lits = vs.map(_.asInstanceOf[Literal])
          val rendered = lits.map(render)
          if (rendered.forall(_.isDefined)) {
            // bound the IN-list by its min/max in the STATS ordering
            // (numeric compare for numeric columns, else string)
            val rs = rendered.flatten
            val numeric = a.dataType.isInstanceOf[NumericType]
            val ordered =
              if (numeric) rs.sortBy(new java.math.BigDecimal(_))
              else rs.sorted
            bounds += ((cc, Some(ordered.head), Some(ordered.last)))
          }
        }
      case _ => ()
    }

    var kept = ManifestCommit.prunedDirsOf(m, bounds.toSeq)
    points.foreach { case (c, v) =>
      if (kept.nonEmpty && kept.size <= BloomProbeMaxDirs) {
        val hit = ManifestCommit.bloomDirsOf(spark, g.root, m, c, v).toSet
        kept = kept.filter(hit)
      }
    }
    kept
  }

  /** `SELECT count(*) FROM graft.t` (no filter, no grouping) answered
    * from manifest pseudo-stats — zero Spark jobs, zero data I/O; the
    * SQL face of [[ManifestCommit.tableRowCountOf]]. None (→ ordinary
    * expansion) when any live dir lacks the row-count stat or carries a
    * pre-counter deletion vector. */
  private def metadataCount(agg: Aggregate): Option[LogicalPlan] = {
    if (agg.groupingExpressions.nonEmpty) return None
    val g = agg.child match {
      case gr: GraftRelation => gr
      case Project(ps, gr: GraftRelation) if ps.forall(_.deterministic) => gr
      case _ => return None
    }
    def isCountStar(ae: AggregateExpression): Boolean =
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case c: Count => c.children match {
          case Seq(l: Literal) => l.value != null
          case _ => false
        }
        case _ => false
      })
    val countShaped = agg.aggregateExpressions.forall {
      case Alias(ae: AggregateExpression, _) => isCountStar(ae)
      case _ => false
    }
    if (!countShaped || agg.aggregateExpressions.isEmpty) return None
    ManifestCommit.tableRowCountOf(g.manifest).map { n =>
      LocalRelation(agg.output,
        Seq(InternalRow.fromSeq(agg.aggregateExpressions.map(_ => n))))
    }
  }
}
