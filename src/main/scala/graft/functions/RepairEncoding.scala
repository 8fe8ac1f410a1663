package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

/** Byte-level mojibake repair (§2.10; the reference's latin1→utf8
  * re-decode retry, /root/reference/tools/ingest_runner.py:308-341):
  * if every code point fits in latin-1 AND those bytes form valid UTF-8
  * that differs from the input, the string was UTF-8 mis-read as latin-1 —
  * return the re-decoded form; otherwise return the input unchanged.
  *
  * Exposed three ways, strongest first (SURVEY.md §2.10 preference order):
  * native Catalyst `UnaryExpression` WITH `doGenCode` (stays inside
  * whole-stage codegen — no UDF boundary, null handling for free), the
  * `repair_encoding` SQL function, and `GraftExtensions` for
  * `spark.sql.extensions` injection.
  */
object RepairEncodingUtil {
  /** Static entry point referenced by both eval and generated code. */
  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var i = 0
    while (i < n) { // any code point > 0xFF cannot be a latin-1 mis-read
      if (str.charAt(i) > 0xFF) return s
      i += 1
    }
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) { bytes(i) = str.charAt(i).toByte; i += 1 }
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val repaired = dec.decode(ByteBuffer.wrap(bytes)).toString
      if (repaired == str) s else UTF8String.fromString(repaired)
    } catch {
      case _: CharacterCodingException => s // plain latin-1 text: keep as-is
    }
  }
}

/** Input must be StringType (the `graft.functions.repairEncoding` helper
  * casts for you; SQL callers should cast explicitly). */
case class RepairEncoding(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "repair_encoding"

  override protected def nullSafeEval(input: Any): Any =
    RepairEncodingUtil.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepairEncodingUtil.repair($c)")

  override protected def withNewChildInternal(newChild: Expression): RepairEncoding =
    copy(child = newChild)
}

object GraftFunctions {
  private val repairInfo = new ExpressionInfo(
    classOf[RepairEncoding].getName, "repair_encoding")

  /** Imperative registration for an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("repair_encoding"), repairInfo,
      (args: Seq[Expression]) => RepairEncoding(args.head))
}

/** Optimizer rule: `repair_encoding` is idempotent (its output is either
  * the input or valid repaired UTF-8, which a second pass leaves alone),
  * so nested applications collapse to one — the kind of algebraic rewrite
  * Catalyst can't know about custom expressions without being told.
  * Demonstrates `Rule[LogicalPlan]` injection alongside the expression. */
object CollapseRepairEncoding
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.transformAllExpressions {
      case RepairEncoding(inner @ RepairEncoding(_)) => inner
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("repair_encoding"),
      new ExpressionInfo(classOf[RepairEncoding].getName, "repair_encoding"),
      (args: Seq[Expression]) => RepairEncoding(args.head)))
    ext.injectOptimizerRule(_ => CollapseRepairEncoding)
    // SQL surface for manifest-committed tables: `graft`.`<name>`
    // resolves to a generation-pinned relation, expanded pre-CBO with
    // manifest-stats/bloom data skipping and metadata-only COUNT(*).
    ext.injectResolutionRule(s => graft.sql.GraftResolveRelations(s))
    ext.injectPreCBORule(s => graft.sql.GraftDataSkipping(s))
    ext.injectPlannerStrategy(s => graft.sql.GraftWriteStrategy(s))
    // graft DDL (CREATE/CTAS/DROP/TRUNCATE) is claimed at parse time —
    // the session catalog's resolution would otherwise reject it first
    ext.injectParser((s, delegate) => graft.sql.GraftSqlParser(s, delegate))
    // Native vector math for SQL callers (typed callers use
    // graft.functions.columns). Inputs are coerced to array<double> here
    // — the expressions read raw 8-byte doubles from ArrayData, so an
    // uncast array<float> argument would be reinterpreted, not converted.
    def vec(e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true))
    def foldableInt(args: Seq[Expression], idx: Int, name: String, default: Option[Int] = None): Int =
      if (idx >= args.length)
        default.getOrElse(throw new IllegalArgumentException(
          s"$name: missing argument ${idx + 1}"))
      else args(idx).eval() match {
        // integral types only: a Number catch-all would silently truncate
        // hyperplane_sig(v, 8.9) to 8 instead of rejecting it
        case n: java.lang.Integer => n.intValue()
        case n: java.lang.Long => math.toIntExact(n.longValue())
        case n: java.lang.Short => n.intValue()
        case n: java.lang.Byte => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$name: argument ${idx + 1} must be a foldable integer literal, got $other")
      }
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(vec(args(0)), vec(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("l2_squared"),
      new ExpressionInfo(classOf[L2Squared].getName, "l2_squared"),
      (args: Seq[Expression]) => L2Squared(vec(args(0)), vec(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(vec(args(0)), vec(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "hyperplane_sig"),
      (args: Seq[Expression]) => HyperplaneSignature(vec(args(0)),
        foldableInt(args, 1, "hyperplane_sig"),
        foldableInt(args, 2, "hyperplane_sig", default = Some(0)))))
    // Text-hash natives for pure-SQL dedup pipelines (same expressions the
    // typed Dedup operators use): shingle_hashes(tok, n[, mod32!=0]),
    // minhash_sig(hashes, k) with the engine's canonical universal-hash
    // constants, simhash(hashes, bits). Same coercion discipline as vec():
    // the expressions read UTF8String / 8-byte longs straight from
    // ArrayData, so an uncast array<int> would be misread, not converted.
    def strArr(e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(StringType, containsNull = true))
    def longArr(e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHash(strArr(args(0)),
        foldableInt(args, 1, "shingle_hashes"),
        foldableInt(args, 2, "shingle_hashes", default = Some(0)) != 0)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinhashSig(longArr(args(0)),
        foldableInt(args, 1, "minhash_sig"),
        graft.ops.TextHash.minhashP, graft.ops.TextHash.minhashABase, graft.ops.TextHash.minhashBBase)))
    ext.injectFunction((
      FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (args: Seq[Expression]) => SimHash(longArr(args(0)),
        foldableInt(args, 1, "simhash"))))
    def foldableStr(args: Seq[Expression], idx: Int, name: String): String =
      args(idx).eval() match {
        case s: UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"$name: argument ${idx + 1} must be a foldable string literal, got $other")
      }
    // BPE merge pass for pure-SQL tokenizer pipelines:
    // merge_adjacent_pair(tok, 'left', 'right')
    ext.injectFunction((
      FunctionIdentifier("merge_adjacent_pair"),
      new ExpressionInfo(classOf[MergeAdjacentPair].getName, "merge_adjacent_pair"),
      (args: Seq[Expression]) => MergeAdjacentPair(strArr(args(0)),
        foldableStr(args, 1, "merge_adjacent_pair"),
        foldableStr(args, 2, "merge_adjacent_pair"))))
    // deterministic plane projection: plane_projection(v, k, dim)
    ext.injectFunction((
      FunctionIdentifier("plane_projection"),
      new ExpressionInfo(classOf[PlaneProjection].getName, "plane_projection"),
      (args: Seq[Expression]) => PlaneProjection(vec(args(0)),
        foldableInt(args, 1, "plane_projection"),
        foldableInt(args, 2, "plane_projection"))))
  }
}
