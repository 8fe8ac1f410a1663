package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

import java.security.MessageDigest

/** Native Catalyst expressions for embedding math (brief: "custom
  * `Expression`" as the scale path for similarity search).
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — is semantically right but runs interpreted: higher-order functions
  * are CodegenFallback, so every element pays lambda-variable binding and
  * boxing, and `zip_with` allocates an intermediate array per row. For a
  * 64-dim corpus scan that is the ANN hot loop. These expressions make
  * one primitive pass over the two ArrayData buffers (dot + both norms in
  * a single traversal for cosine) and stay inside whole-stage codegen.
  *
  * Numerics: accumulation is sequential in element order — bit-identical
  * to the `aggregate` fold they replace (and to the DuckDB oracle's list
  * accumulation), so hash-checked gates are unaffected.
  *
  * Null semantics: SQL-null result when either side is null, lengths
  * differ, or an element is null (the HOF form also nulls the first two;
  * fixture embeddings carry no null elements).
  */
object VectorOpsUtil {

  /** null ⇔ length mismatch or null element. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** dot/(|a||b|) in ONE traversal; 0-vector → NaN (0/0), matching the
    * composed division. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0d; var na = 0.0d; var nb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic pseudo-random hyperplane components, portable across
    * engines BY CONSTRUCTION: p_k[i] = md5_60bit("k:i") / 2^60 * 2 - 1.
    * The value is an exact int64 → IEEE nearest double → exact
    * power-of-two scaling, so Spark and the DuckDB oracle compute
    * bit-identical planes with no libm involvement. (An earlier family
    * sin(97k + i) had rank 2 — sin(a+i) = sin(a)cos(i) + cos(a)sin(i)
    * spans only {cos i, sin i} — so every bucket bit cut the SAME 2D
    * projection and adaptive refinement could not split hot buckets;
    * measured at sf0.1: occupancy 143 → 116 after 24 extra bits.) */
  private val PlaneMaxDim = 4096
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()
  def plane(k: Int): Array[Double] =
    planeCache.computeIfAbsent(k, _ => {
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(PlaneMaxDim) { i =>
        md.reset()
        val digest = md.digest(s"$k:$i".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        (TextHashUtil.prefix60(digest).toDouble / 1.152921504606846976e18) * 2.0 - 1.0
      }
    })

  /** <v[0..dim), p_k> — the coarse-space projection of the two-stage
    * rerank. Plane components are computed (and cached) EXECUTOR-side
    * from the deterministic md5 family, so the plan carries only the two
    * ints (k, dim) — no per-component literals (the same plan-size
    * discipline as the broadcast centroid matrices). Null ⇔ null element
    * or fewer than `dim` components (the strict-length dot contract the
    * typedLit form had). */
  def project(v: ArrayData, k: Int, dim: Int): java.lang.Double = {
    require(dim <= PlaneMaxDim,
      s"projection dim $dim exceeds plane table $PlaneMaxDim")
    if (v.numElements() < dim) return null
    val p = plane(k)
    var acc = 0.0d
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      acc += v.getDouble(i) * p(i)
      i += 1
    }
    acc
  }

  /** Random-hyperplane LSH bucket: bit b = sign of <v, p_(b+offset)>,
    * same per-bit sequential sums as the HOF form and the oracle SQL.
    * One pass per bit over the raw buffer. `offset` selects a disjoint
    * plane family — adaptive bucket refinement uses offset = bits*depth.
    * `dim` > 0 projects only the first dim components (the documented
    * signature contract — a longer vector must not change the bucket);
    * dim <= 0 uses the full vector. */
  def hyperplaneSig(v: ArrayData, bits: Int, offset: Int, dim: Int): java.lang.Integer = {
    val n = if (dim > 0) math.min(dim, v.numElements()) else v.numElements()
    require(n <= PlaneMaxDim, s"embedding dim $n exceeds plane table $PlaneMaxDim")
    var sig = 0
    var b = 0
    while (b < bits) {
      val p = plane(b + offset)
      var acc = 0.0d
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        acc += v.getDouble(i) * p(i)
        i += 1
      }
      if (acc > 0) sig |= 1 << b
      b += 1
    }
    sig
  }
}

private[functions] trait BoxedDoubleBinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Fully-qualified static method in VectorOpsUtil. */
  protected def utilMethod: String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = evalBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }
  protected def evalBoxed(a: ArrayData, b: ArrayData): java.lang.Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorOpsUtil.$utilMethod($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
}

/** dot(a, b) over array<double>. */
case class DotProduct(left: Expression, right: Expression)
    extends BoxedDoubleBinaryVectorExpression {
  override def prettyName: String = "dot_product"
  override protected def utilMethod: String = "dot"
  override protected def evalBoxed(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorOpsUtil.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Σ(a_i-b_i)² over array<double>. */
case class L2Squared(left: Expression, right: Expression)
    extends BoxedDoubleBinaryVectorExpression {
  override def prettyName: String = "l2_squared"
  override protected def utilMethod: String = "l2sq"
  override protected def evalBoxed(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorOpsUtil.l2sq(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Squared =
    copy(left = l, right = r)
}

/** Cosine similarity over array<double> — dot and both norms in one pass. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BoxedDoubleBinaryVectorExpression {
  override def prettyName: String = "cosine_sim"
  override protected def utilMethod: String = "cosine"
  override protected def evalBoxed(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorOpsUtil.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Morton/Z-order bit interleave of two int64 keys (low 31 bits each →
  * a 62-bit non-negative code): sorting a table by z(a, b) clusters rows
  * that are close in BOTH dimensions into the same row groups, so
  * min/max stats prune scans for predicates on EITHER column — the
  * multi-column clustering technique behind Delta's OPTIMIZE ZORDER,
  * here as a plain deterministic expression usable as an ingest
  * sorting key. Inputs beyond 31 bits are masked (callers bucket or
  * rank into the 31-bit space first — documented contract). */
object ZOrderUtil {
  def interleave(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** N-way round-robin interleave: bit i of input j lands at position
    * i·n + j, each input masked to ⌊63/n⌋ bits (n=2 reproduces
    * `interleave` bit-for-bit). The generalization real OPTIMIZE ZORDER
    * needs — clustering quality per dimension degrades as n grows
    * (fewer bits each), which is the documented reason to z-order on
    * the few most-filtered columns only. */
  def interleaveN(vs: Array[Long]): Long = {
    val n = vs.length
    val bits = 63 / n
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        z |= ((vs(j) >> i) & 1L) << (i * n + j)
        j += 1
      }
      i += 1
    }
    z
  }
}

case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderUtil.interleave($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderKey =
    copy(left = l, right = r)
}

/** N-ary z-order key (see ZOrderUtil.interleaveN): any child null →
  * null; children must already be int64 (callers cast/bucket into the
  * ⌊63/n⌋-bit space, the same contract as the binary form). */
case class ZOrderKeyN(children: Seq[Expression]) extends Expression {
  require(children.size >= 2, "zorder_key_n needs at least 2 keys")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key_n"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var j = 0
    while (j < children.size) {
      val v = children(j).eval(input)
      if (v == null) return null
      arr(j) = v.asInstanceOf[Long]
      j += 1
    }
    ZOrderUtil.interleaveN(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evs = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val n = children.size
    // evaluate children in order with early-out on the first null (the
    // running ev.isNull guards each subsequent load)
    val loads = evs.zipWithIndex.map { case (c, j) =>
      s"""if (!${ev.isNull}) {
         |  ${c.code}
         |  if (${c.isNull}) { ${ev.isNull} = true; } else { $arr[$j] = ${c.value}; }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long[] $arr = new long[$n];
        |$loads
        |long ${ev.value} = ${ev.isNull} ? -1L :
        |  graft.functions.ZOrderUtil.interleaveN($arr);
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKeyN = copy(children = newChildren)
}

/** Deterministic plane projection <v[0..dim), p_k> (see
  * VectorOpsUtil.project) — the literal-free coarse-space kernel. */
case class PlaneProjection(child: Expression, k: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "plane_projection"

  override protected def nullSafeEval(input: Any): Any = {
    val r = VectorOpsUtil.project(input.asInstanceOf[ArrayData], k, dim)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("proj")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorOpsUtil.project($c, $k, $dim);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneProjection =
    copy(child = newChild)
}

/** `bits`-wide deterministic hyperplane LSH signature of an array<double>;
  * `offset` picks the plane family (refinement depth d → offset bits*d);
  * `dim` > 0 projects only the first dim components. */
case class HyperplaneSignature(child: Expression, bits: Int, offset: Int = 0,
    dim: Int = -1) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val r = VectorOpsUtil.hyperplaneSig(input.asInstanceOf[ArrayData], bits, offset, dim)
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Integer $boxed = graft.functions.VectorOpsUtil.hyperplaneSig($c, $bits, $offset, $dim);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}
