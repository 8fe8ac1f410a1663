package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The coarse-quantizer centroid table as ONE broadcast payload.
  *
  * Why this exists: the previous IVF/k-means assignment embedded every
  * centroid vector as `typedLit` literals in a k-element struct array —
  * at realistic index sizes (a few thousand centroids × 1024-dim doubles)
  * that is tens of millions of PLAN literals: Catalyst analysis cost grows
  * with the plan tree and generated code exceeds JVM method limits long
  * before the data is the problem. Here the matrix is a plain JVM object
  * shipped via torrent broadcast (once per executor, not per task), and
  * the expression holds only the broadcast HANDLE — plan size is O(1) in
  * k·dim. This is the same coarse-quantizer shape as a production IVF
  * index (reference semantics: SURVEY.md §7.6).
  */
final case class CentroidMatrix(cids: Array[Long], vecs: Array[Array[Double]])
    extends Serializable {
  require(cids.length == vecs.length,
    s"cids (${cids.length}) and vecs (${vecs.length}) must align")
  def k: Int = cids.length
}

/** The full PQ codebook set as ONE broadcast payload: per subspace a
  * cid → subvector table for the ADC lookup. Same plan-size discipline
  * as [[CentroidMatrix]]: at production ks=256, m=16, dsub=64 the
  * tables are ~2 MB of doubles — shipped once per executor via torrent
  * broadcast, never as `typedLit` plan literals (m·ks·dsub literals
  * would re-grow the plan the broadcast centroid rewrite just shrank). */
final case class PqCodebookTables(
    subs: Array[java.util.HashMap[java.lang.Long, Array[Double]]], dsub: Int)
    extends Serializable {
  def m: Int = subs.length
}

/** A center-then-rotate linear map (the PCA projection) as ONE broadcast
  * payload: y_r = Σ_j rows(r)(j) · (x_j − means(j)). Same plan-size
  * discipline as [[CentroidMatrix]]: the matrix ships via torrent
  * broadcast once per executor, the expression holds only the handle —
  * O(1) plan size in k·dim (a 1024→256 projection is 256k doubles, far
  * past any sane `typedLit` plan). */
final case class RotationMatrix(means: Array[Double], rows: Array[Array[Double]])
    extends Serializable {
  require(rows.forall(_.length == means.length),
    "every rotation row must have the input dimension")
  def k: Int = rows.length
  def dim: Int = means.length
}

object PqCodebookTables {
  def fromCodebooks(codebooks: Seq[CentroidMatrix]): PqCodebookTables = {
    require(codebooks.nonEmpty, "PqCodebookTables: no codebooks")
    val dsub = codebooks.head.vecs.head.length
    val subs = codebooks.map { cb =>
      val h = new java.util.HashMap[java.lang.Long, Array[Double]](cb.k * 2)
      cb.cids.zip(cb.vecs).foreach { case (cid, v) =>
        require(v.length == dsub,
          s"PqCodebookTables: subvector dim ${v.length} != dsub $dsub")
        h.put(cid, v)
      }
      h
    }.toArray
    PqCodebookTables(subs, dsub)
  }
}

object CentroidOpsUtil {

  /** Asymmetric-distance PQ score: Σ_j dot(qv[j·dsub..(j+1)·dsub),
    * codebook_j[codes(j)]) — bit-identical to the
    * `dotProduct(slice(qv,...), element_at(lut, code))` chain +
    * `reduceLeft(_ + _)` it replaces: per-subspace accumulation is
    * sequential in element order and the cross-subspace sum is
    * left-associated starting from subspace 0's dot (NOT from 0.0, which
    * could flip a -0.0). Null ⇔ qv shorter than m·dsub, a null
    * element/code, or a code absent from its table — exactly the null
    * propagation of the slice/element_at/dot chain. */
  def adc(qv: ArrayData, codes: ArrayData, t: PqCodebookTables): java.lang.Double = {
    val m = t.subs.length
    val dsub = t.dsub
    if (qv.numElements() < m * dsub || codes.numElements() < m) return null
    var total = 0.0d
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val sub = t.subs(j).get(codes.getLong(j))
      if (sub == null) return null
      var acc = 0.0d
      var i = 0
      var qi = j * dsub
      while (i < dsub) {
        if (qv.isNullAt(qi)) return null
        acc += qv.getDouble(qi) * sub(i)
        i += 1; qi += 1
      }
      total = if (j == 0) acc else total + acc
      j += 1
    }
    total
  }

  /** Spark SQL double ordering for our domain: NaN sorts largest
    * (l2sq never yields -0.0, so Double.compare matches SQL exactly). */
  private def before(d1: Double, c1: Long, d2: Double, c2: Long): Boolean = {
    val cmp = java.lang.Double.compare(d1, d2)
    cmp < 0 || (cmp == 0 && c1 < c2)
  }

  /** y = R(x − μ): sequential per-row dot products, exact IEEE doubles in
    * fixed j = 0..dim-1 order (deterministic bit-for-bit). Null ⇔ a null
    * element or an input/matrix dimension mismatch. */
  def project(v: ArrayData, rm: RotationMatrix): Array[Double] = {
    val n = v.numElements()
    if (n != rm.dim) return null
    val centered = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (v.isNullAt(j)) return null
      centered(j) = v.getDouble(j) - rm.means(j)
      j += 1
    }
    val out = new Array[Double](rm.k)
    var r = 0
    while (r < rm.k) {
      val row = rm.rows(r)
      var acc = 0.0d
      j = 0
      while (j < n) {
        acc += row(j) * centered(j)
        j += 1
      }
      out(r) = acc
      r += 1
    }
    out
  }

  /** cids of the `keep` nearest centroids by (l2sq, cid) ascending — the
    * same sequential-accumulation distance and the same deterministic
    * tie-break as the `array_min(array(struct(l2sq, cid)...))` plan-literal
    * form this replaces (bit-identical IEEE doubles, argmin ties broken by
    * smaller cid). Null ⇔ a null element or a dim mismatch with any
    * centroid (the l2sq null contract). One pass per centroid over a
    * primitive buffer; bounded insertion keeps O(k·keep) worst case with
    * keep ≤ nprobe (small). */
  def nearest(v: ArrayData, m: CentroidMatrix, keep: Int): Array[Long] = {
    val n = v.numElements()
    val k = m.k
    val kk = math.min(keep, k)
    if (kk <= 0) return new Array[Long](0)
    val vv = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vv(i) = v.getDouble(i)
      i += 1
    }
    val bd = new Array[Double](kk)
    val bc = new Array[Long](kk)
    var filled = 0
    var c = 0
    while (c < k) {
      val cv = m.vecs(c)
      if (cv.length != n) return null
      var acc = 0.0d
      var j = 0
      while (j < n) {
        val d = vv(j) - cv(j)
        acc += d * d
        j += 1
      }
      val cid = m.cids(c)
      if (filled < kk) {
        var pos = filled
        while (pos > 0 && before(acc, cid, bd(pos - 1), bc(pos - 1))) {
          bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1
        }
        bd(pos) = acc; bc(pos) = cid
        filled += 1
      } else if (before(acc, cid, bd(kk - 1), bc(kk - 1))) {
        var pos = kk - 1
        while (pos > 0 && before(acc, cid, bd(pos - 1), bc(pos - 1))) {
          bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1
        }
        bd(pos) = acc; bc(pos) = cid
      }
      c += 1
    }
    if (filled == kk) bc else java.util.Arrays.copyOf(bc, filled)
  }
}

/** array<bigint> of the `keep` nearest centroid ids for an array<double>
  * vector, ordered by (distance, cid) — the IVF assignment / probe kernel.
  * The centroid matrix rides a `Broadcast` (the expression serializes only
  * the handle), and the argmin fold is a codegen'd primitive loop. */
case class NearestCentroids(child: Expression, bcast: Broadcast[CentroidMatrix],
    keep: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CentroidOpsUtil.nearest(input.asInstanceOf[ArrayData], bcast.value, keep)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidBcast", bcast,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("cids")
      s"""
         |long[] $arr = graft.functions.CentroidOpsUtil.nearest($c,
         |  (graft.functions.CentroidMatrix) $ref.value(), $keep);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** array<double> projection of an array<double> vector through a broadcast
  * [[RotationMatrix]] — the PCA / OPQ-rotation application kernel. Same
  * broadcast-handle plan discipline as [[NearestCentroids]]; the
  * center-and-rotate fold is a codegen'd primitive loop. */
case class ProjectVector(child: Expression, bcast: Broadcast[RotationMatrix])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "project_vector"

  override protected def nullSafeEval(input: Any): Any = {
    val r = CentroidOpsUtil.project(input.asInstanceOf[ArrayData], bcast.value)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rotationBcast", bcast,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("proj")
      s"""
         |double[] $arr = graft.functions.CentroidOpsUtil.project($c,
         |  (graft.functions.RotationMatrix) $ref.value());
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ProjectVector =
    copy(child = newChild)
}

/** Asymmetric-distance PQ score of (query vector, m PQ codes) against a
  * broadcast codebook-table set — the scoring half of the PQ residency.
  * left = array<double> query vector, right = array<bigint> of m codes
  * (one per subspace). The tables ride a `Broadcast` (the expression
  * serializes only the handle — plan size is O(1) in m·ks·dsub), and the
  * lookup+dot fold is a codegen'd primitive loop. Replaces the
  * `typedLit`-map ADC chain bit-identically (see CentroidOpsUtil.adc). */
case class AdcScore(left: Expression, right: Expression,
    bcast: Broadcast[PqCodebookTables]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = CentroidOpsUtil.adc(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], bcast.value)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTablesBcast", bcast,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("adc")
      s"""
         |java.lang.Double $boxed = graft.functions.CentroidOpsUtil.adc($a, $b,
         |  (graft.functions.PqCodebookTables) $ref.value());
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
}
