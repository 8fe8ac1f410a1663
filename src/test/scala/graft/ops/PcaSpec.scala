package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA: the Jacobi solver against hand-computable spectra, the one-pass
  * decimal-exact trainer against a hand covariance, the broadcast
  * projection kernel, and the geometry invariants the q119/q120 gates
  * lean on (orthonormality, variance = eigenvalue, distance
  * preservation).
  */
class PcaSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, false),
    StructField("v", ArrayType(DoubleType, false), false)))

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (vector (1,1)/√2) and 1 ((1,-1)/√2)
    val (values, vectors) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(values(0) - 3.0) < 1e-12)
    assert(math.abs(values(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(vectors(0)(0) - s) < 1e-12 && math.abs(vectors(0)(1) - s) < 1e-12)
    // sign fix: largest-|x| coordinate positive (first on ties)
    assert(vectors(1)(0) > 0)
    assert(math.abs(math.abs(vectors(1)(0)) - s) < 1e-12)
  }

  test("jacobiEigen: eigenvalues sorted descending, vectors orthonormal (8x8)") {
    // deterministic symmetric test matrix with distinct-ish eigenvalues
    val d = 8
    val m = Array.tabulate(d, d)((i, j) =>
      if (i == j) 2.0 + i else 1.0 / (1 + i + j))
    val (values, vectors) = Pca.jacobiEigen(m)
    assert(values.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "descending")
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => vectors(i)(k) * vectors(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"orthonormality at ($i,$j): $dot")
    }
    // trace preserved by similarity transforms
    assert(math.abs(values.sum - (0 until d).map(i => m(i)(i)).sum) < 1e-9)
  }

  test("train recovers a hand-computed covariance spectrum") {
    // four points on an axis-aligned ellipse: variance 2 along x, 0.5
    // along y, zero covariance → eigenvalues exactly (2, 0.5), axes
    // e1=(1,0), e2=(0,1)
    val rows = Seq(
      Row(0L, Seq(2.0, 0.0)), Row(1L, Seq(-2.0, 0.0)),
      Row(2L, Seq(0.0, 1.0)), Row(3L, Seq(0.0, -1.0)))
    val model = Pca.train(mkDf(schema, rows: _*), "v", 2)
    assert(model.n === 4L)
    assert(model.means.forall(m => math.abs(m) < 1e-12))
    assert(math.abs(model.eigenvalues(0) - 2.0) < 1e-12)
    assert(math.abs(model.eigenvalues(1) - 0.5) < 1e-12)
    assert(math.abs(model.components(0)(0)) > 0.999999, "first axis is x")
    assert(math.abs(model.components(1)(1)) > 0.999999, "second axis is y")
  }

  test("train is partitioning-independent (decimal-exact moments)") {
    val rows = (0L until 40L).map(i =>
      Row(i, Seq(math.sin(i.toDouble) * 3 + 1, math.cos(i.toDouble), i / 40.0)))
    val df1 = mkDf(schema, rows: _*).repartition(1)
    val df7 = mkDf(schema, rows: _*).repartition(7)
    val m1 = Pca.train(df1, "v", 3)
    val m7 = Pca.train(df7, "v", 3)
    assert(m1.eigenvalues.toSeq === m7.eigenvalues.toSeq, "bit-identical spectra")
    assert(m1.components.map(_.toSeq).toSeq === m7.components.map(_.toSeq).toSeq)
  }

  test("project centers and rotates; full-d rotation preserves pairwise distance") {
    val rows = (0L until 12L).map(i =>
      Row(i, Seq(i * 0.7 % 3, (i * i) % 5 * 0.3, 2.0 - i * 0.1)))
    val df = mkDf(schema, rows: _*)
    val model = Pca.train(df, "v", 3)
    val proj = Pca.project(df, "v", model, 3, "y")
      .select(col("id"), col("y")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val orig = rows.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- 0L until 12L; j <- i + 1 until 12L) {
      val dOrig = l2(orig(i), orig(j))
      val dProj = l2(proj(i), proj(j))
      assert(math.abs(dOrig - dProj) < 1e-9 * math.max(1.0, dOrig),
        s"distance preserved for ($i,$j)")
    }
    // variance along component k equals eigenvalue k (population form)
    val n = 12.0
    for (k <- 0 until 3) {
      val ys = (0L until 12L).map(i => proj(i)(k))
      val mean = ys.sum / n
      val v = ys.map(y => (y - mean) * (y - mean)).sum / n
      assert(math.abs(v - model.eigenvalues(k)) <=
        1e-9 * math.max(1.0, model.eigenvalues(k)), s"variance($k)=$v")
    }
  }

  test("projection kernel: dim mismatch and wrong-cardinality rows") {
    val model = Pca.train(mkDf(schema,
      Row(0L, Seq(1.0, 0.0)), Row(1L, Seq(-1.0, 0.0)),
      Row(2L, Seq(0.0, 2.0)), Row(3L, Seq(0.0, -2.0))), "v", 2)
    // a 3-element row through a dim-2 rotation → null (the l2sq contract)
    val bad = mkDf(schema, Row(9L, Seq(1.0, 2.0, 3.0)))
    val out = Pca.project(bad, "v", model, 2, "y").select("y").collect()
    assert(out.head.isNullAt(0))
    // wrong-cardinality rows are excluded from training, not averaged in
    val mixed = mkDf(schema,
      Row(0L, Seq(1.0, 0.0)), Row(1L, Seq(-1.0, 0.0)),
      Row(2L, Seq(0.0, 2.0)), Row(3L, Seq(0.0, -2.0)),
      Row(4L, Seq(9.0, 9.0, 9.0)))
    assert(Pca.train(mixed, "v", 2).n === 4L)
  }
}
