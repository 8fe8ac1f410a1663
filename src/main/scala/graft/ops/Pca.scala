package graft.ops

import graft.functions.RotationMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over an `array<double>` embedding column — the
  * decorrelating rotation a curation pipeline runs before quantization
  * (the OPQ idea from the public "Optimized Product Quantization" line of
  * work: rotate so PQ subspaces carry balanced, decorrelated variance)
  * and the standard dimensionality-reduction step before clustering.
  *
  * Deterministic by construction (gate-grade):
  *  - ONE corpus pass computes n, per-dim sums and the upper-triangle
  *    second-moment sums with DECIMAL accumulation — per-row products are
  *    exact-IEEE doubles rounded once to decimal(30,15), and decimal sums
  *    are order-free, so the covariance matrix is bit-identical on every
  *    run regardless of partitioning (same arithmetic discipline as
  *    `Clustering.kmeans`'s M-step).
  *  - The d×d eigendecomposition runs ON THE DRIVER with a cyclic Jacobi
  *    sweep (fixed pivot order, fixed tolerance): covariance is tiny
  *    (d ≤ a few thousand) while the corpus is the big thing — exactly
  *    the split a 1000-executor run wants. Eigenpairs are sorted by
  *    (eigenvalue desc, original index asc) and each eigenvector's sign
  *    is fixed (largest-|component| coordinate made positive, first such
  *    index on ties) so the rotation is fully deterministic.
  *  - Application is the broadcast native `ProjectVector` kernel — O(1)
  *    plan size in k·dim, codegen'd primitive loops.
  *
  * Scale: the single pass explodes each row into d(d+3)/2 (i, j, product)
  * entries that partial-aggregate map-side to at most d(d+3)/2 groups per
  * task before the shuffle — the shuffle itself is O(d²) rows total,
  * independent of corpus size. The d² explosion is the irreducible
  * covariance work; for very large d a fused per-partition accumulator
  * (the BLAS-outer-product form) is the drop-in swap, trading the
  * declarative plan for d² fewer row objects.
  */
object Pca {

  /** Trained model: `components(r)` is the r-th principal axis (unit
    * vector in the input space), `eigenvalues(r)` its variance,
    * descending. */
  final case class PcaModel(n: Long, means: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]],
      covTrace: Double) {
    def dim: Int = means.length

    /** The center-then-rotate map onto the top `k` components. */
    def rotation(k: Int): RotationMatrix =
      RotationMatrix(means, components.take(k))
  }

  /** One-pass exact-moment covariance + driver Jacobi. `dim` is the
    * (asserted) embedding dimension. */
  def train(corpus: DataFrame, vecCol: String, dim: Int): PcaModel = {
    require(dim > 0, s"dim=$dim must be positive")
    // per row: upper-triangle products (i, j, x_i·x_j) plus one singleton
    // entry (i, dim, x_i) per dimension — a single explode feeds count,
    // first moments and second moments through one map-side-combined
    // aggregation; rows with the wrong cardinality fail loudly here
    // (element_at on a missing index) rather than skewing the moments
    val e = Balance(corpus)
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .filter(size(col("v")) === dim)
    val moments = e.select(explode(expr(
      s"""flatten(transform(sequence(0, ${dim - 1}, 1), i ->
         |  concat(
         |    transform(sequence(i, ${dim - 1}, 1), j ->
         |      struct(i AS i, j AS j,
         |        CAST(v[i] * v[j] AS DECIMAL(30,15)) AS p)),
         |    array(struct(i AS i, $dim AS j, CAST(v[i] AS DECIMAL(30,15)) AS p)))))
         |""".stripMargin)).as("s"))
      .groupBy(col("s.i").as("i"), col("s.j").as("j"))
      .agg(sum(col("s.p")).as("sp"), count(lit(1)).as("n"))
      .collect()
    require(moments.nonEmpty, "Pca.train: corpus is empty")
    val n = moments.head.getLong(3)
    val sums = new Array[java.math.BigDecimal](dim)
    val prods = Array.ofDim[java.math.BigDecimal](dim, dim)
    moments.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val sp = r.getDecimal(2)
      if (j == dim) sums(i) = sp else prods(i)(j) = sp
    }
    // C_ij = P_ij/n − (S_i/n)(S_j/n), assembled in BigDecimal (exact sums,
    // one DECIMAL128 division each) then rounded once to double
    val mc = java.math.MathContext.DECIMAL128
    val bn = new java.math.BigDecimal(n)
    val means = sums.map(_.divide(bn, mc))
    val cov = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val c = prods(i)(j).divide(bn, mc)
        .subtract(means(i).multiply(means(j), mc), mc).doubleValue()
      cov(i)(j) = c
      cov(j)(i) = c
    }
    // trace BEFORE diagonalization — the independent total-variance
    // anchor the q119 gate compares Σλ against (Jacobi preserves it)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val (values, vectors) = jacobiEigen(cov)
    PcaModel(n, means.map(_.doubleValue()), values, vectors, trace)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed
    * (p, q) pivot order per sweep, fixed convergence threshold — the
    * textbook O(d³) solver, fully deterministic. Returns (eigenvalues,
    * eigenvector rows) sorted by (value desc, original index asc), each
    * vector sign-fixed. */
  private[ops] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    // eigenvector accumulator: starts as identity, collects the rotations;
    // v(c) ends as the eigenvector of eigenvalue a(c)(c) (column c, stored
    // row-major transposed for cheap updates)
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      s
    }
    val tol = 1e-22 * math.max(1.0, a.indices.map(i => a(i)(i) * a(i)(i)).sum)
    var sweep = 0
    while (off() > tol && sweep < 100) {
      for (p <- 0 until d; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (apq != 0.0) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t = math.signum(theta) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vpk = v(p)(k); val vqk = v(q)(k)
            v(p)(k) = c * vpk - s * vqk
            v(q)(k) = s * vpk + c * vqk
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val row = v(i).clone()
      // deterministic sign: the largest-|x| coordinate (first on ties)
      // made positive
      var best = 0
      for (k <- 1 until d)
        if (math.abs(row(k)) > math.abs(row(best))) best = k
      if (row(best) < 0) { var k = 0; while (k < d) { row(k) = -row(k); k += 1 } }
      row
    }.toArray
    (values, vectors)
  }

  /** Project `df`'s `vecCol` onto the model's top `k` components as a new
    * `outCol` (broadcast native kernel; see object scaladoc). */
  def project(df: DataFrame, vecCol: String, model: PcaModel, k: Int,
      outCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.rotation(k))
    df.withColumn(outCol, graft.functions.columns.projectVector(col(vecCol), bc))
  }
}
