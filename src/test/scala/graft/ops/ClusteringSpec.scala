package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Lloyd's k-means: convergence to the obvious clusters on separated
  * data, deterministic (dist, cid) tie-break, decimal-exact means
  * independent of partitioning.
  */
class ClusteringSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, false),
    StructField("v", ArrayType(DoubleType, false), false)))

  test("kmeans separates two obvious clusters and averages exactly") {
    // cluster A near (0,0), cluster B near (10,10); init takes the two
    // LOWEST ids — 0 and 1 — which straddle the clusters by construction
    val rows = Seq(
      Row(0L, Seq(0.0, 0.0)), Row(2L, Seq(1.0, 0.0)), Row(3L, Seq(0.0, 1.0)),
      Row(1L, Seq(10.0, 10.0)), Row(6L, Seq(11.0, 10.0)), Row(7L, Seq(10.0, 11.0)))
    val out = Clustering.kmeans(mkDf(schema, rows: _*), "id", "v", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L))
    assert(out.map(_._3).toSeq == Seq(3L, 3L))
    // means are exact: (1/3, 1/3) and (31/3, 31/3) via decimal accumulation
    val a = out(0)._2; val b = out(1)._2
    assert(math.abs(a(0) - 1.0 / 3) < 1e-9 && math.abs(a(1) - 1.0 / 3) < 1e-9)
    assert(math.abs(b(0) - 31.0 / 3) < 1e-9 && math.abs(b(1) - 31.0 / 3) < 1e-9)
  }

  test("kmeans result is invariant under input partitioning") {
    val rows = (0L until 40L).map(i =>
      Row(i, Seq((i % 7).toDouble, (i % 11).toDouble)))
    val df1 = mkDf(schema, rows: _*).repartition(1)
    val df8 = mkDf(schema, rows: _*).repartition(8)
    def fit(df: org.apache.spark.sql.DataFrame) =
      Clustering.kmeans(df, "id", "v", k = 3, iters = 3)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(fit(df1) == fit(df8),
      "decimal M-step must make centroids independent of partition order")
  }

  test("assign breaks distance ties by lowest centroid id") {
    val cents = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(2.0, 0.0)))
    val out = Clustering.assign(
      mkDf(schema, Row(9L, Seq(1.0, 0.0))), "id", "v", cents).collect()
    assert(out.head.getAs[Long]("cid") == 1L) // equidistant → min cid
  }

  test("assignment plan is O(1) in k·dim at k=1024, dim=64 and codegen'd") {
    // a realistic coarse quantizer: 1024 centroids × 64 dims = 65536
    // doubles. The old typedLit form embedded all of them as plan
    // literals; the broadcast kernel must keep the plan tree bounded.
    import org.apache.spark.sql.functions._
    val dim = 64
    val cents: Seq[(Long, Seq[Double])] = (0 until 1024).map(c =>
      (c.toLong, Seq.tabulate(dim)(i => ((c * 31 + i * 17) % 101).toDouble / 7.0)))
    // plain array(), not transform(): HOFs are CodegenFallback and would
    // knock the collapsed Project out of codegen regardless of the kernel
    val corpus = spark.range(200).select(col("id"),
      array((0 until dim).map(i =>
        ((col("id") * 13 + lit(i)) % 19).cast("double")): _*).as("v"))
    val assigned = Clustering.assign(corpus, "id", "v", cents)
    val planStr = assigned.queryExecution.executedPlan.toString
    assert(planStr.length < 20000,
      s"plan string is ${planStr.length} chars — centroids are leaking into the plan")
    assert(planStr.contains("nearest_centroids"))
    // "*(n)" is the whole-stage-codegen stage marker in simpleString —
    // the Project computing cid must carry it
    assert(planStr.linesIterator.exists(l =>
      l.contains("nearest_centroids") && l.trim.startsWith("*(")),
      "assignment must stay inside whole-stage codegen")
    // cross-check one assignment against plain-Scala argmin
    val got = assigned.filter(col("id") === 7L).collect().head.getAs[Long]("cid")
    val v = Seq.tabulate(dim)(i => ((7 * 13 + i) % 19).toDouble)
    val expect = cents.minBy { case (cid, cv) =>
      (cv.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum, cid)
    }._1
    assert(got == expect)
  }
}
