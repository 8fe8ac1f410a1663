package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions vs the interpreted HOF reference forms:
  * bit-identical results (same sequential accumulation), null semantics,
  * and whole-stage-codegen participation. */
class VectorOpsSpec extends AnyFunSuite with SparkSpec {

  private def vecs = {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random doubles incl. negatives and magnitudes
    (1 to 50).map { i =>
      val a = (0 until 64).map(j => math.sin(i * 131 + j) * (1 + j % 7)).toArray
      val b = (0 until 64).map(j => math.cos(i * 29 + j * 3) * (1 + j % 5)).toArray
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
  }

  test("dot/cosine/l2sq native == HOF bit-exactly") {
    val df = vecs
      .withColumn("dn", Similarity.dot(col("a"), col("b")))
      .withColumn("dh", Similarity.dotHof(col("a"), col("b")))
      .withColumn("cn", Similarity.cosine(col("a"), col("b")))
      .withColumn("ch", Similarity.cosineHof(col("a"), col("b")))
      .withColumn("ln", Similarity.l2sq(col("a"), col("b")))
      .withColumn("lh", aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x))
    // == on doubles: any accumulation-order difference would fail
    assert(df.filter(col("dn") =!= col("dh") || col("cn") =!= col("ch") ||
      col("ln") =!= col("lh")).count() === 0)
  }

  test("hyperplane signature native == HOF on every vector") {
    val df = vecs
      .withColumn("sn", Similarity.hyperplaneSig("a", 8, 64))
      .withColumn("sh", Similarity.hyperplaneSigHof("a", 8, 64))
    assert(df.filter(col("sn") =!= col("sh")).count() === 0)
  }

  test("cosineNearDupPairs hot bucket: star pairs, linear in occupancy") {
    val s = spark
    import s.implicits._
    // 200 identical unit vectors -> one bucket with occupancy 200 (> 64)
    val v = (0 until 16).map(i => math.sin(i + 1.0)).toArray
    val df = (1L to 200L).map(i => (i, v)).toDF("vec_id", "emb")
    val pairs = Similarity.cosineNearDupPairs(
      df, "vec_id", "emb", threshold = 0.9999, bits = 4, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.length === 199) // star, not C(200,2)
    assert(pairs.forall(_._1 == 1L))
    // small corpus below the cap keeps the exact clique
    val small = (1L to 10L).map(i => (i, v)).toDF("vec_id", "emb")
    assert(Similarity.cosineNearDupPairs(
      small, "vec_id", "emb", 0.9999, 4, 16).count() === 45)
  }

  test("null semantics: null side, length mismatch, null element") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, null, Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0)),
      (4L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
      .withColumn("d", Similarity.dot(col("a"), col("b")))
    val got = df.select("id", "d").collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) === Some(11.0))
    assert(got(2L) === None)
    assert(got(3L) === None)
    assert(got(4L) === None)
  }

  test("zorderKeyN: matches interleaveN, nulls propagate, codegen participates") {
    val s = spark
    import s.implicits._
    val df = spark.range(0, 100)
      .select(col("id").as("a"), (col("id") * 7 % 50).as("b"),
        (col("id") * 13 % 30).as("c"))
      .withColumn("z", graft.functions.columns.zorderKeyN(
        col("a"), col("b"), col("c")))
    df.collect().foreach { r =>
      assert(r.getLong(3) === ZOrderUtil.interleaveN(
        Array(r.getLong(0), r.getLong(1), r.getLong(2))))
    }
    // codegen: the projection must execute inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage, got:\n$plan")
    // null in any dimension -> null key
    val withNull = Seq((Some(1L), Some(2L), Option.empty[Long]))
      .toDF("a", "b", "c")
      .withColumn("z", graft.functions.columns.zorderKeyN(
        col("a"), col("b"), col("c")))
    assert(withNull.collect()(0).isNullAt(3))
  }

  test("SQL registration + codegen participation") {
    val s = spark
    import s.implicits._
    // range source: not constant-foldable, so the projection must execute
    spark.range(1).selectExpr(
      "array(cast(id as double) + 1.0, 0.0d) AS a",
      "array(1.0d, 0.0d) AS b").createOrReplaceTempView("vv")
    val out = spark.sql(
      "SELECT cosine_sim(a, b) AS c, dot_product(a, b) AS d, " +
        "l2_squared(a, b) AS l, hyperplane_sig(a, 4) AS h FROM vv")
    assert(out.collect().head.getDouble(0) === 1.0)
    // the projection must be inside a WholeStageCodegen span (native
    // expressions compile; HOF forms would force interpreted eval)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage, got:\n$plan")
  }
}
