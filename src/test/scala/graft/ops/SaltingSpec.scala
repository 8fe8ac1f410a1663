package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Salted two-stage aggregation equals the direct aggregation (skew
  * mitigation must never change results).
  */
class SaltingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType, true),
    StructField("id", LongType, false),
    StructField("v", DoubleType, true)))

  test("saltedCount/saltedSum match direct groupBy on a skewed key distribution") {
    // "hot" holds 90% of rows — the shape salting exists for
    val rows = (1L to 900L).map(i => Row("hot", i, 1.5)) ++
      (901L to 1000L).map(i => Row(s"k${i % 7}", i, 2.0))
    val df = mkDf(schema, rows: _*)

    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val salted = Salting.saltedCount(df, "k", col("id"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedS = Salting.saltedSum(df, "k", "v", col("id"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(salted === direct.map { case (k, (n, _)) => k -> n })
    for ((k, (_, t)) <- direct)
      assert(math.abs(saltedS(k) - t) < 1e-9)
  }

  test("salt is deterministic (stable under retries) and bounded") {
    val df = mkDf(schema, (1L to 50L).map(i => Row("x", i, 1.0)): _*)
    val a = df.select(Salting.saltFrom(col("id"), 8).as("s")).collect().map(_.getInt(0))
    val b = df.select(Salting.saltFrom(col("id"), 8).as("s")).collect().map(_.getInt(0))
    assert(a.toSeq === b.toSeq)
    assert(a.forall(s => s >= 0 && s < 8))
    assert(a.distinct.length > 1) // actually spreads
  }
}
