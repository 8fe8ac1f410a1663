package graft.clean

import graft.SparkSpec
import graft.functions.RepairEncodingUtil
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic property checks (seeded random inputs, fixed iteration
  * counts) for the cleaning rules: totality (never throw), idempotence,
  * and round-trip laws.
  */
class CleaningPropertiesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private val strSchema = StructType(Seq(StructField("s", StringType, true)))

  private def randomJunk(n: Int): Seq[String] =
    Seq.fill(n)(rnd.alphanumeric.take(rnd.nextInt(20)).mkString +
      Seq("", " ", "\t", "null", "1.5", "-", "", "Ã¡")(rnd.nextInt(8)))

  test("cleanInteger is total: arbitrary junk never throws, yields bigint or NULL") {
    val vals = randomJunk(200)
    val out = mkDf(strSchema, vals.map(Row(_)): _*)
      .select(CleanRules.cleanInteger(col("s")).as("c")).collect()
    assert(out.length === 200) // no exception = pass; values are Long or null
    assert(out.forall(r => r.isNullAt(0) || r.get(0).isInstanceOf[Long]))
  }

  test("cleanInteger round-trips every long; float-repr integrals parse") {
    val longs = Seq.fill(100)(rnd.nextLong()) // full int64 range: direct-cast path keeps precision
    val out = mkDf(strSchema, longs.map(l => Row(l.toString)): _*)
      .select(CleanRules.cleanInteger(col("s")).as("c")).collect().map(_.getLong(0))
    assert(out.toSeq === longs)
    val floats = mkDf(strSchema, Row("42.0"), Row("-7.000"))
      .select(CleanRules.cleanInteger(col("s")).as("c")).collect().map(_.getLong(0))
    assert(floats.toSeq === Seq(42L, -7L))
  }

  test("normalizeWhitespace is idempotent on random inputs") {
    val vals = randomJunk(200).map(s => s" $s  \n ${s.reverse} ")
    val once = mkDf(strSchema, vals.map(Row(_)): _*)
      .select(CleanRules.normalizeWhitespace(col("s")).as("c"))
    val twice = once.select(CleanRules.normalizeWhitespace(col("c")).as("c"))
    assert(col0[String](once) === col0[String](twice))
  }

  test("cleanDateString is total on junk and never yields out-of-range years") {
    val vals = randomJunk(200) ++ Seq("9999-01-01", "0001-01-01", "2024-02-29", "2023-02-29")
    val out = mkDf(strSchema, vals.map(Row(_)): _*)
      .select(year(CleanRules.cleanDateString(col("s"))).as("y")).collect()
    assert(out.forall(r => r.isNullAt(0) || (r.getInt(0) > 1900 && r.getInt(0) < 2100)))
  }

  test("repairEncoding law: repair(utf8-bytes-read-as-latin1(s)) == s") {
    val samples = Seq("áéíóú", "mañana", "Größe", "ça va", "naïve café", "año 2024")
    for (s <- samples) {
      val garbled = new String(s.getBytes("UTF-8"), "ISO-8859-1")
      val repaired = RepairEncodingUtil.repair(UTF8String.fromString(garbled)).toString
      assert(repaired === s, s"failed to recover '$s' from '$garbled'")
    }
    // pure ASCII is a fixed point
    assert(RepairEncodingUtil.repair(UTF8String.fromString("plain")).toString === "plain")
  }

  test("timeToHms is total on junk") {
    val out = mkDf(strSchema, randomJunk(200).map(Row(_)): _*)
      .select(CleanRules.timeToHms(col("s")).as("c")).collect()
    assert(out.forall(r => r.isNullAt(0) ||
      r.getString(0).matches("\\d{2}:\\d{2}:\\d{2}")))
  }
}
