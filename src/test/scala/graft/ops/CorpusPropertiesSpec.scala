package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic property checks (seeded random inputs) for the corpus
  * operators: conservation and invariant laws that must hold for ANY
  * input, not just the gate fixtures.
  */
class CorpusPropertiesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)

  test("packSequences conserves docs and tokens; sequences are budget-dense") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("tok", LongType, false)))
    val docs = (1L to 300L).map(i => Row(i, (rnd.nextInt(200) + 1).toLong))
    val totalTok = docs.map(_.getLong(1)).sum
    val out = Corpus.packSequences(mkDf(schema, docs: _*), "doc_id", "tok", 512L)
      .collect()
    assert(out.map(_.getLong(1)).sum == 300L, "every doc lands in one sequence")
    assert(out.map(_.getLong(2)).sum == totalTok, "token mass conserved")
    // seq ids are the dense prefix 0..ceil(total/budget)-1 under the
    // first-token placement rule (a doc STARTS in floor(start/budget))
    val ids = out.map(_.getLong(0)).sorted
    assert(ids.head == 0L && ids.last == (totalTok - 1) / 512L)
    assert(ids.distinct.length == ids.length)
  }

  test("clusterSplit: split is a pure function of the cluster label") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("cluster", LongType, false)))
    val docs = (1L to 400L).map(i => Row(i, (rnd.nextInt(40)).toLong))
    val out = Corpus.clusterSplit(mkDf(schema, docs: _*), "cluster")
      .select("cluster", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byCluster = out.groupBy(_._1).values
    assert(byCluster.forall(_.map(_._2).distinct.length == 1),
      "a cluster must never straddle splits")
    assert(out.map(_._2).distinct.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("domainCap output per domain = min(cap, domain size); total preserved under cap") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("host", StringType, false)))
    val docs = (1L to 500L).map(i => Row(i, s"h${rnd.nextInt(20)}"))
    val in = mkDf(schema, docs: _*)
    val inSizes = in.groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val outSizes = Corpus.domainCap(in, "host", cap = 10,
      priority = Seq(col("doc_id").asc))
      .groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outSizes.keySet == inSizes.keySet)
    assert(outSizes.forall { case (h, n) => n == math.min(10L, inSizes(h)) })
  }

  test("lineDedup round-trips a corpus with no repeated lines byte-identically") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("text", StringType, true)))
    // globally unique lines: every line carries its doc id and position
    val docs = (1L to 50L).map(i =>
      Row(i, (0 until (i % 5 + 1).toInt).map(p => s"d$i-l$p").mkString("\n")))
    val out = Corpus.lineDedup(mkDf(schema, docs: _*), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach(r => assert(out(r.getLong(0)) == r.getString(1)))
  }
}
