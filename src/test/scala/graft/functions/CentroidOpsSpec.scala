package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** NearestCentroids kernel arithmetic: (distance, cid) ascending selection,
  * deterministic tie-break, the l2sq null contract, and buffer edge cases.
  */
class CentroidOpsSpec extends AnyFunSuite {

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)

  private val m = CentroidMatrix(
    Array(10L, 20L, 30L),
    Array(Array(0.0, 0.0), Array(2.0, 0.0), Array(5.0, 0.0)))

  test("nearest orders by (l2sq, cid) ascending") {
    assert(CentroidOpsUtil.nearest(arr(4.0, 0.0), m, 3).toSeq == Seq(30L, 20L, 10L))
    assert(CentroidOpsUtil.nearest(arr(0.1, 0.0), m, 2).toSeq == Seq(10L, 20L))
  }

  test("exact distance ties break by smaller cid") {
    // (1,0) is equidistant from centroids 10 and 20 (d = 1.0 exactly)
    assert(CentroidOpsUtil.nearest(arr(1.0, 0.0), m, 2).toSeq == Seq(10L, 20L))
  }

  test("keep > k returns all k; keep <= 0 returns empty") {
    assert(CentroidOpsUtil.nearest(arr(0.0, 0.0), m, 9).toSeq == Seq(10L, 20L, 30L))
    assert(CentroidOpsUtil.nearest(arr(0.0, 0.0), m, 0).toSeq == Seq())
  }

  test("null on dim mismatch or null element (the l2sq contract)") {
    assert(CentroidOpsUtil.nearest(arr(1.0, 2.0, 3.0), m, 1) == null)
    val withNull = new GenericArrayData(Array[Any](1.0, null))
    assert(CentroidOpsUtil.nearest(withNull, m, 1) == null)
  }

  test("property: selection equals the sort oracle on random matrices (ties included)") {
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { trial =>
      val dim = rnd.nextInt(8) + 1
      val k = rnd.nextInt(20) + 1
      val keep = rnd.nextInt(k + 3) + 1
      val cids = Array.tabulate(k)(c => rnd.nextInt(50).toLong) // dup cids possible
      // small integer grid values force frequent EXACT distance ties,
      // exercising the (d, cid) tie-break path hard
      val vecs = Array.tabulate(k)(_ => Array.fill(dim)(rnd.nextInt(3).toDouble))
      val v = Array.fill(dim)(rnd.nextInt(3).toDouble)
      val m = CentroidMatrix(cids, vecs)
      def d2(cv: Array[Double]) = cv.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum
      val expect = cids.indices.map(c => (d2(vecs(c)), cids(c)))
        .sorted.take(math.min(keep, k)).map(_._2)
      val got = CentroidOpsUtil.nearest(new GenericArrayData(v), m, keep).toSeq
      assert(got == expect, s"trial $trial: dim=$dim k=$k keep=$keep")
    }
  }

  test("selection matches a full sort at k=1024, dim=64") {
    // pseudo-random but deterministic matrix; verify the bounded-buffer
    // insertion against an independent sort-based oracle
    val k = 1024; val dim = 64
    val cids = Array.tabulate(k)(c => (c * 7 + 3).toLong)
    val vecs = Array.tabulate(k)(c =>
      Array.tabulate(dim)(i => ((c * 31 + i * 17) % 101).toDouble / 7.0))
    val mm = CentroidMatrix(cids, vecs)
    val v = Array.tabulate(dim)(i => ((i * 13) % 19).toDouble)
    def d2(cv: Array[Double]) = {
      var acc = 0.0; var i = 0
      while (i < dim) { val d = v(i) - cv(i); acc += d * d; i += 1 }
      acc
    }
    val expect = cids.indices.map(c => (d2(vecs(c)), cids(c))).sorted.take(5).map(_._2)
    val got = CentroidOpsUtil.nearest(new GenericArrayData(v), mm, 5).toSeq
    assert(got == expect)
  }
}
