package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite with SparkSpec {

  private def cc(edges: (Long, Long)*): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("disjoint cliques and chains resolve to min-id clusters") {
    val got = cc(
      (1L, 2L), (2L, 3L), (1L, 3L), // clique {1,2,3}
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), // chain {10..14}
      (20L, 21L)) // pair
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges via pointer jumping (O(log n) rounds, capped)") {
    val edges = (1L until 200L).map(i => (i, i + 1))
    val got = cc(edges: _*)
    assert(got.size === 200)
    assert(got.values.toSet === Set(1L))
  }

  test("star-capped LSH pairs cluster with their representative") {
    // the shape Dedup.minhashCandidates emits for a hot bucket
    val got = cc((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(got.values.toSet === Set(1L))
  }
}
