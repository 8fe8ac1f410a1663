package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Z-order interleave: exact bit layout, losslessness, locality corners. */
class ZOrderSpec extends AnyFunSuite {

  private def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L; var i = 0
    while (i < 31) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  test("bit layout corners") {
    assert(ZOrderUtil.interleave(0L, 0L) == 0L)
    assert(ZOrderUtil.interleave(1L, 0L) == 1L) // a -> even bits
    assert(ZOrderUtil.interleave(0L, 1L) == 2L) // b -> odd bits
    assert(ZOrderUtil.interleave(3L, 3L) == 15L)
  }

  test("interleave is lossless for 31-bit inputs (seeded random)") {
    val rnd = new scala.util.Random(13)
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong() & 0x7fffffffL
      val b = rnd.nextLong() & 0x7fffffffL
      val z = ZOrderUtil.interleave(a, b)
      assert(z >= 0L, "62-bit code is non-negative")
      assert(deinterleave(z) == ((a, b)))
    }
  }

  test("inputs beyond 31 bits are masked, not wrapped") {
    assert(ZOrderUtil.interleave(1L << 31, 0L) == 0L)
    assert(ZOrderUtil.interleave((1L << 31) | 1L, 0L) == 1L)
  }

  test("interleaveN at n=2 reproduces the binary form bit-for-bit") {
    val rnd = new scala.util.Random(29)
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong() & 0x7fffffffL
      val b = rnd.nextLong() & 0x7fffffffL
      assert(ZOrderUtil.interleaveN(Array(a, b)) == ZOrderUtil.interleave(a, b))
    }
  }

  test("interleaveN is lossless within the per-dimension bit budget") {
    val rnd = new scala.util.Random(31)
    (2 to 5).foreach { n =>
      val bits = 63 / n
      val mask = (1L << bits) - 1
      def deN(z: Long): Seq[Long] = (0 until n).map { j =>
        var v = 0L; var i = 0
        while (i < bits) { v |= ((z >> (i * n + j)) & 1L) << i; i += 1 }
        v
      }
      (1 to 200).foreach { _ =>
        val vs = Array.fill(n)(rnd.nextLong() & mask)
        val z = ZOrderUtil.interleaveN(vs)
        assert(z >= 0L)
        assert(deN(z) == vs.toSeq, s"n=$n")
      }
    }
  }
}
