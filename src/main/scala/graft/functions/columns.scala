package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-DSL entry points for the graft custom expressions. */
object columns {
  /** T1/§2.10 byte-level encoding repair as a typed Column op. */
  def repairEncoding(c: Column): Column =
    ColumnBridge.column(RepairEncoding(ColumnBridge.expression(c.cast("string"))))

  /** Native one-pass vector math (ANN hot loop); inputs are cast to
    * array<double> so callers can pass raw array<float> embeddings. */
  private def vec(c: Column) = ColumnBridge.expression(c.cast("array<double>"))
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(vec(a), vec(b)))
  def l2Squared(a: Column, b: Column): Column =
    ColumnBridge.column(L2Squared(vec(a), vec(b)))
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(vec(a), vec(b)))
  def hyperplaneSig(v: Column, bits: Int, offset: Int = 0, dim: Int = -1): Column =
    ColumnBridge.column(HyperplaneSignature(vec(v), bits, offset, dim))
  /** Z-order clustering key over two int columns (storage locality). */
  def zorderKey(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrderKey(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))
  /** N-ary z-order key (⌊63/n⌋ bits per dimension — z-order the few
    * most-filtered columns only; see ZOrderUtil.interleaveN). */
  def zorderKeyN(cols: Column*): Column =
    ColumnBridge.column(ZOrderKeyN(
      cols.map(c => ColumnBridge.expression(c.cast("long")))))
  def planeProjection(v: Column, k: Int, dim: Int): Column =
    ColumnBridge.column(PlaneProjection(vec(v), k, dim))
  def nearestCentroids(v: Column,
      bcast: org.apache.spark.broadcast.Broadcast[CentroidMatrix],
      keep: Int): Column =
    ColumnBridge.column(NearestCentroids(vec(v), bcast, keep))
  /** Center-then-rotate projection through a broadcast RotationMatrix
    * (PCA application kernel). */
  def projectVector(v: Column,
      bcast: org.apache.spark.broadcast.Broadcast[RotationMatrix]): Column =
    ColumnBridge.column(ProjectVector(vec(v), bcast))

  /** PQ asymmetric-distance score: query vector × array of m codes
    * against broadcast codebook tables. */
  def adcScore(qv: Column, codes: Column,
      bcast: org.apache.spark.broadcast.Broadcast[PqCodebookTables]): Column =
    ColumnBridge.column(AdcScore(vec(qv),
      ColumnBridge.expression(codes.cast("array<bigint>")), bcast))

  /** BPE merge-pass kernel (trainer hot loop). */
  def mergeAdjacentPair(tokens: Column, left: String, right: String): Column =
    ColumnBridge.column(MergeAdjacentPair(ColumnBridge.expression(tokens), left, right))

  /** Native text-hash pipeline (dedup hot loop). */
  def shingleHashes(tokens: Column, n: Int, mod32: Boolean): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens), n, mod32))
  def minhashSig(hashes: Column, k: Int, p: Long, aBase: Long, bBase: Long): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(hashes), k, p, aBase, bBase))
  def simhash(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(hashes), bits))
}
