package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native expressions for the dedup text-hash pipeline (MinHash / SimHash
  * over md5-prefix hashes, graft.ops.TextHash).
  *
  * The composable forms are `transform(...)` / `aggregate(...)` lambdas
  * around `conv(substring(md5(x),1,15),16,10)` — portable, but every
  * shingle pays interpreted lambda binding plus an md5 HEX STRING
  * allocation that is immediately re-parsed to a long. These expressions
  * hash the digest bytes straight to the same 60-bit value (the first 15
  * hex nibbles ARE the top 60 bits of the digest), one primitive pass per
  * document, inside whole-stage codegen.
  *
  * Portability contract unchanged: value == int64 of md5-hex[1..15], so
  * the DuckDB oracle SQL ('0x' || substr(md5(s),1,15))::bigint still
  * reproduces every operator bit-for-bit (asserted in TextHashOpsSpec).
  */
object TextHashUtil {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')

  /** int64 of the first 15 hex chars of the digest = top 60 bits. */
  private[functions] def prefix60(digest: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 15) {
      val b = digest(j >> 1)
      val nibble = if ((j & 1) == 0) (b >> 4) & 0xF else b & 0xF
      v = (v << 4) | nibble
      j += 1
    }
    v
  }

  /** md5-prefix hash of each n-token shingle (tokens joined by one space,
    * null tokens skipped — concat_ws semantics). mod32 reduces to 32 bits
    * (`pmod(h, 2^32)`) for MinHash permutation inputs. Fewer than n
    * tokens → empty array. */
  def shingleHashes(tokens: ArrayData, n: Int, mod32: Boolean): ArrayData = {
    val len = tokens.numElements()
    val out = new Array[Long](math.max(0, len - n + 1))
    val md = md5Local.get()
    var i = 0
    while (i < out.length) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (!first) md.update(SPACE)
          val t = tokens.getUTF8String(i + j)
          md.update(t.getBytes)
          first = false
        }
        j += 1
      }
      val v = prefix60(md.digest())
      out(i) = if (mod32) v & 0xFFFFFFFFL else v
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k-wide MinHash signature over 32-bit hash values:
    * sig[s] = min over h of (h * A_s + B_s) mod P — identical constants
    * and arithmetic to TextHash.minhashSignature. Empty input → null
    * entries (array_min of empty). */
  def minhashSignature(hashes: ArrayData, k: Int,
      p: Long, aBase: Long, bBase: Long): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val a = aBase * (s + 1)
      val b = bBase * s
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        // floorMod, not %: matches Spark's pmod for ANY input — negative
        // hashes or int64 wrap on h*a (public API accepts any array<long>)
        val h = java.lang.Math.floorMod(hashes.getLong(i) * a + b, p)
        if (h < min) min = h
        i += 1
      }
      out(s) = min
      s += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash fingerprint: bit k set iff the majority of hash values have
    * bit k set (+1/-1 votes, strict > 0) — identical to the per-bit
    * aggregate fold in TextHash.simhash, all bits in one pass. */
  def simhash(hashes: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var k = 0
      while (k < bits) {
        if (((h >> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (votes(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }
}

/** array<string> tokens → array<long> shingle hashes. */
case class ShingleHash(child: Expression, n: Int, mod32: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHashes(input.asInstanceOf[ArrayData], n, mod32)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashUtil.shingleHashes($c, $n, $mod32)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** array<long> 32-bit hashes → array<long> k-wide MinHash signature. */
case class MinhashSig(child: Expression, k: Int, p: Long, aBase: Long, bBase: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.minhashSignature(input.asInstanceOf[ArrayData], k, p, aBase, bBase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashUtil.minhashSignature($c, $k, ${p}L, ${aBase}L, ${bBase}L)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** array<long> hashes → SimHash fingerprint (long). */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
