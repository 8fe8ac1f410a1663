package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge TRANSFORM: one greedy left-to-right pass replacing every
  * non-overlapping adjacent (left, right) token pair with the merged unit
  * `left + " " + right`. A higher-order `aggregate` fold could express
  * this but runs interpreted (CodegenFallback) with per-element lambda
  * binding — this is the trainer's hot per-row loop, so it gets the same
  * native treatment as the shingle/minhash kernels. */
object BpeOpsUtil {
  private val SEP = UTF8String.fromString(" ")

  def mergeAdjacent(tok: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = tok.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n)
    var i = 0
    while (i < n) {
      val cur = if (tok.isNullAt(i)) null else tok.getUTF8String(i)
      if (cur != null && i + 1 < n && !tok.isNullAt(i + 1) &&
          cur == l && tok.getUTF8String(i + 1) == r) {
        out += UTF8String.concat(l, SEP, r)
        i += 2 // greedy non-overlapping: the merged unit can't re-pair here
      } else {
        out += cur
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<string> → array<string>: one greedy merge pass for a fixed
  * (left, right) pair — the per-row kernel of the distributed BPE merge
  * loop (`ops.Bpe.trainMerges`). Codegen'd; null array → null, null
  * elements pass through unmerged. */
case class MergeAdjacentPair(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "merge_adjacent_pair"

  private lazy val lU = UTF8String.fromString(left)
  private lazy val rU = UTF8String.fromString(right)

  override protected def nullSafeEval(input: Any): Any =
    BpeOpsUtil.mergeAdjacent(input.asInstanceOf[ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", lU, classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeRight", rU, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BpeOpsUtil.mergeAdjacent($c, $lRef, $rRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MergeAdjacentPair =
    copy(child = newChild)
}
