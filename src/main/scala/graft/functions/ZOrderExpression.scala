package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 16-bit dimensions into a
  * 32-bit curve position — the multi-dimensional clustering key
  * behind file-skipping layouts: sorting/range-partitioning on the
  * Z-value keeps BOTH dimensions locally bounded inside every file,
  * so min/max footer stats prune scans on either predicate column
  * (a single-column sort bounds one dimension and leaves the other
  * full-range in every file).
  */
object ZOrderKernel {
  /** Spread the low 16 bits of `v` to the even bit positions. */
  private def part1by1(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** x gets the even bits, y the odd bits: z = y15 x15 … y0 x0. */
  def interleave(x: Long, y: Long): Long =
    part1by1(x) | (part1by1(y) << 1)
}

/** `graft_zorder(x, y)` — [[ZOrderKernel.interleave]] as a native
  * codegen'd expression so layout writes stay inside whole-stage
  * codegen at scan speed. Inputs are expected pre-scaled to
  * `[0, 65535]` (min/max normalization); higher bits are masked off.
  */
case class ZOrder2D(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernel.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderKernel.interleave($x, $y);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
