package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton / Z-order bit interleaving for data-layout clustering.
  *
  * `zorder2(x, y)` interleaves the low 32 bits of two longs — x on even
  * output bits, y on odd — so sorting by the result places rows that are
  * close in BOTH dimensions into the same parquet files. That is the
  * layout trick behind multi-dimensional min/max pruning: a scan
  * filtered on either key (or a box on both) touches a small contiguous
  * band of z-sorted files instead of every file, because per-file
  * column statistics stay tight on both dimensions at once. Writing
  * `df.repartitionByRange(col("z")).sortWithinPartitions("z")` before a
  * parquet sink is the 100 TB application; the expression itself is
  * pure per-row bit math — no shuffle, no state.
  *
  * The classic O(log w) mask-shift spreading (public domain "Bit
  * Twiddling Hacks" / Morton 1966) runs 6 ops per operand, branch-free,
  * and stays inside whole-stage codegen via the static helper call.
  */
object InterleaveBitsFn {
  /** Spread the low 32 bits of v onto the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def zorder2(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** Native expression `zorder2(x, y)` → long Morton code of the two keys'
  * low 32 bits. Inputs beyond 32 bits must be bucketized first (e.g.
  * `pmod(key, 1 << 16)`) — the high half is deliberately ignored rather
  * than folded in, so callers control the precision/range trade-off.
  * Registered by [[graft.GraftExtensions]].
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires (bigint, bigint), got $l and $r")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  protected override def nullSafeEval(x: Any, y: Any): Any =
    InterleaveBitsFn.zorder2(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.InterleaveBitsFn.zorder2($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}
