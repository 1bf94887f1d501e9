package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** count_in(tokens, words): how many elements of `tokens` (counting
  * repeats) appear in the small literal set `words` — the marker-word
  * scoring kernel behind language-ID and stopword ratios.
  *
  * Matches `size(filter(tokens, t => t.isin(words)))` exactly (null
  * tokens never match) but runs codegen'd per row instead of through
  * interpreted lambda HOFs, so per-doc scoring against K language
  * profiles needs no token explode, no join, and NO shuffle. `words` is
  * required foldable and is scanned linearly — profile lists are a few
  * entries; for large sets use the relational broadcast-join form. */
object CountInFn {
  def countIn(tokens: ArrayData, words: ArrayData): Int = {
    val n = tokens.numElements()
    val m = words.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        var hit = false
        while (j < m && !hit) {
          if (!words.isNullAt(j) && t.equals(words.getUTF8String(j)))
            hit = true
          j += 1
        }
        if (hit) count += 1
      }
      i += 1
    }
    count
  }
}

case class CountIn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "count_in requires a literal word set")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_in requires (array<string>, array<string>), got $l and $r")
    }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in"

  protected override def nullSafeEval(tokens: Any, words: Any): Any =
    CountInFn.countIn(tokens.asInstanceOf[ArrayData],
      words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, w) => s"graft.functions.CountInFn.countIn($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIn =
    copy(left = newLeft, right = newRight)
}
