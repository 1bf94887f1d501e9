package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shingle kernel: token array → array of n-gram polynomial hashes,
  * bit-identical to the relational posexplode→poly_hash→lead-window fold
  * it replaces (NearDupSpec asserts equality):
  *
  *   per-token h_j  = PolyHashFn.hash(tok_j)
  *   shingle[i]     = ((…(h_i·31 + h_{i+1})·31 + …)·31 + h_{i+n-1}) mod M
  *   |tokens| < n   → one hash of the space-joined whole doc
  *
  * One pass, no per-row window, no shuffle: the (doc, shingle) stream is
  * produced by a scan-side explode instead of a corpus-wide shuffle+sort
  * on the doc key — at 100 TB that removes the single widest exchange in
  * the near-dup pipeline. */
object ShingleHashesFn {
  import PolyHashFn.Mod

  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) {
      // whole-doc fallback: hash of tokens joined by a single space
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < len) {
        if (i > 0) sb.append(' ')
        if (!tokens.isNullAt(i)) sb.append(tokens.getUTF8String(i).toString)
        i += 1
      }
      return new GenericArrayData(Array[Any](
        PolyHashFn.hash(UTF8String.fromString(sb.toString))))
    }
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = if (tokens.isNullAt(i)) 0L
        else PolyHashFn.hash(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      var h = th(i)
      var j = 1
      while (j < n) {
        h = (h * 31 + th(i + j)) % Mod
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** shingle_hashes(tokens, n). Registered by [[graft.GraftExtensions]]. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (!right.foldable) TypeCheckResult.TypeCheckFailure(
          "shingle_hashes requires a literal shingle width")
        else right.eval() match {
          // validate the width HERE, at analysis: n <= 0 skips the
          // short-doc fallback (len >= n always holds) and the fold loop
          // then reads th(len) — an executor-side AIOOBE mid-task
          // instead of a clean error
          case n: java.lang.Integer if n <= 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"shingle_hashes width must be >= 1, got $n")
          // a null literal (lit(null).cast("int")) is foldable too and
          // would otherwise slide through to success, deferring the
          // failure to a per-row null on the executor
          case null => TypeCheckResult.TypeCheckFailure(
            "shingle_hashes width must be a non-null literal")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires (array<string>, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(tokens: Any, n: Any): Any =
    ShingleHashesFn.shingles(tokens.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.ShingleHashesFn.shingles($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}
