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

/** Wide (two-plane) shingle kernel — the 64-bit-class prefilter variant
  * of [[ShingleHashesFn]] for the substring-dedup tier
  * (repeatedSpans / exciseSpans / winnowing / boilerplate chunks):
  *
  *   plane 1: th1_j = PolyHashFn.hash(tok_j);  w1 = fold(·31) mod 1e9+7
  *            — IDENTICAL to [[ShingleHashesFn]] (spec-pinned:
  *            wide >> 31 == narrow, elementwise)
  *   plane 2: th2_j = PolyHash2Fn.hash(tok_j); w2 = fold(·131) mod 998244353
  *   shingle[i] = w1·2^31 + w2   (< 2^61 + 2^30 — BIGINT-exact)
  *
  * Why: a 30-bit window-hash space saturates a frequency-gate prefilter
  * at target scale (~10^13 windows ⇒ every hash value repeats ~10^4
  * times and `count > 1` passes the whole corpus); the combined
  * ≈2^59.8-space key keeps expected collisions ~n²/2^60.8 — sliver-sized
  * at 100 TB — while remaining exactly replayable in DuckDB BIGINT
  * lambdas (every intermediate < 2^61; no hugeint, no unsigned wrap).
  * Same short-doc fallback shape: |tokens| < n → one
  * [[PolyHashWideFn]] hash of the space-joined whole doc. */
object ShingleHashesWideFn {
  import PolyHashFn.Mod
  import PolyHash2Fn.{Mod2, Mult2}
  import PolyHashWideFn.Shift

  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < len) {
        if (i > 0) sb.append(' ')
        if (!tokens.isNullAt(i)) sb.append(tokens.getUTF8String(i).toString)
        i += 1
      }
      return new GenericArrayData(Array[Any](
        PolyHashWideFn.hash(UTF8String.fromString(sb.toString))))
    }
    val th1 = new Array[Long](len)
    val th2 = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (tokens.isNullAt(i)) { th1(i) = 0L; th2(i) = 0L }
      else {
        val t = tokens.getUTF8String(i)
        th1(i) = PolyHashFn.hash(t)
        th2(i) = PolyHash2Fn.hash(t)
      }
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      var w1 = th1(i)
      var w2 = th2(i)
      var j = 1
      while (j < n) {
        w1 = (w1 * 31 + th1(i + j)) % Mod
        w2 = (w2 * Mult2 + th2(i + j)) % Mod2
        j += 1
      }
      out(i) = (w1 << Shift) + w2
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

/** shingle_hashes_wide(tokens, n) — see [[ShingleHashesWideFn]].
  * Registered by [[graft.GraftExtensions]]. */
case class ShingleHashesWide(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (!right.foldable) TypeCheckResult.TypeCheckFailure(
          "shingle_hashes_wide requires a literal shingle width")
        else right.eval() match {
          // same analysis-time width validation as shingle_hashes: n <= 0
          // would skip the short-doc fallback and AIOOBE mid-task
          case n: java.lang.Integer if n <= 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"shingle_hashes_wide width must be >= 1, got $n")
          case null => TypeCheckResult.TypeCheckFailure(
            "shingle_hashes_wide width must be a non-null literal")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes_wide requires (array<string>, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes_wide"

  protected override def nullSafeEval(tokens: Any, n: Any): Any =
    ShingleHashesWideFn.shingles(tokens.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.ShingleHashesWideFn.shingles($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashesWide =
    copy(left = newLeft, right = newRight)
}
