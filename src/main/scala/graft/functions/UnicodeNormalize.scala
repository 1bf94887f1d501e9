package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel shared by interpreted eval and generated code: NFD-decompose,
  * drop combining marks (Unicode category M), recompose-free — the
  * standard accent-fold used by corpus normalizers (matches DuckDB's
  * utf8proc `strip_accents` on Latin text, which the q72 oracle uses).
  * ASCII input is returned unchanged without allocation. */
object AccentFoldFn {
  def fold(s: UTF8String): UTF8String = {
    // fast path: pure-ASCII bytes can't decompose
    if (s.isFullAscii) return s
    val str = s.toString
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native accent-folding expression for text normalization.
  *
  * Spark has no built-in Unicode normalizer; the alternatives are a Scala
  * UDF (serialization boundary, breaks whole-stage codegen) or driver-side
  * preprocessing (not distributed). This expression evaluates in-line via
  * a static call, stays inside the generated loop, and short-circuits
  * ASCII rows — at 100 TB of mostly-ASCII text the normalizer costs one
  * branch per row.
  *
  * Registered as SQL function `accent_fold` by [[graft.GraftExtensions]].
  */
case class AccentFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"accent_fold requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "accent_fold"

  protected override def nullSafeEval(input: Any): Any =
    AccentFoldFn.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AccentFoldFn.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): AccentFold =
    copy(child = newChild)
}
