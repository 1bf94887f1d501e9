package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity kernel, shared by interpreted eval and
  * generated code.
  *
  * Standard constants (prefix weight 0.1, boost threshold 0.7, prefix
  * cap 4), matching DuckDB's `jaro_winkler_similarity` (the oracle twin)
  * bit-for-bit on every pair the parity harness has thrown at it,
  * including the empty-string corner: two empty strings score 0.0, not
  * 1.0 — that is DuckDB's convention and we follow it so the oracle
  * compare stays exact. Comparison is per UTF-16 code unit; for the
  * ASCII identifiers/names this engine links on, that coincides with
  * DuckDB's per-byte walk (documented caveat: astral-plane text would
  * diverge between the two, as it does between most JW libraries).
  */
object JaroWinklerFn {
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // operation order mirrors the oracle: three ratios, then /3
    val jaro =
      (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (l < pmax && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression for Jaro–Winkler string similarity —
  * Spark has `levenshtein` but no JW; record-linkage scoring needs it
  * in the inner pair loop, so it must live inside whole-stage codegen
  * rather than a Scala UDF (no Row boxing, no closure dispatch per
  * pair). Registered as SQL function `jaro_winkler` by
  * [[graft.GraftExtensions]].
  *
  * Reference behavior: the fuzzy person/provider matching the reference
  * ETL family performs during record linkage (same operator class as
  * `etl/Domains` lower-join matching, one tier stronger).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerFn.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerFn.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
