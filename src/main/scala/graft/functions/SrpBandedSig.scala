package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All-bands SRP signature kernel: band b's bit k is the sign of the
  * projection of the (already centered) vector onto family plane
  * j = b·planesPerBand + k, with the plane's ±1 components derived
  * ARITHMETICALLY from (j, i) — parity of (a_j·(i+1) + b_j) mod m with
  * the Knuth-mixed per-plane coefficients of
  * [[graft.ops.VectorOps.planeSignValue]]. The projection accumulates in
  * strictly ascending dimension order (acc += v[i]·sign), the identical
  * double sequence as the unrolled vec_dot-per-plane Column form and the
  * DuckDB oracle's list_reduce — bit-identical results.
  *
  * WHY A NATIVE EXPRESSION: the Column form unrolls bands·planes vec_dot
  * calls, each against a dim-length literal array — at the recall
  * contract's own sizing (b ≈ 24–32, p ≈ 17–19 beyond n ≈ 10⁶) the
  * generated consume function passes 64 KB and whole-stage codegen
  * FAILS ("Code grows beyond 64 KB", measured at n = 4M), silently
  * falling back to interpreted evaluation exactly where the operator is
  * supposed to scale. This kernel is three nested loops regardless of
  * (bands, planes, dim) — constant code size, always inside codegen —
  * and skips materializing bands·planes·dim plane literals entirely. */
object SrpBandedSigFn {
  private val M = 1000000007L

  def eval(v: ArrayData, bands: Int, planesPerBand: Int): ArrayData = {
    val n = v.numElements()
    // null element → null signature array. DELIBERATELY PINNED KERNEL
    // CONTRACT, stricter than the unrolled form: unrolled srpSignature
    // maps a null vec_dot to a 0 bit (when(...).otherwise(0L) → sig 0,
    // row still bucketed), while this kernel nulls the whole array so
    // the row drops at posexplode. End-to-end near-dup output is
    // unaffected (exact-cosine verify filters null cosines either way),
    // but candidate sets differ on out-of-contract null-element vectors
    // — the Round10Spec null test pins THIS behavior as the contract.
    var c = 0
    while (c < n) {
      if (v.isNullAt(c)) return null
      c += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var k = 0
      while (k < planesPerBand) {
        val j = b * planesPerBand + k
        val aj = 2654435761L * (j + 1) % M
        val bj = 2246822519L * (j + 1) % M
        var acc = 0.0
        var i = 0
        while (i < n) {
          val s = if ((aj * (i + 1) + bj) % M % 2 == 0) 1.0 else -1.0
          acc += v.getDouble(i) * s
          i += 1
        }
        if (acc > 0) sig |= 1L << k
        k += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** srp_banded_sig(centered_vec): array of `bands` band signatures over a
  * non-null array<double>. Registered by [[graft.GraftExtensions]] is
  * not needed — constructed directly by
  * [[graft.ops.VectorOps.srpBandedNearDupPairs]] via Column wrapping. */
case class SrpBandedSig(child: Expression, bands: Int, planesPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1, s"bands must be >= 1, got $bands")
  require(planesPerBand >= 1 && planesPerBand <= 63,
    s"planesPerBand must be in [1, 63], got $planesPerBand")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_banded_sig requires array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null ELEMENT → null result
  override def prettyName: String = "srp_banded_sig"

  protected override def nullSafeEval(v: Any): Any =
    SrpBandedSigFn.eval(v.asInstanceOf[ArrayData], bands, planesPerBand)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.SrpBandedSigFn.eval($v, $bands, $planesPerBand);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SrpBandedSig = copy(child = newChild)
}
