package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge table as a DATA object for [[BpeSegment]]: one entry per
  * learned merge, in rank order. Lives in the codegen references array
  * (ctx.addReferenceObj), NEVER in the generated source — the whole point.
  *
  * WHY A KERNEL (r10 verdict #2): `Bpe.encode` used to apply the merge
  * table as nested literal folds — one aggregate/zip/when expression
  * LAYER per merge — so the expression tree and the generated consume
  * function both grow O(merges). That is the exact disease r10 diagnosed
  * in the SRP tier: at a production tokenizer's 32k merges, Catalyst
  * analysis cost explodes and the generated method passes the JVM's
  * 64 KB limit, silently dropping whole-stage codegen where the encoder
  * must scale. This class applies the same left-to-right non-overlapping
  * passes imperatively: constant generated-code size at ANY merge count,
  * spec-pinned bit-identical to the fold form (Round11Spec). */
final class BpeMergeTable(val lefts: Array[UTF8String],
                          val rights: Array[UTF8String],
                          val joins: Array[UTF8String])
    extends Serializable {
  private val empty = UTF8String.fromString("")

  /** Segment one word: seed symbols via the SAME split call as the
    * engine's split(w, "") (UTF8String.split with limit -1 — byte-exact
    * seed parity), then each merge in rank order as one pass replacing
    * a trailing `left` followed by `right` with the joined symbol — a
    * freshly-joined symbol never re-matches `left` within its own pass,
    * so "aaa" under (a,a) → [aa, a], as BPE defines it (the fold form's
    * element_at(acc, -1) semantics, exactly). */
  def apply(w: UTF8String): ArrayData = {
    var syms: Array[UTF8String] = w.split(empty, -1)
    var m = 0
    while (m < lefts.length) {
      val l = lefts(m)
      val r = rights(m)
      val out = new Array[UTF8String](syms.length)
      var o = 0
      var i = 0
      while (i < syms.length) {
        val x = syms(i)
        if (o > 0 && out(o - 1).equals(l) && x.equals(r)) {
          out(o - 1) = joins(m)
        } else {
          out(o) = x
          o += 1
        }
        i += 1
      }
      syms = if (o == syms.length) out
        else java.util.Arrays.copyOf(out, o)
      m += 1
    }
    new GenericArrayData(syms.asInstanceOf[Array[Any]])
  }
}

object BpeMergeTable {
  def apply(merges: Seq[(String, String)]): BpeMergeTable =
    new BpeMergeTable(
      merges.map(m => UTF8String.fromString(m._1)).toArray,
      merges.map(m => UTF8String.fromString(m._2)).toArray,
      merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray)
}

/** bpe_segment(word): the word's subword symbols under the merge table,
  * merges applied in rank order as left-to-right non-overlapping passes.
  * Registered by [[graft.GraftExtensions]] with the merge table passed
  * as a foldable array<struct<l,r>> literal (consumed at function-build
  * time — the table is constructor DATA here, so generated code size is
  * constant in the merge count). */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment requires a string word, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  @transient private lazy val table = BpeMergeTable(merges)

  protected override def nullSafeEval(w: Any): Any =
    table.apply(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.apply($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeSegment = copy(child = newChild)
}
