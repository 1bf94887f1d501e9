package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{AccentFold, BpeSegment, CountIn, InterleaveBits, JaroWinkler, JumpHash, PolyHash, PolyHashWide, ShingleHashes, ShingleHashesWide, SrpBandedSig, VecDot}

/** Engine extensions, injected via spark.sql.extensions (set by
  * [[graft.core.Sessions]]). Registers the native expressions so they are
  * callable from SQL and via functions.call_function. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR",
      messageParameters = Map("message" -> msg))

  private def foldableInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = e match {
    case l: org.apache.spark.sql.catalyst.expressions.Literal
        if l.foldable && l.value != null =>
      l.value match {
        case i: Int   => i
        case s: Short => s.toInt
        case b: Byte  => b.toInt
        case l2: Long if l2 == l2.toInt => l2.toInt
        case other => analysisError(
          s"$what must be an integral literal, got $other (${l.dataType.sql})")
      }
    case other => analysisError(
      s"$what must be an integer literal, got $other")
  }

  /** The merge table of bpe_segment arrives as a foldable
    * array<struct<l string, r string>> literal and is consumed HERE, at
    * function-build time — the table becomes constructor data of
    * [[graft.functions.BpeSegment]] (codegen reference object), so the
    * generated code size is constant in the merge count. */
  private def foldableMergePairs(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[(String, String)] = {
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        s: org.apache.spark.sql.types.StructType, _) =>
        s.fields.length == 2 &&
          s.fields.forall(_.dataType ==
            org.apache.spark.sql.types.StringType)
      case _ => false
    })
    if (!ok) analysisError(
      s"bpe_segment merges must be a foldable array<struct<l string, " +
        s"r string>> literal, got $e (${e.dataType.sql})")
    val data = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until data.numElements()).map { i =>
      val row = data.getStruct(i, 2)
      (row.getUTF8String(0).toString, row.getUTF8String(1).toString)
    }
  }

  private def requireArity(
      fn: String,
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      n: Int): Unit =
    if (children.size != n)
      analysisError(s"$fn requires exactly $n arguments, got ${children.size}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("count_in"),
      new ExpressionInfo(classOf[CountIn].getName, "count_in"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CountIn(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashes(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("poly_hash_wide"),
      new ExpressionInfo(classOf[PolyHashWide].getName, "poly_hash_wide"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHashWide(children.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes_wide"),
      new ExpressionInfo(classOf[ShingleHashesWide].getName,
        "shingle_hashes_wide"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashesWide(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("accent_fold"),
      new ExpressionInfo(classOf[AccentFold].getName, "accent_fold"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AccentFold(children.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "zorder2"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        InterleaveBits(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JaroWinkler(children(0), children(1))))
    // optimizer tier: naive |a−b| <= c joins become banded equi-joins
    ext.injectOptimizerRule(_ => graft.plans.ProximityJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("srp_banded_sig"),
      new ExpressionInfo(classOf[SrpBandedSig].getName, "srp_banded_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity("srp_banded_sig", children, 3)
        SrpBandedSig(children(0),
          foldableInt(children(1), "srp_banded_sig bands"),
          foldableInt(children(2), "srp_banded_sig planesPerBand"))
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_segment"),
      new ExpressionInfo(classOf[BpeSegment].getName, "bpe_segment"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        requireArity("bpe_segment", children, 2)
        BpeSegment(children(0), foldableMergePairs(children(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("jump_hash"),
      new ExpressionInfo(classOf[JumpHash].getName, "jump_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        JumpHash(children(0), children(1))))
  }
}
