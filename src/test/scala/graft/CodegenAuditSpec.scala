package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** The 64 KB-wall audit (r10 verdict #7): r10 found whole-stage codegen
  * failing SILENTLY — "Code grows beyond 64 KB" logs a warning and falls
  * back to interpretation — at the SRP tier's own contract sizing.
  * Any expression builder whose GENERATED-CODE size scales with a sizing
  * rule (not just its data) eventually hits the same wall. This spec
  * compiles the actual generated source of every WholeStageCodegen span
  * in each audited operator AT PRODUCTION SIZING and asserts every
  * method stays under the JVM's 65535-byte limit — so a regression back
  * to literal unrolling fails loudly here instead of silently
  * interpreting at scale.
  *
  * Audited sites and why they pass today:
  *  - assignToCentroids at k = 256, dim = 768: centroids are a BROADCAST
  *    JOIN side (data), never folded into the expression — code size is
  *    constant in k and dim.
  *  - pqTopK / pqEncode at production (m = 96, k = 256): the ADC lookup
  *    table is broadcast ROWS joined on (subspace, code), not a literal
  *    CASE — constant code size.
  *  - hllRelational: the ln(m/z) table is ONE folded array literal (a
  *    reference object, m = 512 doubles of data), and the rho CASE is
  *    bounded by wBits ≈ 31 arms — both constant in input size.
  *  - bpe_segment at 4k merges (Round11Spec) and srp_banded_sig at the
  *    4M-corpus sizing: native kernels, three loops each.
  *  - srpSignature (single-table, unrolled) is BOUNDED at 63 planes by
  *    construction; it breaks past ~300 (r10 measurement), which the
  *    banded kernel replaced everywhere unbounded sizing applies.
  */
class CodegenAuditSpec extends SparkSpecBase {

  /** Every WholeStageCodegen span reachable in the (possibly adaptive)
    * executed plan — materialized stages included. Executes the frame
    * once so AQE has final stages to expose. */
  private def codegenSpans(df: DataFrame): Seq[WholeStageCodegenExec] = {
    // collect() drives THIS df's own QueryExecution to its final
    // adaptive plan (count() would plan a separate aggregate query and
    // leave this one isFinalPlan=false)
    df.collect()
    def dig(p: SparkPlan): Seq[WholeStageCodegenExec] = {
      val here = p.collect { case w: WholeStageCodegenExec => w }
      val staged = p.collect { case q: QueryStageExec => q }
        .flatMap(q => dig(q.plan))
      val adaptive = p.collect { case a: AdaptiveSparkPlanExec => a }
        .flatMap(a => dig(a.executedPlan))
      here ++ staged ++ adaptive
    }
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => dig(a.executedPlan)
      case p => dig(p)
    }
  }

  private def assertUnderWall(df: DataFrame, what: String): Unit = {
    val spans = codegenSpans(df)
    assert(spans.nonEmpty,
      s"$what: no WholeStageCodegen span at all — already fallen back?\n" +
        df.queryExecution.executedPlan)
    spans.foreach { w =>
      val (_, source) = w.doCodeGen()
      val (_, stats) =
        org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
          .compile(source)
      assert(stats.maxMethodCodeSize < 65535,
        s"$what: generated method ${stats.maxMethodCodeSize} B — past " +
          "the 64 KB wall")
    }
  }

  /** k deterministic centroids at dim 768 — production coarse-codebook
    * sizing. */
  private def centroids(k: Int, dim: Int): DataFrame =
    spark.range(k).select(col("id").as("centroid_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L)
          .cast("double") / 1000.0)).as("centroid"))

  private def vecs(n: Int, dim: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(xxhash64(col("id"), j, lit(7)), lit(2001L)) - 1000L)
          .cast("double") / 1000.0)).as("embedding"))

  test("assignToCentroids stays codegen'd at k=256, dim=768 " +
      "(broadcast codebook, constant code size)") {
    assertUnderWall(
      VectorOps.assignToCentroids(vecs(200, 768), centroids(256, 768)),
      "assignToCentroids k=256 dim=768")
  }

  test("pqEncode + pqTopK stay codegen'd at production PQ sizing " +
      "(m=96, k=256, dim=768 — ADC table is broadcast rows)") {
    val m = 96
    val dim = 768
    val dsub = dim / m
    // codebooks: m subspaces × 256 codes of dsub-dim centroids
    val books = spark.range(m).select(col("id").as("subspace"))
      .crossJoin(spark.range(256).select(col("id").as("centroid_id")))
      .select(col("subspace"), col("centroid_id"),
        transform(sequence(lit(0), lit(dsub - 1)),
          j => ((pmod(xxhash64(col("subspace"), col("centroid_id"), j),
            lit(2001L)) - 1000L).cast("double") / 1000.0).as("c"))
          .as("centroid"))
    val v = vecs(50, dim)
    val codes = VectorOps.pqEncode(v, books, m)
    assertUnderWall(codes, "pqEncode m=96 k=256")
    assertUnderWall(
      VectorOps.pqTopK(vecs(5, dim), codes, books, m, 10),
      "pqTopK m=96 k=256")
  }

  test("hllRelational stays codegen'd (folded ln table + bounded rho " +
      "CASE — constant code size in input rows)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), graft.ops.TextOps.polyHash(col("text")).as("h"))
    assertUnderWall(
      graft.ops.Sketches.hllRelational(docs, "lang", col("h")),
      "hllRelational")
  }

  test("srpSignature's unrolled form is BOUNDED at 63 planes — the " +
      "bound itself keeps it under the wall (past ~300 it breaks, " +
      "which is why unbounded sizing rides srp_banded_sig)") {
    // 63 planes (the construction maximum) over dim 768: the worst the
    // single-table tier can generate
    val v = vecs(100, 768)
    val sig = v.select(col("vec_id"),
      VectorOps.srpSignature(col("embedding"), 63, 768).as("sig"))
    assertUnderWall(sig, "srpSignature p=63 dim=768")
  }
}
