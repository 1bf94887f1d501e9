package graft

import org.apache.spark.sql.functions._

import graft.ops.Eval

/** Round-5 batch 6: matching estimator (q255) and
  * difference-in-differences (q256). */
class CausalSpec extends SparkSpecBase {
  import spark.implicits._

  test("nnMatch: nearest control wins, caliper excludes, replacement allowed") {
    // treated at x=10.0 and x=10.4; controls at 10.1, 11.0, 50.0
    val df = Seq(
      (1, 101L, 10.0, 1.0), (1, 102L, 10.4, 1.0),
      (0, 201L, 10.1, 0.0), (0, 202L, 11.0, 0.0), (0, 203L, 50.0, 0.0))
      .toDF("arm", "id", "x", "y").withColumn("g", lit("s"))
    val m = Eval.nnMatch(df, Seq("g"), "arm", "id", "x", "y", 1.0)
      .collect().map(r => r.getAs[Long]("treated_id") ->
        (r.getAs[Long]("control_id"), r.getAs[Double]("gap"))).toMap
    assert(m(101L) == ((201L, 0.1)), "nearest, not just in-caliper")
    assert(m(102L) == ((201L, 0.3)), "with replacement: 201 matches twice")
    // a treated row with no control within the caliper is unmatched
    val far = Seq((1, 301L, 99.0, 1.0), (0, 302L, 90.0, 0.0))
      .toDF("arm", "id", "x", "y").withColumn("g", lit("f"))
    assert(Eval.nnMatch(far, Seq("g"), "arm", "id", "x", "y", 1.0)
      .count() == 0)
  }

  test("nnMatch: equal gaps break by control id; attEstimate recovers effect") {
    // two controls exactly ±0.5 away → tie on gap, smaller id wins
    val df = Seq((1, 10L, 5.0, 3.0), (0, 21L, 5.5, 1.0),
      (0, 20L, 4.5, 2.0)).toDF("arm", "id", "x", "y")
      .withColumn("g", lit("t"))
    val pairs = Eval.nnMatch(df, Seq("g"), "arm", "id", "x", "y", 1.0)
    val r = pairs.collect().head
    assert(r.getAs[Long]("control_id") == 20L)
    val att = Eval.attEstimate(pairs, Seq("g")).collect().head
    assert(att.getAs[Long]("n_matched") == 1L)
    assert(att.getAs[Double]("att") == 1.0) // 3.0 − 2.0
  }

  test("cupedAdjust: perfect covariate kills variance, effect unbiased") {
    // zero-effect experiment, y = x exactly, arms drawn imbalanced:
    // θ = Cov(x,x)/Var(x) = 1, var_ratio = 0, and CUPED recovers the
    // TRUE null effect while the raw diff reads the x imbalance as +1
    val rows = Seq((0, 1.0), (0, 3.0), (0, 5.0), (1, 2.0), (1, 4.0),
      (1, 6.0)).map { case (arm, x) => ("k", arm, x, x) }
    val r = Eval.cupedAdjust(rows.toDF("g", "arm", "x", "y"),
      Seq("g"), "arm", "x", "y").collect().head
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Double]("var_ratio") == 0.0)
    assert(r.getAs[Double]("diff_raw") == 1.0,
      "raw diff reads pure covariate imbalance as an effect")
    assert(r.getAs[Double]("diff_cuped") == 0.0,
      "CUPED subtracts the imbalance and reports the true null")
    // uncorrelated covariate → θ≈0, adjustment is a no-op; zero
    // covariate variance → NULL θ, raw diff still reported
    val flat = Seq(("k", 0, 5.0, 1.0), ("k", 0, 5.0, 3.0),
      ("k", 1, 5.0, 2.0), ("k", 1, 5.0, 6.0)).toDF("g", "arm", "x", "y")
    val rf = Eval.cupedAdjust(flat, Seq("g"), "arm", "x", "y")
      .collect().head
    assert(rf.isNullAt(rf.fieldIndex("theta")))
    assert(rf.getAs[Double]("diff_raw") == 2.0)
  }

  test("didEstimate: recovers a planted additive effect exactly") {
    // control: pre 10, post 12 (trend +2); treated: pre 20, post 25
    // (trend +2 plus effect +3) → DiD = 3
    def cell(arm: Int, p: Int, base: Double) =
      Seq(base - 1, base, base + 1).map(v => ("k", arm, p, v))
    val df = (cell(0, 0, 10) ++ cell(0, 1, 12) ++ cell(1, 0, 20) ++
      cell(1, 1, 25)).toDF("g", "arm", "period", "y")
    val r = Eval.didEstimate(df, Seq("g"), "arm", "period", "y")
      .collect().head
    assert(r.getAs[Double]("did") == 3.0)
    // four cells of variance 1, n=3 → se = sqrt(4·(1/3)) = 2/√3
    assert(math.abs(r.getAs[Double]("se") - 2.0 / math.sqrt(3)) < 5e-7)
    // degenerate cell (n=1) → NULL estimate
    val deg = (cell(0, 0, 10) ++ cell(0, 1, 12) ++ cell(1, 0, 20) ++
      Seq(("k", 1, 1, 25.0))).toDF("g", "arm", "period", "y")
    val rd = Eval.didEstimate(deg, Seq("g"), "arm", "period", "y")
      .collect().head
    assert(rd.isNullAt(rd.fieldIndex("did")))
  }
}
