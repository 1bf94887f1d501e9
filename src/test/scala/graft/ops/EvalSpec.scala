package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** [[graft.ops.Eval]] — AUC, calibration, Welch t, transition matrix. */
class EvalSpec extends SparkSpecBase {

  test("rankAuc: hand-computed tie case") {
    val s = spark
    import s.implicits._
    // scores: negatives at 1,2 — positives at 2,3.
    // pairs: (p=2 vs n=1) win, (p=2 vs n=2) tie, (p=3 vs n=1) win,
    // (p=3 vs n=2) win  → U = 3.5 of 4 → AUC = 0.875
    val df = Seq(("g", 1.0, 0), ("g", 2.0, 0), ("g", 2.0, 1), ("g", 3.0, 1))
      .toDF("grp", "score", "y")
    val r = Eval.rankAuc(df, "grp", "score", "y").collect().head
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Long]("u2") === 7L) // 2U
    assert(r.getAs[Double]("auc") === 0.875)
  }

  test("rankAuc: perfect separation is 1.0; inverted is 0.0") {
    val s = spark
    import s.implicits._
    val perfect = Seq(("g", 1.0, 0), ("g", 2.0, 0), ("g", 3.0, 1),
      ("g", 4.0, 1)).toDF("grp", "score", "y")
    assert(Eval.rankAuc(perfect, "grp", "score", "y")
      .collect().head.getAs[Double]("auc") === 1.0)
    val inverted = perfect.withColumn("y", lit(1) - col("y"))
    assert(Eval.rankAuc(inverted, "grp", "score", "y")
      .collect().head.getAs[Double]("auc") === 0.0)
  }

  test("rankAuc: degenerate one-class stratum yields NULL, not an error") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 1.0, 1), ("g", 2.0, 1)).toDF("grp", "score", "y")
    val r = Eval.rankAuc(df, "grp", "score", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("rankAuc: partitioning-invariant (integer rank arithmetic)") {
    val s = spark
    import s.implicits._
    val rows = (1 to 400).map(i =>
      ("g" + (i % 3), (i % 17).toDouble, if ((i * 7) % 5 < 2) 1 else 0))
    val df = rows.toDF("grp", "score", "y")
    val a = Eval.rankAuc(df, "grp", "score", "y")
      .orderBy("grp").collect().toSeq
    val b = Eval.rankAuc(df.repartition(13), "grp", "score", "y")
      .orderBy("grp").collect().toSeq
    assert(a === b)
  }

  test("calibrationBins: bin edges, counts, and rates") {
    val s = spark
    import s.implicits._
    // 0.05 → bin 0; 0.55,0.59 → bin 5; 1.0 clamps into bin 9
    val df = Seq((0.05, 0), (0.55, 1), (0.59, 0), (1.0, 1))
      .toDF("score", "y")
    val m = Eval.calibrationBins(df, "score", "y", 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Double]("avg_score"),
          r.getAs[Double]("pos_rate"))).toMap
    assert(m(0L) === ((1L, 0.05, 0.0)))
    assert(m(5L) === ((2L, 0.57, 0.5)))
    assert(m(9L) === ((1L, 1.0, 1.0)))
  }

  test("welchTwoSample: planted effect recovers the textbook t") {
    val s = spark
    import s.implicits._
    // arm0: 1,2,3,4,5 (mean 3, var 2.5); arm1: 6,7,8,9,10 (mean 8)
    val df = ((1 to 5).map(v => ("m", 0, v.toDouble)) ++
      (6 to 10).map(v => ("m", 1, v.toDouble))).toDF("grp", "arm", "v")
    val r = Eval.welchTwoSample(df, "grp", "arm", "v").collect().head
    assert(r.getAs[Long]("n0") === 5L && r.getAs[Long]("n1") === 5L)
    assert(r.getAs[Double]("mean0") === 3.0)
    assert(r.getAs[Double]("mean1") === 8.0)
    assert(r.getAs[Double]("mean_diff") === -5.0)
    // t = -5 / sqrt(2.5/5 + 2.5/5) = -5, df = 8 (equal variances)
    assert(r.getAs[Double]("t_stat") === -5.0)
    assert(r.getAs[Double]("welch_df") === 8.0)
  }

  test("welchTwoSample: identical arms give t = 0") {
    val s = spark
    import s.implicits._
    val df = ((1 to 4) ++ (1 to 4)).zipWithIndex
      .map { case (v, i) => ("m", i / 4, v.toDouble) }.toDF("grp", "arm", "v")
    val r = Eval.welchTwoSample(df, "grp", "arm", "v").collect().head
    assert(r.getAs[Double]("t_stat") === 0.0)
  }

  test("cohenKappa: textbook 2x2 case") {
    val s = spark
    import s.implicits._
    // classic: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    // po = 35/50 = 0.7; pe = (25·30 + 25·20)/2500 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Long]("agree") === 35L)
    assert(r.getAs[Double]("po") === 0.7)
    assert(r.getAs[Double]("pe") === 0.5)
    assert(r.getAs[Double]("kappa") === 0.4)
  }

  test("cohenKappa: perfect agreement = 1, disjoint labels hit the floor") {
    val s = spark
    import s.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("a", "b")
    assert(Eval.cohenKappa(perfect, "a", "b")
      .collect().head.getAs[Double]("kappa") === 1.0)
    // annotators never agree and never share marginals on the diagonal
    val disjoint = Seq(("a", "b"), ("a", "b")).toDF("a", "b")
    val r = Eval.cohenKappa(disjoint, "a", "b").collect().head
    assert(r.getAs[Long]("agree") === 0L)
    assert(r.getAs[Double]("kappa") === 0.0) // pe = 0 too: 0/4 ÷ 4/4
  }

  test("ndcgAtK: hand-computed 3-position case") {
    val s = spark
    import s.implicits._
    // ranking grades by position: 3, 0, 2; ideal multiset {3, 2, 1}
    // gains 7, 0, 3; discounts 1, 1/log2(3), 0.5
    val ranked = Seq((1, 3), (2, 0), (3, 2)).toDF("rank", "rel")
    val ideal = Seq(3, 2, 1, 0, 0).toDF("rel")
    val r = Eval.ndcgAtK(ranked, "rank", "rel", ideal, 3).collect().head
    val w2 = BigDecimal(1.0 / (math.log(3) / math.log(2)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg = BigDecimal(7 * 1.0 + 0 * w2 + 3 * 0.5)
    val idcg = BigDecimal(7 * 1.0) + BigDecimal(3) * BigDecimal(w2) +
      BigDecimal(1) * BigDecimal(0.5)
    assert(r.getAs[Int]("k") === 3)
    assert(math.abs(r.getAs[Double]("dcg") - dcg.toDouble) < 1e-6)
    assert(math.abs(r.getAs[Double]("idcg") - idcg.toDouble) < 1e-6)
    assert(r.getAs[Double]("ndcg") > 0.7 && r.getAs[Double]("ndcg") < 1.0)
  }

  test("ndcgAtK: ideal-ordered ranking scores exactly 1.0") {
    val s = spark
    import s.implicits._
    val ranked = Seq((1, 3), (2, 2), (3, 1)).toDF("rank", "rel")
    val ideal = Seq(3, 2, 1).toDF("rel")
    assert(Eval.ndcgAtK(ranked, "rank", "rel", ideal, 3)
      .collect().head.getAs[Double]("ndcg") === 1.0)
  }

  test("rboAtK: identical lists score (1-p)·ΣW, disjoint lists score 0") {
    val s = spark
    import s.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val same = Eval.rboAtK(a, a, "id", "rank", 3, 0.9).collect().head
    // identical lists: X_d = d at every depth → truncated RBO =
    // (1−p)·Σ p^(d−1) = (1−p)(1+p+p²)
    val want = 0.1 * (1 + 0.9 + 0.81)
    assert(math.abs(same.getAs[Double]("rbo") - want) < 1e-6)
    assert(same.getAs[Long]("n_common") === 3L)
    val b = Seq((40L, 1), (50L, 2), (60L, 3)).toDF("id", "rank")
    val disj = Eval.rboAtK(a, b, "id", "rank", 3, 0.9).collect().head
    assert(disj.getAs[Long]("n_common") === 0L)
    assert(disj.getAs[Double]("rbo") === 0.0)
  }

  test("rboAtK: hand-computed partial overlap") {
    val s = spark
    import s.implicits._
    // A = [x, y], B = [y, x]: X_1 = 0, X_2 = 2
    // RBO = (1−p)·(0·p⁰/1 + 2·p¹/2) = (1−p)·p = 0.09 at p = 0.9
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (1L, 2)).toDF("id", "rank")
    val r = Eval.rboAtK(a, b, "id", "rank", 2, 0.9).collect().head
    assert(math.abs(r.getAs[Double]("rbo") - 0.09) < 1e-6)
  }

  test("isotonicCalibrate: pools adjacent violators, preserves mass") {
    val s = spark
    import s.implicits._
    // bins (score decile, y): rates by bin 0/5: [0.2, 0.8, 0.5, 1.0]
    // PAV pools bins 1+2 → 0.65; output non-decreasing
    def mk(bin: Int, pos: Int, neg: Int) =
      Seq.fill(pos)((bin / 10.0 + 0.05, 1)) ++
        Seq.fill(neg)((bin / 10.0 + 0.05, 0))
    val df = (mk(0, 1, 4) ++ mk(1, 4, 1) ++ mk(2, 5, 5) ++ mk(3, 3, 0))
      .toDF("score", "y")
    val got = Eval.isotonicCalibrate(df, "score", "y", 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Double]("pos_rate"), r.getAs[Double]("calibrated")))
      .toMap
    assert(got(0L) === ((0.2, 0.2)))
    assert(got(1L) === ((0.8, 0.6)))  // pooled (4+5)/(5+10)
    assert(got(2L) === ((0.5, 0.6)))
    assert(got(3L) === ((1.0, 1.0)))
    val cal = got.toSeq.sortBy(_._1).map(_._2._2)
    assert(cal === cal.sorted) // monotone
  }

  test("isotonicCalibrate equals a quadratic reference PAV on random bins") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7L)
    for (_ <- 1 to 5) {
      val bins = (0 until 10).map(b =>
        (b, 1 + rng.nextInt(30), rng.nextInt(31)))
      val rows = bins.flatMap { case (b, n, posCap) =>
        val pos = math.min(posCap, n)
        Seq.fill(pos)((b / 10.0 + 0.05, 1)) ++
          Seq.fill(n - pos)((b / 10.0 + 0.05, 0))
      }
      val got = Eval.isotonicCalibrate(rows.toDF("score", "y"), "score",
          "y", 10)
        .collect().map(r => r.getAs[Long]("bin") ->
          r.getAs[Double]("calibrated")).toMap
      // reference: repeatedly merge ANY adjacent violator until none
      var pools = bins.map { case (b, n, posCap) =>
        (List(b), n.toLong, math.min(posCap, n).toLong) }.toList
      var changed = true
      while (changed) {
        changed = false
        val idx = pools.indices.dropRight(1).find(i =>
          pools(i + 1)._3 * pools(i)._2 < pools(i)._3 * pools(i + 1)._2)
        idx.foreach { i =>
          val (b1, n1, p1) = pools(i); val (b2, n2, p2) = pools(i + 1)
          pools = pools.patch(i, List((b1 ++ b2, n1 + n2, p1 + p2)), 2)
          changed = true
        }
      }
      val want = pools.flatMap { case (bs, n, p) =>
        bs.map(_.toLong -> BigDecimal(p.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }.toMap
      assert(got === want)
    }
  }

  test("transitionMatrix: counts and per-source probabilities") {
    val s = spark
    import s.implicits._
    // user 1: a→b→a→b ; user 2: a→b→c
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .toDF("user_id", "seq", "state")
    val m = Eval.transitionMatrix(df, "user_id", "state", Seq("seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("prob"))).toMap
    assert(m(("a", "b")) === ((3L, 1.0)))      // a always → b
    assert(m(("b", "a")) === ((1L, 0.5)))
    assert(m(("b", "c")) === ((1L, 0.5)))
    assert(!m.contains(("b", "b")))
    // no cross-user transition: user1's last b never pairs with user2's a
    assert(m.values.map(_._1).sum === 5L)
  }
}
