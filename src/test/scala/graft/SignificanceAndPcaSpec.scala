package graft

import org.apache.spark.sql.functions._

import graft.ops.{Eval, Stats, TimeSeries, VectorOps}

/** Round-6 operator family: Mann–Whitney U, one-way ANOVA F,
  * Benjamini–Hochberg FDR, two-group log-rank, matryoshka retrieval,
  * PCA power iteration. The value gate for q215–q219 is the DuckDB
  * oracle; these specs pin closed-form fixtures and the algebraic
  * contracts a value compare can't see. q220 (PCA) has NO oracle — the
  * spectral assertions here are its primary gate. */
class SignificanceAndPcaSpec extends SparkSpecBase {

  test("mannWhitneyU: separated arms match the closed form, U0+U1=n0·n1") {
    import spark.implicits._
    // arm0 = {1,2,3}, arm1 = {4,5,6}: U0 = 0, z = −4.5/√5.25
    val df = Seq(("g", 0, 1.0), ("g", 0, 2.0), ("g", 0, 3.0),
      ("g", 1, 4.0), ("g", 1, 5.0), ("g", 1, 6.0))
      .toDF("k", "arm", "v")
    val r = Eval.mannWhitneyU(df, Seq("k"), "arm", "v").collect().head
    assert(r.getAs[Double]("u") == 0.0)
    val zExp = math.rint(-4.5 / math.sqrt(5.25) * 1e4) / 1e4
    assert(r.getAs[Double]("z") == zExp, s"z ${r.getAs[Double]("z")}")
    // p ≈ 2(1−Φ(1.96..)) ≈ 0.0496 — A&S poly is good to 1.5e-7
    assert(math.abs(r.getAs[Double]("p_two") - 0.049535) < 1e-3)
    // tie-heavy fixture: U from direct pair counting (wins + half-ties)
    val a0 = Seq(1.0, 2.0, 2.0, 3.0, 7.0)
    val a1 = Seq(2.0, 3.0, 3.0, 5.0)
    val uRef = (for (x <- a0; y <- a1) yield
      if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
    val df2 = (a0.map(("g", 0, _)) ++ a1.map(("g", 1, _)))
      .toDF("k", "arm", "v")
    val r2 = Eval.mannWhitneyU(df2, Seq("k"), "arm", "v").collect().head
    assert(r2.getAs[Double]("u") == uRef, s"u ${r2.getAs[Double]("u")} ref $uRef")
    // complement law: swapping arms gives n0·n1 − U
    val df2s = df2.withColumn("arm", lit(1) - col("arm"))
    val r2s = Eval.mannWhitneyU(df2s, Seq("k"), "arm", "v").collect().head
    assert(r2.getAs[Double]("u") + r2s.getAs[Double]("u") ==
      a0.size.toDouble * a1.size)
    // degenerate strata: empty arm and zero variance → NULL z/p
    val deg = Seq(("e", 0, 1.0), ("e", 0, 2.0),
      ("c", 0, 5.0), ("c", 1, 5.0)).toDF("k", "arm", "v")
    Eval.mannWhitneyU(deg, Seq("k"), "arm", "v").collect().foreach { row =>
      assert(row.isNullAt(row.fieldIndex("z")), s"expected null z: $row")
    }
  }

  test("anovaF: textbook fixture F=3, eta²=1/2; equal groups give F=0") {
    import spark.implicits._
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 3, 4).map(("b", _)) ++
      Seq(3, 4, 5).map(("c", _))).map { case (g, v) => (g, v.toDouble) }
      .toDF("g", "v")
    val r = Eval.anovaF(df, "g", "v").collect().head
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("df1") == 2L &&
      r.getAs[Long]("df2") == 6L)
    assert(r.getAs[Double]("f") == 3.0 && r.getAs[Double]("eta_sq") == 0.5)
    val same = (Seq("a", "b", "c").flatMap(g =>
      Seq(1.0, 2.0, 3.0).map((g, _)))).toDF("g", "v")
    assert(Eval.anovaF(same, "g", "v").collect().head
      .getAs[Double]("f") == 0.0)
  }

  test("bhFdr: step-up running min matches the hand calculation") {
    import spark.implicits._
    val df = Seq(("s1", 0.005), ("s2", 0.009), ("s3", 0.05), ("s4", 0.5))
      .toDF("k", "p")
    val got = Stats.bhFdr(df, "p", Seq("k")).collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("p_adj"))).toMap
    // q = [0.02, 0.018, 0.066667, 0.5]; running min from the top:
    assert(got("s1") == ((1, 0.018)) && got("s2") == ((2, 0.018)))
    assert(got("s3") == ((3, 0.066667)) && got("s4") == ((4, 0.5)))
    // NULL p rows (untestable strata) are excluded from m and output
    val withNull = Seq(("s1", Some(0.005)), ("s2", Some(0.009)),
      ("s3", Some(0.05)), ("s4", Some(0.5)), ("s5", None: Option[Double]))
      .toDF("k", "p")
    val adj = Stats.bhFdr(withNull, "p", Seq("k"))
    assert(adj.count() == 4 &&
      adj.agg(max(col("m"))).collect().head.getLong(0) == 4L)
  }

  test("logRank: mirrored arms give chi2=0; single-arm death excess is large") {
    import spark.implicits._
    // identical duration/event profiles in both arms → O0 = E0 exactly
    val base = Seq((3L, 1), (5L, 1), (5L, 0), (9L, 1), (12L, 0))
    val mirrored = (base.map { case (t, e) => (t, e, 0) } ++
      base.map { case (t, e) => (t, e, 1) }).toDF("dur", "ev", "arm")
    val r = TimeSeries.logRank(mirrored, "dur", "ev", "arm").collect().head
    assert(r.getAs[Double]("chi2") == 0.0, s"chi2 ${r}")
    assert(r.getAs[Long]("o0") == 3L &&
      math.abs(r.getAs[Double]("e0") - 3.0) < 1e-8)
    // arm0 dies early, arm1 survives long → chi2 clearly > 3.84 (5% cut)
    val split = ((1 to 12).map(i => (i.toLong, 1, 0)) ++
      (30 to 41).map(i => (i.toLong, 1, 1))).toDF("dur", "ev", "arm")
    assert(TimeSeries.logRank(split, "dur", "ev", "arm").collect().head
      .getAs[Double]("chi2") > 3.84)
  }

  test("twoProportionZ: closed form on a 10/40 vs 20/40 table; degenerate → NULL") {
    import spark.implicits._
    val df = ((1 to 40).map(i => ("g", 0, if (i <= 10) 1 else 0)) ++
      (1 to 40).map(i => ("g", 1, if (i <= 20) 1 else 0)))
      .toDF("k", "arm", "conv")
    val r = Eval.twoProportionZ(df, Seq("k"), "arm", "conv").collect().head
    assert(r.getAs[Double]("p0") == 0.25 && r.getAs[Double]("p1") == 0.5)
    val zExp = math.rint((0.25 - 0.5) /
      math.sqrt((0.375 * 0.625) * (1.0 / 40 + 1.0 / 40)) * 1e4) / 1e4
    assert(r.getAs[Double]("z") == zExp)
    // all-success pool is untestable → NULL z/p
    val deg = Seq(("g", 0, 1), ("g", 1, 1)).toDF("k", "arm", "conv")
    val dr = Eval.twoProportionZ(deg, Seq("k"), "arm", "conv")
      .collect().head
    assert(dr.isNullAt(dr.fieldIndex("z")))
  }

  test("cmhTest: single-stratum closed form; stratified o>e survives a Simpson flip") {
    import spark.implicits._
    // one stratum: arm0 10/20, arm1 5/20 → E=7.5, V=2.403846154,
    // chi2 = 6.25/V = 2.6
    val one = ((1 to 20).map(i => ("h", 0, if (i <= 10) 1 else 0)) ++
      (1 to 20).map(i => ("h", 1, if (i <= 5) 1 else 0)))
      .toDF("s", "arm", "conv")
    val r = Eval.cmhTest(one, Seq("s"), "arm", "conv").collect().head
    assert(r.getAs[Long]("o") == 10L && r.getAs[Double]("e") == 7.5)
    assert(r.getAs[Double]("chi2") == 2.6, s"chi2 $r")
    // Simpson: arm0 beats arm1 inside each stratum, but arm0 is
    // concentrated in the hard stratum so the COLLAPSED rate reverses
    val s1 = (1 to 10).map(i => ("easy", 0, if (i <= 9) 1 else 0)) ++
      (1 to 90).map(i => ("easy", 1, if (i <= 72) 1 else 0))
    val s2 = (1 to 90).map(i => ("hard", 0, if (i <= 27) 1 else 0)) ++
      (1 to 10).map(i => ("hard", 1, if (i <= 2) 1 else 0))
    val df = (s1 ++ s2).toDF("s", "arm", "conv")
    // collapsed: arm0 36/100 < arm1 74/100; stratified: arm0 better
    val c = Eval.cmhTest(df, Seq("s"), "arm", "conv").collect().head
    assert(c.getAs[Long]("o") > math.round(c.getAs[Double]("e")),
      s"stratified direction lost: $c")
  }

  test("jsDivergence: 0 for identical arms, ln 2 for disjoint supports") {
    import spark.implicits._
    val same = (for (a <- 0 to 1; k <- Seq("x", "y", "z"); _ <- 1 to 5)
      yield ("g", a, k)).toDF("grp", "arm", "key")
    val r0 = Stats.jsDivergence(same, Seq("grp"), "arm", "key")
      .collect().head
    assert(r0.getAs[Double]("jsd") == 0.0 &&
      r0.getAs[Double]("js_dist") == 0.0)
    val disjoint = ((1 to 8).map(_ => ("g", 0, "a")) ++
      (1 to 6).map(_ => ("g", 1, "b"))).toDF("grp", "arm", "key")
    val r1 = Stats.jsDivergence(disjoint, Seq("grp"), "arm", "key")
      .collect().head
    assert(r1.getAs[Double]("jsd") == 0.693147, s"jsd $r1")
  }

  test("kendallTauB: ±1 on monotone series, tie fixture matches closed form") {
    import spark.implicits._
    val mono = (1 to 30).map(i => (i, i.toLong, (i * i).toLong))
      .toDF("k", "x", "y")
    assert(Stats.kendallTauB(mono, "k", "x", "y").collect().head
      .getAs[Double]("tau_b") == 1.0)
    val rev = (1 to 30).map(i => (i, i.toLong, (100 - i).toLong))
      .toDF("k", "x", "y")
    assert(Stats.kendallTauB(rev, "k", "x", "y").collect().head
      .getAs[Double]("tau_b") == -1.0)
    // x=(1,1,2), y=(1,2,3): C=2, D=0, tx=1, ty=0 → 2/√6
    val tied = Seq((1, 1L, 1L), (2, 1L, 2L), (3, 2L, 3L))
      .toDF("k", "x", "y")
    val r = Stats.kendallTauB(tied, "k", "x", "y").collect().head
    assert(r.getAs[Long]("concordant") == 2L &&
      r.getAs[Long]("discordant") == 0L)
    assert(r.getAs[Double]("tau_b") ==
      math.rint(2.0 / math.sqrt(6.0) * 1e6) / 1e6)
    // constant x → undefined (every pair x-tied) → NULL
    val const = Seq((1, 5L, 1L), (2, 5L, 2L), (3, 5L, 3L))
      .toDF("k", "x", "y")
    val cr = Stats.kendallTauB(const, "k", "x", "y").collect().head
    assert(cr.isNullAt(cr.fieldIndex("tau_b")))
  }

  test("chiResiduals: zero under independence, 10/√5 on the classic 2×2") {
    import spark.implicits._
    val ind = (for (x <- Seq("a", "b"); y <- 0 to 2; _ <- 1 to 4)
      yield (x, y)).toDF("xx", "yy")
    Stats.chiResiduals(ind, col("xx"), col("yy")).collect().foreach { r =>
      assert(r.getAs[Double]("resid") == 0.0, s"$r")
    }
    // [[30,10],[10,30]]: e = 20 each, resid = ±10/√(20·¼) = ±4.4721
    val assoc = ((1 to 30).map(_ => ("a", 0)) ++ (1 to 10).map(_ => ("a", 1)) ++
      (1 to 10).map(_ => ("b", 0)) ++ (1 to 30).map(_ => ("b", 1)))
      .toDF("xx", "yy")
    val got = Stats.chiResiduals(assoc, col("xx"), col("yy")).collect()
      .map(r => (r.getAs[String]("x"), r.getAs[Int]("y")) ->
        (r.getAs[Double]("e"), r.getAs[Double]("resid"))).toMap
    val rExp = math.rint(10.0 / math.sqrt(5.0) * 1e4) / 1e4
    assert(got(("a", 0)) == ((20.0, rExp)))
    assert(got(("a", 1)) == ((20.0, -rExp)))
  }

  test("minDetectableEffect: closed form at p=0.25, n=400; degenerate NULL") {
    import spark.implicits._
    val df = (1 to 400).map(i => ("g", if (i <= 100) 1 else 0))
      .toDF("k", "conv")
    val r = Eval.minDetectableEffect(df, Seq("k"), "conv").collect().head
    val exp = math.rint(2.801585 *
      math.sqrt((0.25 * 0.75) * (1.0 / 200 + 1.0 / 200)) * 1e6) / 1e6
    assert(r.getAs[Double]("p_pool") == 0.25 &&
      r.getAs[Double]("mde") == exp, s"$r")
    val allConv = (1 to 10).map(_ => ("g", 1)).toDF("k", "conv")
    val d = Eval.minDetectableEffect(allConv, Seq("k"), "conv")
      .collect().head
    assert(d.isNullAt(d.fieldIndex("mde")))
  }

  test("sprtBoundary: deterministic crossing counts for pure streams") {
    import spark.implicits._
    def stream(k: String, convs: Seq[Int]) = convs.zipWithIndex.map {
      case (c, i) => (k, i.toLong, i.toLong, c) }
    // p0=0.2, p1=0.3: +0.405465108 per success, −0.133531393 per
    // failure; +A = 2.944438979 crossed at the 8th success,
    // −A at the 23rd failure
    val df = (stream("allwin", Seq.fill(40)(1)) ++
      stream("alllose", Seq.fill(40)(0)) ++
      stream("short", Seq(1, 0, 1, 0))).toDF("k", "t", "tie", "conv")
    val got = Eval.sprtBoundary(df, Seq("k"), "t", "tie", "conv",
      p0 = 0.2, p1 = 0.3).collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_seen"), r.getAs[String]("decision"))).toMap
    assert(got("allwin") == ((8L, "h1")), s"$got")
    assert(got("alllose") == ((23L, "h0")), s"$got")
    assert(got("short") == ((4L, null)), s"$got")
  }

  test("holtLinear: hand-computed recursion, short-series inits, reference fold") {
    import spark.implicits._
    // 10,12,15,11 @ α=.3 β=.1: init (12,2) → (14.3,2.03) → (14.731,1.8701)
    val df = Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 12.0),
      ("a", 3L, 3L, 15.0), ("a", 4L, 4L, 11.0),
      ("one", 1L, 1L, 5.5), ("two", 1L, 1L, 3.0), ("two", 2L, 2L, 7.0))
      .toDF("k", "t", "tie", "v")
    val got = TimeSeries.holtLinear(df, "k", "t", "tie", "v")
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast"))).toMap
    assert(got("a") == ((14.731, 1.8701, 27.8217)), s"$got")
    assert(got("one") == ((5.5, 0.0, 5.5)))
    assert(got("two") == ((7.0, 4.0, 35.0)))
    // longer series vs an independent BigDecimal reference fold
    val xs = (1 to 25).map(i => ((i * 37) % 11 + 0.25 * i))
    val longDf = xs.zipWithIndex.map { case (x, i) =>
      ("z", i.toLong, i.toLong, x) }.toDF("k", "t", "tie", "v")
    def r9(x: BigDecimal) = x.setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def d4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP)
    val (al, be) = (BigDecimal("0.3"), BigDecimal("0.1"))
    val (lf, bf) = xs.drop(2).foldLeft((d4(xs(1)), d4(xs(1)) - d4(xs(0)))) {
      case ((l, b), x) =>
        val ln = r9(al * d4(x) + (1 - al) * (l + b))
        (ln, r9(be * (ln - l) + (1 - be) * b))
    }
    val zGot = TimeSeries.holtLinear(longDf, "k", "t", "tie", "v")
      .filter(col("k") === "z").collect().head
    assert(zGot.getAs[Double]("level") ==
      lf.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(zGot.getAs[Double]("trend") ==
      bf.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("maseEval: 0 under perfect weekly seasonality, 7 on a linear ramp") {
    import spark.implicits._
    // weekly-periodic series: seasonal-naive error 0, naive error > 0
    val weekly = (0 until 28).map(d =>
      ("g", d, Seq(10.0, 20.0, 15.0, 30.0, 25.0, 5.0, 40.0)(d % 7)))
      .toDF("k", "d", "v")
    val r = TimeSeries.maseEval(weekly, "k", col("d"), "v")
      .collect().head
    assert(r.getAs[Long]("n_days") == 21L &&
      r.getAs[Double]("mae_seasonal") == 0.0 &&
      r.getAs[Double]("mase") == 0.0, s"$r")
    // linear ramp: |Δ1| = 1, |Δ7| = 7 → mase = 7
    val ramp = (0 until 28).map(d => ("g", d, d.toDouble))
      .toDF("k", "d", "v")
    val rr = TimeSeries.maseEval(ramp, "k", col("d"), "v").collect().head
    assert(rr.getAs[Double]("mae_naive") == 1.0 &&
      rr.getAs[Double]("mase") == 7.0, s"$rr")
  }

  test("conformalWidth: order-statistic rank matches ⌈(n+1)(1−α)⌉") {
    import spark.implicits._
    // train: constant 10 → mean 10; cal: residuals exactly 1..10
    val train = (1 to 20).map(_ => ("g", 0, 10.0, 0))
    val cal = (1 to 10).map(i => ("g", 0, 10.0 + i, 1))
    val df = (train ++ cal).toDF("k", "bin", "v", "split")
    val r = Eval.conformalWidth(df, "k", col("bin"), "v", "split",
      alpha = 0.1).collect().head
    // k = ceil(11·0.9) = 10 → width = the largest residual
    assert(r.getAs[Long]("n_cal") == 10L && r.getAs[Long]("k") == 10L &&
      r.getAs[Double]("width") == 10.0, s"$r")
    val r5 = Eval.conformalWidth(df, "k", col("bin"), "v", "split",
      alpha = 0.5).collect().head
    assert(r5.getAs[Long]("k") == 6L && r5.getAs[Double]("width") == 6.0)
    // cal rows in bins unseen at train time are dropped
    val extra = df.union(Seq(("g", 99, 50.0, 1)).toDF("k", "bin", "v",
      "split"))
    assert(Eval.conformalWidth(extra, "k", col("bin"), "v", "split")
      .collect().head.getAs[Long]("n_cal") == 10L)
  }

  test("profileColumns: nulls, distincts, and stringified extremes per column") {
    import spark.implicits._
    val df = Seq((1L, Some("a"), Some(2.5)), (2L, Some("b"), None),
      (3L, None, Some(1.5)), (4L, Some("a"), Some(9.0)))
      .toDF("id", "s", "x")
    val got = Stats.profileColumns(df, Seq("id", "s", "x")).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_value"),
          r.getAs[String]("max_value")))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("x") == ((4L, 1L, 3L, "1.5", "9.0")))
  }

  test("targetEncoding: out-of-fold means match the m-estimate closed form") {
    import spark.implicits._
    // cat A: fold0 = (10, 20), fold1 = (30); cat B: fold0 = (100)
    val df = Seq(("A", 0, 10.0), ("A", 0, 20.0), ("A", 1, 30.0),
      ("B", 0, 100.0)).toDF("cat", "f", "y")
    val prior = (10.0 + 20.0 + 30.0 + 100.0) / 4 // 40
    val got = Eval.targetEncoding(df, "cat", col("f"), "y", m = 20.0)
      .collect().map(r => (r.getAs[String]("cat"), r.getAs[Int]("fold"))
        -> (r.getAs[Long]("n_oof"), r.getAs[Double]("encoded"))).toMap
    def enc(scOof: Double, nOof: Long) =
      math.rint((scOof + 20.0 * prior) / (nOof + 20.0) * 1e6) / 1e6
    assert(got(("A", 0)) == ((1L, enc(30.0, 1))), s"$got")
    assert(got(("A", 1)) == ((2L, enc(30.0, 2))))
    // a category seen only in one fold: n_oof = 0 → pure prior
    assert(got(("B", 0)) == ((0L, enc(0.0, 0))))
    assert(got(("B", 0))._2 == 40.0) // (0 + 20·40)/(0 + 20)
  }

  test("negativeSamplingTable: unigram^0.75 probs and contiguous ranges") {
    import spark.implicits._
    // counts 16 and 1: weights 8 and 1 → probs 8/9, 1/9
    val df = ((1 to 16).map(_ => "hot") ++ Seq("cold")).toDF("item")
    val rows = graft.ops.Sampling.negativeSamplingTable(df, "item")
      .orderBy(col("lo")).collect()
    assert(rows.map(_.getAs[String]("item")).toSeq == Seq("hot", "cold"))
    val hot = rows(0); val cold = rows(1)
    assert(hot.getAs[Double]("prob") ==
      math.rint(8.0 / 9.0 * 1e6) / 1e6)
    assert(hot.getAs[Double]("lo") == 0.0 &&
      cold.getAs[Double]("hi") == 1.0)
    // half-open ranges tile [0, 1): each lo equals the previous hi
    assert(cold.getAs[Double]("lo") == hot.getAs[Double]("hi"))
  }

  test("qiniDeciles: a perfectly-targeted score builds the ideal curve") {
    import spark.implicits._
    // 20 rows, 2 per decile (one per arm); treatment converts only in
    // the top half → uplift 1 in deciles 0-4, 0 after; qini climbs to
    // 5 and plateaus
    val df = (1 to 20).map { i =>
      val arm = i % 2
      ("g", arm, if (arm == 0 && i <= 10) 1 else 0, (21 - i).toDouble,
        i.toLong)
    }.toDF("k", "arm", "conv", "score", "tie")
    val got = Eval.qiniDeciles(df, Seq("k"), "arm", "conv", "score",
      "tie").collect()
      .map(r => r.getAs[Int]("decile") ->
        (r.getAs[Double]("uplift"), r.getAs[Double]("qini"))).toMap
    (0 to 4).foreach(d => assert(got(d) == ((1.0, (d + 1).toDouble)),
      s"decile $d: ${got(d)}"))
    (5 to 9).foreach(d => assert(got(d) == ((0.0, 5.0))))
  }

  test("matryoshkaTopK: prefix ranks, full-dim cosine rescored exactly") {
    import spark.implicits._
    // prefix (first 2 dims) ranking disagrees with full ranking:
    // query q: prefix favors b, full favors c
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // query
      (1L, Array(0.9f, 0.1f, 0.9f, 0.9f)), // b: best prefix, weak full
      (2L, Array(0.6f, 0.3f, 0.05f, 0.05f)) // c: weaker prefix, strong full
    ).toDF("vec_id", "embedding")
    val r = VectorOps.matryoshkaTopK(
        vecs.filter(col("vec_id") === 0), vecs, dims = 2, k = 2)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
    // full-dim rescore matches a direct cosine computation
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) =>
          s + p.toDouble * q.toDouble }
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val full1 = math.rint(cosRef(Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.9f, 0.1f, 0.9f, 0.9f)) * 1e6) / 1e6
    assert(r(0).getAs[Double]("cos_full") == full1)
    // and the full ordering is indeed inverted vs the prefix ordering
    assert(r(0).getAs[Double]("cos_full") < r(1).getAs[Double]("cos_full"))
    assert(r(0).getAs[Double]("cos_trunc") > r(1).getAs[Double]("cos_trunc"))
  }

  test("covarianceMatrix: hand-computed 2-dim fixture, upper triangle only") {
    import spark.implicits._
    val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 6.0f)),
      (2L, Array(5.0f, 10.0f))).toDF("vec_id", "embedding")
    val got = VectorOps.covarianceMatrix(df, "embedding").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        r.getAs[Double]("cov")).toMap
    assert(got == Map((0, 0) -> 4.0, (0, 1) -> 8.0, (1, 1) -> 16.0),
      s"$got")
  }

  test("noveltyCurve: repeats score 0, fresh content scores 1") {
    import spark.implicits._
    // 10 docs → 10 buckets of one doc; doc1 repeats doc0, doc2 is new
    val texts = Seq("alpha beta gamma delta", "alpha beta gamma delta",
      "epsilon zeta eta theta") ++
      (3 until 10).map(i => s"w$i x$i y$i z$i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.ops.TextOps.noveltyCurve(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_new"), r.getAs[Double]("novelty"))).toMap
    assert(got(0)._2 == 1.0) // first bucket is all-new by definition
    assert(got(1) == ((0L, 0.0)), s"repeat bucket: ${got(1)}")
    assert(got(2)._2 == 1.0, s"fresh bucket: ${got(2)}")
    assert(got.size == 10)
  }

  // ---- algebraic invariances: properties a value-level oracle compare
  // cannot see, pinned per family ----

  test("invariance: Mann-Whitney z is exactly invariant under monotone transforms") {
    import spark.implicits._
    val df = (1 to 60).map(i =>
      ("g", i % 2, (i * 37 % 23).toDouble)).toDF("k", "arm", "v")
    val base = Eval.mannWhitneyU(df, Seq("k"), "arm", "v")
      .collect().head
    // exp is strictly monotone → identical ranks → identical U/z/p
    val mono = Eval.mannWhitneyU(
      df.withColumn("v", exp(col("v") / 10)), Seq("k"), "arm", "v")
      .collect().head
    assert(base.getAs[Double]("u") == mono.getAs[Double]("u"))
    assert(base.getAs[Double]("z") == mono.getAs[Double]("z"))
    assert(base.getAs[Double]("p_two") == mono.getAs[Double]("p_two"))
  }

  test("invariance: BH adjusted p is monotone in raw p and bounded by 1") {
    import spark.implicits._
    val ps = Seq(0.001, 0.02, 0.02, 0.3, 0.7, 0.97, 0.99)
    val df = ps.zipWithIndex.map { case (p, i) => (s"s$i", p) }
      .toDF("k", "p")
    val rows = Stats.bhFdr(df, "p", Seq("k")).collect()
      .sortBy(_.getAs[Int]("rank"))
    val adj = rows.map(_.getAs[Double]("p_adj"))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b },
      s"not monotone: ${adj.toSeq}")
    assert(adj.forall(p => p > 0 && p <= 1.0))
    // the largest raw p is its own adjustment
    assert(adj.last == 0.99)
  }

  test("invariance: JSD is symmetric in the arms and bounded by ln 2") {
    import spark.implicits._
    val df = (1 to 200).map(i =>
      ("g", i % 2, s"k${i % 7 + (i % 2) * 3}")).toDF("grp", "arm", "key")
    val a = Stats.jsDivergence(df, Seq("grp"), "arm", "key")
      .collect().head.getAs[Double]("jsd")
    val b = Stats.jsDivergence(
      df.withColumn("arm", lit(1) - col("arm")), Seq("grp"), "arm",
      "key").collect().head.getAs[Double]("jsd")
    assert(a == b, s"asymmetric: $a vs $b")
    assert(a >= 0 && a <= 0.693148)
  }

  test("invariance: Kendall tau-b is invariant under monotone transforms of either axis") {
    import spark.implicits._
    val df = (1 to 40).map(i =>
      (i, ((i * 13) % 17).toLong, ((i * 7) % 11).toLong))
      .toDF("k", "x", "y")
    val base = Stats.kendallTauB(df, "k", "x", "y").collect().head
      .getAs[Double]("tau_b")
    val tx = Stats.kendallTauB(
      df.withColumn("x", col("x") * col("x") * 3 + 1), "k", "x", "y")
      .collect().head.getAs[Double]("tau_b")
    assert(base == tx)
  }

  test("invariance: CMH single stratum equals itself under arm+outcome double flip") {
    import spark.implicits._
    // flipping BOTH arm labels and outcome labels preserves the 2x2
    // association structure: chi2 identical
    val df = (1 to 80).map(i =>
      ("h", i % 2, if ((i * 31) % 5 < 2 != (i % 2 == 1)) 1 else 0))
      .toDF("s", "arm", "conv")
    val a = Eval.cmhTest(df, Seq("s"), "arm", "conv").collect().head
      .getAs[Double]("chi2")
    val flipped = df.select(col("s"), (lit(1) - col("arm")).as("arm"),
      (lit(1) - col("conv")).as("conv"))
    val b = Eval.cmhTest(flipped, Seq("s"), "arm", "conv")
      .collect().head.getAs[Double]("chi2")
    assert(a == b, s"$a vs $b")
  }

  test("invariance: qini decile counts partition the stratum; final qini matches totals") {
    import spark.implicits._
    val df = (1 to 97).map(i =>
      ("g", i % 2, if ((i * 13) % 7 < 3) 1 else 0, (i * 29 % 41).toDouble,
        i.toLong)).toDF("k", "arm", "conv", "score", "tie")
    val rows = Eval.qiniDeciles(df, Seq("k"), "arm", "conv", "score",
      "tie").collect()
    assert(rows.map(r => r.getAs[Long]("n0") + r.getAs[Long]("n1")).sum
      == 97L)
    // last decile's qini = S0_total − S1_total·N0/N1 computed directly
    val (s0, n0t) = (df.filter("arm = 0 and conv = 1").count(),
      df.filter("arm = 0").count())
    val (s1, n1t) = (df.filter("arm = 1 and conv = 1").count(),
      df.filter("arm = 1").count())
    val expect = math.rint((s0 -
      s1.toDouble * (n0t.toDouble / n1t)) * 1e6) / 1e6
    val last = rows.maxBy(_.getAs[Int]("decile")).getAs[Double]("qini")
    assert(last == expect, s"$last vs $expect")
  }

  test("invariance: profile counts obey n = n_null + non-null, distinct <= non-null") {
    import spark.implicits._
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("a")),
      (4L, Option("b")), (5L, None)).toDF("id", "s")
    Stats.profileColumns(df, Seq("id", "s")).collect().foreach { r =>
      val nonNull = r.getAs[Long]("n") - r.getAs[Long]("n_null")
      assert(r.getAs[Long]("n_distinct") <= nonNull)
    }
  }

  test("invariance: Holt forecast is affine-equivariant (shift and scale)") {
    import spark.implicits._
    val df = (1 to 15).map(i =>
      ("s", i.toLong, i.toLong, ((i * 11) % 13).toDouble))
      .toDF("k", "t", "tie", "v")
    val base = TimeSeries.holtLinear(df, "k", "t", "tie", "v")
      .collect().head
    // x → 2x + 5: level' = 2·level + 5, trend' = 2·trend (exact: the
    // decimal recursion is linear and 2x+5 stays on the 1e-4 grid)
    val aff = TimeSeries.holtLinear(
      df.withColumn("v", col("v") * 2 + 5), "k", "t", "tie", "v")
      .collect().head
    assert(aff.getAs[Double]("level") ==
      2 * base.getAs[Double]("level") + 5)
    assert(aff.getAs[Double]("trend") == 2 * base.getAs[Double]("trend"))
  }

  test("pcaComponents: recovers planted axes; projections carry the eigenvalues") {
    import spark.implicits._
    // plant a 2-factor covariance in 6 dims: u with sd 3, v with sd 1,
    // iid noise 0.01 — spectrum is unambiguous
    val d = 6
    val u = Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0).map(_ / math.sqrt(6.0))
    val v = Array(1.0, -1.0, 1.0, -1.0, 1.0, -1.0).map(_ / math.sqrt(6.0))
    // splitmix64 finalizer: decorrelated deterministic uniforms in
    // (−0.5, 0.5) — a raw LCG step of sequential seeds is affine in i
    // and visibly tilts the sample axes
    def mix(s0: Long): Double = {
      var z = s0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      ((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val rows = (0 until 400).map { i =>
      val a = 3.0 * mix(i)
      val b = 1.0 * mix(i + 1000000)
      val x = Array.tabulate(d) { j =>
        (a * u(j) + b * v(j) + 0.01 * mix(i * d + j + 2000000)).toFloat
      }
      (i.toLong, x)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (mean, eig, comps) = VectorOps.pcaComponents(df, "embedding", k = 2)
    assert(mean.length == d && comps.forall(_.length == d))
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    // orthonormal, ordered spectrum
    assert(math.abs(dot(comps(0), comps(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(comps(1), comps(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(comps(0), comps(1))) < 1e-7)
    assert(eig(0) > eig(1) && eig(1) > 0)
    // recovered axes align with the planted ones (sign-free)
    assert(math.abs(dot(comps(0), u)) > 0.995, s"pc1 vs u: ${dot(comps(0), u)}")
    assert(math.abs(dot(comps(1), v)) > 0.995, s"pc2 vs v: ${dot(comps(1), v)}")
    // sample variance of each projection ≈ its eigenvalue
    val proj = VectorOps.pcaProject(df, Seq("vec_id"), "embedding",
      mean, comps)
    val stats = proj.agg(
      variance(col("pc1")).as("v1"), variance(col("pc2")).as("v2"),
      avg(col("pc1")).as("m1")).collect().head
    assert(math.abs(stats.getAs[Double]("v1") - eig(0)) < 1e-6 * eig(0) + 1e-9)
    assert(math.abs(stats.getAs[Double]("v2") - eig(1)) < 1e-6 * eig(1) + 1e-9)
    // centered: projections average to ~0
    assert(math.abs(stats.getAs[Double]("m1")) < 1e-9)
  }
}
