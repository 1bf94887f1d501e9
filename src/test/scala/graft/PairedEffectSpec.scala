package graft

import org.apache.spark.sql.functions._

import graft.ops.Eval

/** Paired-test / effect-size family (q237–q239): Wilcoxon signed-rank,
  * Cohen's d / Hedges' g, Mantel–Haenszel pooled odds ratio. The value
  * gate is the DuckDB oracle; these specs pin closed-form textbook
  * fixtures and the partitioning-invariance contract the oracle compare
  * can't see. */
class PairedEffectSpec extends SparkSpecBase {
  import spark.implicits._

  test("wilcoxonSignedRank: textbook fixture — ranks, W+, zero-diff drop") {
    // diffs (after-before): 2, -1, 3, 0, -2, 5  → zero dropped, n=5
    // |d| ranked: 1→1, 2→2.5, 2→2.5, 3→4, 5→5 ; positives: 2(2.5)+3(4)+5(5)
    // W+ = 11.5 ; mu = 5*6/4 = 7.5 ; var = 5*6*11/24 - (2^3-2)/48 = 13.625
    val df = Seq((10.0, 12.0), (10.0, 9.0), (1.0, 4.0), (7.0, 7.0),
      (9.0, 7.0), (0.0, 5.0)).toDF("before", "after")
      .withColumn("k", lit("g"))
    val r = Eval.wilcoxonSignedRank(df, Seq("k"), "before", "after")
      .collect().head
    assert(r.getAs[Long]("n") == 5L, "zero difference must be dropped")
    assert(r.getAs[Double]("w_plus") == 11.5)
    val z = (11.5 - 7.5) / math.sqrt(13.625)
    assert(math.abs(r.getAs[Double]("z") - z) < 5e-5, s"z=${r.get(2)}")
    // p is symmetric: flipping before/after flips z, keeps p
    val flip = Eval.wilcoxonSignedRank(df, Seq("k"), "after", "before")
      .collect().head
    assert(math.abs(flip.getAs[Double]("z") + r.getAs[Double]("z")) < 1e-9)
    assert(flip.getAs[Double]("p_two") == r.getAs[Double]("p_two"))
  }

  test("wilcoxonSignedRank: all-tied diffs still integral, var tie term") {
    // every |d| identical → one tie group of n; DOUBLED midranks stay
    // integral so W+ is exact
    val df = (1 to 8).map(i => ("g", i * 1.0, i * 1.0 + 2.0))
      .toDF("k", "b", "a")
    val r = Eval.wilcoxonSignedRank(df, Seq("k"), "b", "a").collect().head
    // all 8 diffs = +2, midrank = 4.5 each → W+ = 36 = n(n+1)/2
    assert(r.getAs[Double]("w_plus") == 36.0)
    // var = 8*9*17/24 - (8^3-8)/48 = 51 - 10.5 = 40.5
    val z = (36.0 - 18.0) / math.sqrt(40.5)
    assert(math.abs(r.getAs[Double]("z") - z) < 5e-5)
  }

  test("cohensD: planted two-arm fixture matches the closed form") {
    // arm0: 1,2,3 (m=2, ss=2) ; arm1: 5,7,9 (m=7, ss=8)
    // sp = sqrt((2+8)/4) = sqrt(2.5) ; d = (2-7)/sp
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 5.0), (1, 7.0),
      (1, 9.0)).toDF("arm", "v").withColumn("k", lit("g"))
    val r = Eval.cohensD(df, Seq("k"), "arm", "v").collect().head
    val d = -5.0 / math.sqrt(2.5)
    assert(math.abs(r.getAs[Double]("cohen_d") - d) < 5e-5)
    val g = d * (1.0 - 3.0 / (4.0 * 6 - 9.0))
    assert(math.abs(r.getAs[Double]("hedges_g") - g) < 5e-5)
    // degenerate arm (n<=1) → NULL effect, not NaN/∞
    val deg = Seq((0, 1.0), (1, 5.0), (1, 9.0)).toDF("arm", "v")
      .withColumn("k", lit("d"))
    val rd = Eval.cohensD(deg, Seq("k"), "arm", "v").collect().head
    assert(rd.isNullAt(rd.fieldIndex("cohen_d")))
  }

  test("mhOddsRatio: two-stratum fixture matches hand computation") {
    // stratum A: arm0 10 rows/4 succ, arm1 10 rows/2 succ
    //   num = a*d/n = 4*8/20 = 1.6 ; den = b*c/n = 6*2/20 = 0.6
    // stratum B: arm0 5 rows/1 succ, arm1 15 rows/9 succ
    //   num = 1*6/20 = 0.3 ; den = 4*9/20 = 1.8
    // OR_MH = (1.6+0.3)/(0.6+1.8) = 1.9/2.4
    def rows(s: String, arm: Int, n: Int, succ: Int) =
      (0 until n).map(i => (s, arm, if (i < succ) 1 else 0))
    val df = (rows("A", 0, 10, 4) ++ rows("A", 1, 10, 2) ++
      rows("B", 0, 5, 1) ++ rows("B", 1, 15, 9))
      .toDF("s", "arm", "conv")
    val r = Eval.mhOddsRatio(df, Seq("s"), "arm", "conv").collect().head
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Double]("num") == 1.9)
    assert(r.getAs[Double]("den") == 2.4)
    assert(r.getAs[Double]("or_mh") == math.rint(1.9 / 2.4 * 1e4) / 1e4)
  }

  test("mcNemar: discordant-cell fixture, continuity correction, b=c edge") {
    // 10 pairs: b = #(0→1) = 3, c = #(1→0) = 1 → χ² = (|3−1|−1)²/4 = 0.25
    val rows = Seq((0, 1), (0, 1), (0, 1), (1, 0), (1, 1), (1, 1),
      (0, 0), (0, 0), (1, 1), (0, 0))
    val df = rows.toDF("bf", "af").withColumn("k", lit("g"))
    val r = Eval.mcNemar(df, Seq("k"), "bf", "af").collect().head
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("c") == 1L)
    assert(r.getAs[Double]("chi2") == 0.25)
    // b = c → clamp keeps χ² at 0 (not (−1)² = 1)
    val bal = Seq((0, 1), (1, 0), (0, 0)).toDF("bf", "af")
      .withColumn("k", lit("e"))
    val rb = Eval.mcNemar(bal, Seq("k"), "bf", "af").collect().head
    assert(rb.getAs[Double]("chi2") == 0.0)
    // no discordance at all → NULL statistic, not NaN
    val con = Seq((1, 1), (0, 0)).toDF("bf", "af").withColumn("k", lit("c"))
    val rc = Eval.mcNemar(con, Seq("k"), "bf", "af").collect().head
    assert(rc.isNullAt(rc.fieldIndex("chi2")))
  }

  test("cliffsDelta: separated arms hit ±1, ties give 0, labels correct") {
    // arm0 all above arm1 → every pair won by arm0 → δ = +1
    val sep = Seq((0, 10.0), (0, 11.0), (1, 1.0), (1, 2.0))
      .toDF("arm", "v").withColumn("k", lit("s"))
    val rs = Eval.cliffsDelta(sep, Seq("k"), "arm", "v").collect().head
    assert(rs.getAs[Double]("delta") == 1.0)
    assert(rs.getAs[String]("magnitude") == "large")
    // identical distributions → δ = 0, negligible
    val tie = Seq((0, 5.0), (0, 7.0), (1, 5.0), (1, 7.0))
      .toDF("arm", "v").withColumn("k", lit("t"))
    val rt = Eval.cliffsDelta(tie, Seq("k"), "arm", "v").collect().head
    assert(rt.getAs[Double]("delta") == 0.0)
    assert(rt.getAs[String]("magnitude") == "negligible")
  }

  test("paired/effect family is partitioning-invariant") {
    val base = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("k"),
        (col("event_id") % 2).cast("int").as("arm"),
        col("value").cast("double").as("v"),
        (col("event_id") % 3 === 0).cast("int").as("conv"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val shuf = base.repartition(7, col("v"))
    assert(canon(Eval.cohensD(base, Seq("k"), "arm", "v")) ==
      canon(Eval.cohensD(shuf, Seq("k"), "arm", "v")))
    assert(canon(Eval.mhOddsRatio(base, Seq("k"), "arm", "conv")) ==
      canon(Eval.mhOddsRatio(shuf, Seq("k"), "arm", "conv")))
    val paired = base.groupBy("k", "arm")
      .agg(avg("v").as("b"), max("v").as("a"))
    assert(canon(Eval.wilcoxonSignedRank(paired, Seq("k"), "b", "a")) ==
      canon(Eval.wilcoxonSignedRank(
        paired.repartition(5, col("a")), Seq("k"), "b", "a")))
  }
}
