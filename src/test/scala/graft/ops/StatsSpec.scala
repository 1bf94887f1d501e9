package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class StatsSpec extends SparkSpecBase {

  test("histogram: exact counts, clamped edges, empty bins omitted") {
    import spark.implicits._
    // values: below-range, on lo, interior, on an inner boundary, just
    // below hi, on hi (clamps to last bin), far above
    val df = Seq(-5.0, 0.0, 2.5, 5.0, 9.99, 10.0, 99.0).toDF("v")
    val got = Stats.histogram(df, col("v"), lo = 0.0, hi = 10.0, nbins = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // width 2.5: bin0 [-inf clamp..2.5) ← {-5, 0}; 2.5 → bin1; 5.0 → bin2;
    // 9.99, 10.0(clamp), 99(clamp) → bin3; bin for (7.5,9.99): 9.99→bin3
    assert(got(0L)._1 == 2L)
    assert(got(1L)._1 == 1L)
    assert(got(2L)._1 == 1L)
    assert(got(3L)._1 == 3L)
    assert(got.keySet == Set(0L, 1L, 2L, 3L)) // no phantom bins
    assert(got(1L)._2 == 2.5 && got(1L)._3 == 5.0)
    // total preserved
    assert(got.values.map(_._1).sum == 7L)
  }

  test("histogram excludes NaN and infinities instead of polluting bin 0") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 2.0).toDF("v")
    val got = Stats.histogram(df, col("v"), 0.0, 4.0, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L)) // only the two finite values
  }

  test("histogram skips nulls and covers every in-range value once") {
    import spark.implicits._
    val df = (Seq.tabulate(1000)(i => Some(i.toDouble)) :+
      Option.empty[Double]).toDF("v")
    val got = Stats.histogram(df, col("v"), 0.0, 1000.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0 until 10).map(b => b.toLong -> 100L).toMap)
  }

  test("histogram rejects degenerate specs") {
    import spark.implicits._
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Stats.histogram(df, col("v"), 5.0, 5.0, 10)
    }
    intercept[IllegalArgumentException] {
      Stats.histogram(df, col("v"), 0.0, 1.0, 0)
    }
  }

  test("robustGroupStats: trimmed mean and median resist the outlier") {
    import spark.implicits._
    // group a: values 0..8 plus a 1000 outlier (n=10, trimDenom=5 → cut
    // 2 ranks per tail): mean 103.6, trimmed = mean(2..7) = 4.5,
    // median = (4+5)/2 = 4.5. group b: n=3, k=0 → trimmed = mean = 2,
    // median = middle rank = 2.
    val df = ((0 to 8).map(v => ("a", v.toLong, v.toLong)) ++
      Seq(("a", 1000L, 9L), ("b", 1L, 10L), ("b", 2L, 11L),
        ("b", 3L, 12L)))
      .toDF("source", "n_chars", "doc_id")
    val got = Stats.robustGroupStats(df, "source", "n_chars", "doc_id",
        trimDenom = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("a") == ((10L, 103.6, 4.5, 4.5)), got("a").toString)
    assert(got("b") == ((3L, 2.0, 2.0, 2.0)), got("b").toString)
  }

  test("robustGroupStats is partitioning-invariant (rank tie column)") {
    import spark.implicits._
    // duplicate values across many partitions: the tie column pins rank
    // order, so results match the single-partition run exactly
    val rows = (0 until 200).map(i => ("s" + i % 3, (i % 7).toLong,
      i.toLong))
    val a = Stats.robustGroupStats(
        rows.toDF("source", "n_chars", "doc_id").repartition(13),
        "source", "n_chars", "doc_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val b = Stats.robustGroupStats(
        rows.toDF("source", "n_chars", "doc_id").coalesce(1),
        "source", "n_chars", "doc_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(a == b)
  }

  test("distributionDrift: identical versions show zero drift; a shift " +
      "concentrates TV mass") {
    import spark.implicits._
    val base = (1 to 100).map(_.toLong).toDF("v")
    val same = Stats.distributionDrift(base, base, "v", 4).collect()
    assert(same.length == 4)
    assert(same.forall(_.getDouble(5) == 0.0), same.mkString(","))
    assert(same.forall(r => r.getLong(1) == r.getLong(2)))
    // new version shifted up by 100: every row lands in the old
    // version's top bucket -> TV distance sums to (1 - 1/4)
    val shifted = (101 to 200).map(_.toLong).toDF("v")
    val drift = Stats.distributionDrift(base, shifted, "v", 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(math.abs(drift.values.sum - 0.75) < 1e-9, drift.toString)
    assert(drift(3L) > 0.3) // the receiving bucket carries the mass
  }

  test("skyline2d equals the O(n²) dominance definition on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(i =>
      (i.toLong, s"g${i % 3}", (rnd.nextInt(40) / 4.0), rnd.nextInt(30)))
    val df = rows.toDF("id", "grp", "cost", "value")
    val got = Stats.skyline2d(df, "grp", "cost", "value")
      .select("id").as[Long].collect().toSet
    val expected = rows.filter { case (_, g, c, v) =>
      !rows.exists { case (_, g2, c2, v2) =>
        g2 == g && c2 <= c && v2 >= v && (c2 < c || v2 > v) }
    }.map(_._1).toSet
    assert(got == expected)
  }

  test("skyline2d keeps exact-duplicate frontier points (no strict " +
      "dominator exists for either copy)") {
    import spark.implicits._
    val df = Seq((1L, "g", 1.0, 10), (2L, "g", 1.0, 10), (3L, "g", 2.0, 10),
      (4L, "g", 0.5, 5)).toDF("id", "grp", "cost", "value")
    val got = Stats.skyline2d(df, "grp", "cost", "value")
      .select("id").as[Long].collect().toSet
    // 3 is dominated (same value, higher cost); 4 survives (cheapest);
    // both duplicates at (1.0, 10) survive
    assert(got == Set(1L, 2L, 4L))
  }

  test("equiDepthHistogram follows the NTILE split law exactly") {
    import spark.implicits._
    // n = 19, k = 8: base 2, rem 3 → buckets 1-3 hold 3 rows, 4-8 hold 2
    val df = (1 to 19).map(i => (i * 1.5, i.toLong, i)).toDF("v", "o", "l")
    val got = Stats.equiDepthHistogram(df, "v", Seq("o", "l"), 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == (1L to 8L).toSet)
    assert((1L to 3L).forall(got(_)._1 == 3L))
    assert((4L to 8L).forall(got(_)._1 == 2L))
    assert(got.values.map(_._1).sum == 19L)
    // bounds tile the sorted domain without overlap
    val ordered = (1L to 8L).map(got)
    assert(ordered.head._2 == 1.5 && ordered.last._3 == 19 * 1.5)
    ordered.sliding(2).foreach { case Seq(a, b) => assert(a._3 < b._2) }
  }

  test("equiDepthHistogram is partition-invariant and handles n < k") {
    import spark.implicits._
    val df = (1 to 100).map(i => ((i * 37 % 100).toDouble, i.toLong, i))
      .toDF("v", "o", "l")
    val a = Stats.equiDepthHistogram(df, "v", Seq("o", "l"), 7)
      .collect().map(_.toSeq).toSet
    val b = Stats.equiDepthHistogram(df.repartition(13), "v",
      Seq("o", "l"), 7).collect().map(_.toSeq).toSet
    assert(a == b)
    val tiny = Seq((1.0, 1L, 1), (2.0, 2L, 2)).toDF("v", "o", "l")
    val t = Stats.equiDepthHistogram(tiny, "v", Seq("o", "l"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 1L, 2L -> 1L)) // n < k: one row per bucket
  }

  test("cusumPeak: planted level shift peaks at the shift point") {
    val s = spark
    import s.implicits._
    // group "a": 5 steps at 2 rows, then 5 steps at 6 rows — the CUSUM
    // trough sits at the last low step (step 5)
    val rows = (1 to 5).flatMap(st => Seq.fill(2)(("a", st))) ++
      (6 to 10).flatMap(st => Seq.fill(6)(("a", st)))
    val r = Stats.cusumPeak(rows.toDF("g", "step"), "g", "step")
      .collect().head
    assert(r.getAs[Int]("peak_step") === 5)
    // S_5 = Σc·K − tot·5 = 10·10 − 40·5 = −100; norm = 100/(10·40)
    assert(r.getAs[Long]("cusum_scaled") === -100L)
    assert(r.getAs[Double]("peak_norm") === 0.25)
  }

  test("cusumPeak: a flat series stays near zero") {
    val s = spark
    import s.implicits._
    val rows = (1 to 8).flatMap(st => Seq.fill(3)(("a", st)))
    val r = Stats.cusumPeak(rows.toDF("g", "step"), "g", "step")
      .collect().head
    assert(r.getAs[Long]("cusum_scaled") === 0L)
  }

  test("benfordAudit: decade ladder extracts first significant digits") {
    val s = spark
    import s.implicits._
    val df = Seq(0.002, 0.91, 1.0, 2.5, 19.0, 95.5, 300.0, 9999.0,
      -5.0, 0.0).toDF("v") // negatives and zero excluded
    val got = Stats.benfordAudit(df, "v")
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n")).toMap
    assert(got === Map(1 -> 2L, 2 -> 2L, 3 -> 1L, 9 -> 3L))
    val p = Stats.benfordAudit(df, "v")
      .filter(col("digit") === 1).collect().head.getAs[Double]("benford_p")
    assert(p === 0.30103)
  }

  test("giniIndex: uniform groups score 0, full concentration nears 1") {
    val s = spark
    import s.implicits._
    val uniform = (1 to 40).map(i => ("g" + i % 4, i)).toDF("g", "x")
    val g0 = Stats.giniIndex(uniform, "g").collect().head
    assert(g0.getAs[Double]("gini") === 0.0)
    // 4 groups: sizes 1,1,1,97 → G = 2(1+2+3+4·97)/(4·100) − 5/4 = 0.72
    val skew = (Seq.fill(97)("big") ++ Seq("a", "b", "c"))
      .zipWithIndex.map { case (g, i) => (g, i) }.toDF("g", "x")
    val g1 = Stats.giniIndex(skew, "g").collect().head
    assert(g1.getAs[Double]("gini") === 0.72)
  }

  test("mannKendall: monotone series maxes S, alternating stays near 0") {
    val s = spark
    import s.implicits._
    // rising: counts 1,2,3,4 per step → S = C(4,2) = 6
    val rising = (1 to 4).flatMap(st => Seq.fill(st)(("up", st)))
    // alternating 2,1,2,1 → S = -1 (pairs: −1 +0 −1 +1 −1 +0... compute)
    val alt = Seq(2, 1, 2, 1).zipWithIndex
      .flatMap { case (c, i) => Seq.fill(c)(("alt", i)) }
    val got = Stats.mannKendall((rising ++ alt).toDF("g", "step"),
        "g", "step")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_steps"), r.getAs[Long]("s"),
          r.getAs[String]("direction"))).toMap
    assert(got("up") === ((4L, 6L, "rising")))
    // alt pairs (2,1)(2,2)(2,1)(1,2)(1,1)(2,1): signs -1,0,-1,+1,0,-1
    assert(got("alt") === ((4L, -2L, "falling")))
  }

  test("wasserstein1: hand-computed shift and identity") {
    val s = spark
    import s.implicits._
    // A at {0, 10}, B at {5, 15}: shifted by 5 → W1 = 5
    val df = Seq(("a", 0L), ("a", 10L), ("b", 5L), ("b", 15L))
      .toDF("g", "v")
    val r = Stats.wasserstein1(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("emd") === 5.0)
    // identical distributions → 0
    val same = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    assert(Stats.wasserstein1(same, "g", "v", "a", "b")
      .collect().head.getAs[Double]("emd") === 0.0)
  }

  test("pairwiseCorrelation: perfect co-movement = 1, opposition = -1") {
    val s = spark
    import s.implicits._
    // buckets 1..3: a counts 1,2,3; b counts 2,4,6 (corr 1)
    // c counts 3,2,1 (corr −1 with a); missing (d, bucket 3) fills 0
    def rep(sr: String, bk: Int, n: Int) = Seq.fill(n)((bk, sr))
    val df = (rep("a", 1, 1) ++ rep("a", 2, 2) ++ rep("a", 3, 3) ++
      rep("b", 1, 2) ++ rep("b", 2, 4) ++ rep("b", 3, 6) ++
      rep("c", 1, 3) ++ rep("c", 2, 2) ++ rep("c", 3, 1))
      .toDF("bk", "sr")
    val got = Stats.pairwiseCorrelation(df, "bk", "sr")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("corr")).toMap
    assert(got(("a", "b")) === 1.0)
    assert(got(("a", "c")) === -1.0)
    assert(got(("b", "c")) === -1.0)
  }

  test("pairwiseCorrelation: a constant series yields NULL, not NaN") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "a"), (2, "a"), (1, "k"), (2, "k")).toDF("bk", "sr")
    val r = Stats.pairwiseCorrelation(df, "bk", "sr").collect().head
    assert(r.isNullAt(r.fieldIndex("corr")))
  }

  test("lag1Autocorr: alternating series is negatively autocorrelated") {
    val s = spark
    import s.implicits._
    // a: 3,1,3,1,3 → strong negative lag-1; m: 1,2,3,4,5 → positive
    val alt = Seq(3, 1, 3, 1, 3).zipWithIndex
      .flatMap { case (n, i) => Seq.fill(n)((i, "alt")) }
    val mono = (1 to 5).flatMap(i => Seq.fill(i)((i - 1, "mono")))
    val got = Stats.lag1Autocorr((alt ++ mono).toDF("bk", "sr"),
        "bk", "sr")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("autocorr"))
      .toMap
    assert(got("alt") < -0.9, got.toString)
    assert(got("mono") > 0.9, got.toString)
  }

  test("quantileNormalize: skewed source maps onto pooled deciles") {
    val s = spark
    import s.implicits._
    // source A holds the 10 smallest values, B the 10 largest: A's
    // top bucket must normalize to the POOLED distribution's top value,
    // erasing the source offset
    val rows = (1 to 10).map(v => ("A", v.toLong, v.toLong)) ++
      (11 to 20).map(v => ("B", v.toLong, v.toLong))
    val df = rows.toDF("src", "id", "v")
    val out = Stats.quantileNormalize(df, "src", "v", Seq("id"), 10)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("v")) ->
        (r.getAs[Int]("bucket"), r.getAs[Long]("norm_value"))).toMap
    // A's value 10 (its own decile 10) → pooled decile 10 = 20
    assert(out(("A", 10L)) === ((10, 20L)))
    assert(out(("B", 20L)) === ((10, 20L)))
    // A's decile 1 and B's decile 1 both map to the pooled 10% point
    assert(out(("A", 1L))._2 === out(("B", 11L))._2)
    // pooled type-1 decile b: smallest v with cum ≥ ceil(b·N/10) = 2b
    assert(out(("A", 1L))._2 === 2L)
  }

  test("quantileNormalize: norm values always exist in the data") {
    val s = spark
    import s.implicits._
    val rows = (1 to 37).map(i => ("s" + i % 3, i.toLong, (i * 7 % 13).toLong))
    val df = rows.toDF("src", "id", "v")
    val vals = df.select("v").collect().map(_.getLong(0)).toSet
    val out = Stats.quantileNormalize(df, "src", "v", Seq("id"), 10)
      .select("norm_value").collect().map(_.getLong(0))
    assert(out.forall(vals.contains))
  }
}
