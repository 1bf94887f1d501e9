package graft

import org.apache.spark.sql.functions._

import graft.ops.{Eval, TimeSeries}

/** Cross-operator algebraic invariants for the round-9 families —
  * relationships BETWEEN operators that no single oracle row checks:
  * effect-size signs must agree with their significance twins, pooled
  * estimators must collapse to their unpooled forms on one stratum,
  * and location/scale transforms must move exactly the quantities
  * they should. */
class CrossFamilyInvariantsSpec extends SparkSpecBase {
  import spark.implicits._

  private val events = spark.read.parquet(s"$sf/events.parquet")
    .filter(col("value").isNotNull)
    .select(col("event_type").as("k"),
      (col("event_id") % 2).cast("int").as("arm"),
      col("value").cast("double").as("v"))

  test("cliffsDelta sign agrees with mannWhitneyU's direction per stratum") {
    val mwu = Eval.mannWhitneyU(events, Seq("k"), "arm", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("z")).toMap
    val cd = Eval.cliffsDelta(events, Seq("k"), "arm", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("delta")).toMap
    assert(mwu.keySet == cd.keySet)
    // z > 0 ⇔ arm0 ranks higher ⇔ δ > 0 (both from the same U₀)
    mwu.foreach { case (k, z) =>
      assert(math.signum(z) == math.signum(cd(k)) ||
        (z == 0.0 && cd(k) == 0.0), s"$k: z=$z δ=${cd(k)}")
    }
  }

  test("mhOddsRatio over one stratum equals the plain 2×2 odds ratio") {
    val df = Seq.fill(40)(("s", 0, 1)) ++ Seq.fill(60)(("s", 0, 0)) ++
      Seq.fill(30)(("s", 1, 1)) ++ Seq.fill(70)(("s", 1, 0))
    val r = Eval.mhOddsRatio(df.toDF("s", "arm", "conv"),
      Seq("s"), "arm", "conv").collect().head
    // OR = (40·70)/(60·30)
    val or = 40.0 * 70 / (60 * 30)
    assert(math.abs(r.getAs[Double]("or_mh") - or) < 5e-4)
  }

  test("didEstimate is invariant to adding a constant to the outcome") {
    val df = events.withColumn("period",
      (col("v") > 50).cast("int")).limit(2000)
    def run(d: org.apache.spark.sql.DataFrame) =
      Eval.didEstimate(d, Seq("k"), "arm", "period", "v2").collect()
        .map(r => r.getString(0) -> r.getAs[Double]("did")).toMap
    val base = run(df.withColumn("v2", col("v")))
    val shifted = run(df.withColumn("v2", col("v") + 1000.0))
    base.foreach { case (k, d) =>
      assert(math.abs(shifted(k) - d) < 1e-3, s"$k: $d vs ${shifted(k)}")
    }
  }

  test("cupedAdjust: scaling the covariate rescales θ, not the estimate") {
    val units = events.groupBy("k", "arm")
      .agg(avg("v").as("x"), max("v").as("y"))
      .unionByName(events.limit(500).groupBy("k", "arm")
        .agg(min("v").as("x"), avg("v").as("y")))
    def run(d: org.apache.spark.sql.DataFrame) =
      Eval.cupedAdjust(d, Seq("k"), "arm", "x", "y").collect()
        .map(r => r.getString(0) ->
          (r.getAs[Double]("theta"), r.getAs[Double]("diff_cuped"))).toMap
    val base = run(units)
    val scaled = run(units.withColumn("x", col("x") * 4.0))
    base.foreach { case (k, (th, dc)) =>
      if (th != 0.0 && scaled(k)._1 != 0.0) {
        assert(math.abs(scaled(k)._1 - th / 4.0) < 1e-3,
          s"$k: θ $th vs ${scaled(k)._1}")
        assert(math.abs(scaled(k)._2 - dc) < 1e-3,
          s"$k: adj diff $dc vs ${scaled(k)._2}")
      }
    }
  }

  test("nelsonAalen: censored-at-frontier rows never add hazard") {
    val base = Seq((1, 1), (2, 1), (3, 1)).toDF("dur", "ev")
    val withCensored = base.unionByName(
      Seq((5, 0), (5, 0)).toDF("dur", "ev"))
    val h0 = TimeSeries.nelsonAalen(base, "dur", "ev").collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("cum_hazard")).toMap
    val h1 = TimeSeries.nelsonAalen(withCensored, "dur", "ev").collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("cum_hazard")).toMap
    // same event times; every increment shrinks (bigger risk sets) and
    // the censored tail emits no event row at all
    assert(h1.keySet == h0.keySet)
    h0.keys.foreach(t => assert(h1(t) < h0(t), s"t=$t"))
  }
}
