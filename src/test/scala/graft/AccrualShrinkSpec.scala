package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.{Intervals, Stats}

/** Round-5 batch 3: pro-rata monthly allocation (q248), EB rate
  * shrinkage (q250), cohort LTV monotonicity (q249). */
class AccrualShrinkSpec extends SparkSpecBase {
  import spark.implicits._

  test("allocateMonthly: boundary split is day-exact, Σ alloc = value") {
    // Jan 25 .. Feb 5 inclusive = 12 days: 7 in Jan, 5 in Feb
    val df = Seq((1L, Date.valueOf("2024-01-25"),
      Date.valueOf("2024-02-05"), 120.0)).toDF("k", "s", "e", "v")
    val out = Intervals.allocateMonthly(df, Seq(col("k")), col("s"),
      col("e"), col("v")).collect()
      .map(r => r.getDate(1).toString ->
        (r.getAs[Int]("overlap_days"), r.getAs[Int]("span_days"),
          r.getAs[java.math.BigDecimal]("alloc").doubleValue))
      .toMap
    assert(out("2024-01-01") == ((7, 12, 70.0)))
    assert(out("2024-02-01") == ((5, 12, 50.0)))
    // single-month interval: one slice, full value
    val one = Intervals.allocateMonthly(
      Seq((2L, Date.valueOf("2024-03-10"), Date.valueOf("2024-03-10"),
        9.5)).toDF("k", "s", "e", "v"),
      Seq(col("k")), col("s"), col("e"), col("v")).collect()
    assert(one.length == 1 &&
      one.head.getAs[java.math.BigDecimal]("alloc").doubleValue == 9.5)
  }

  test("allocateMonthly: accounting identity within rounding budget") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .limit(200)
      .select(col("o_orderkey").as("k"),
        to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % 45).cast("int")).as("e"),
        col("o_totalprice").as("v"))
    val drift = Intervals.allocateMonthly(orders, Seq(col("k")),
        col("s"), col("e"), col("v"))
      .groupBy("k").agg(sum(col("alloc")).cast("double").as("got"),
        count(lit(1)).as("slices"))
      .join(orders, "k")
      .select(abs(col("got") - col("v")).as("d"), col("slices"))
      .collect()
    // each slice contributes ≤ 5e-10 rounding error
    assert(drift.forall(r =>
      r.getAs[Double]("d") <= 5e-10 * r.getAs[Long]("slices") + 1e-12))
  }

  test("ebShrinkRates: small samples shrink harder, toward the prior") {
    // stratum prior ≈ 0.5 from many balanced units; one tiny unit at
    // rate 1.0 (n=2) and one large at 1.0 (n=100)
    val rows =
      (1 to 20).flatMap(u => Seq(("s", s"u$u", 1), ("s", s"u$u", 0))) ++
      Seq.fill(2)(("s", "tiny", 1)) ++
      Seq.fill(100)(("s", "big", 1))
    val out = Stats.ebShrinkRates(rows.toDF("g", "unit", "c"),
      Seq("g"), "unit", col("c")).collect()
      .map(r => r.getAs[String]("unit") ->
        (r.getAs[Double]("raw_rate"), r.getAs[Double]("shrunk_rate")))
      .toMap
    val (_, tinyShrunk) = out("tiny")
    val (_, bigShrunk) = out("big")
    assert(tinyShrunk < bigShrunk,
      s"tiny $tinyShrunk must be pulled below big $bigShrunk")
    assert(tinyShrunk > 0.5 && tinyShrunk < 1.0, "between prior and raw")
    // balanced units stay near their raw 0.5
    assert(math.abs(out("u1")._2 - 0.5) < 0.2)
  }

  test("ebShrinkRates: degenerate strata fall back to raw, NULL prior") {
    // zero variance (all units same rate) and single-unit strata
    val rows = Seq(("z", "a", 1), ("z", "a", 0), ("z", "b", 1),
      ("z", "b", 0), ("one", "only", 1))
    val out = Stats.ebShrinkRates(rows.toDF("g", "unit", "c"),
      Seq("g"), "unit", col("c")).collect()
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("prior_k")), s"NULL k: $r")
      assert(r.getAs[Double]("shrunk_rate") ==
        r.getAs[Double]("raw_rate"), s"raw fallback: $r")
    }
  }

  test("q249 cohort LTV: cumulative revenue is nondecreasing per cohort") {
    val out = graft.queries.Relational.q249CohortLtv(spark, sf)
      .orderBy("cohort_week", "week_offset").collect()
    out.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val cums = rows.sortBy(_.getInt(1)).map(_.getAs[Double]("cum_revenue"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    }
  }
}
