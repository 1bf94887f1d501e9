package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Stats, TimeSeries}

/** Round-5 batch 7: Nelson–Aalen (q258), RFM segmentation (q259),
  * ABC classification (q260). */
class SegmentationSpec extends SparkSpecBase {
  import spark.implicits._

  test("nelsonAalen: textbook increments, KM/NA consistency bound") {
    // durations 1,2,2,3 all events: t=1 n=4 d=1; t=2 n=3 d=2; t=3 n=1 d=1
    val df = Seq(1, 2, 2, 3).map(d => (d, 1)).toDF("dur", "ev")
    val na = TimeSeries.nelsonAalen(df, "dur", "ev").collect()
      .map(r => r.getAs[Int]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Double]("cum_hazard"))).toMap
    assert(na(1) == ((4L, 0.25)))
    assert(na(2)._1 == 3L)
    assert(math.abs(na(2)._2 - (0.25 + 2.0 / 3)) < 1e-6)
    assert(math.abs(na(3)._2 - (0.25 + 2.0 / 3 + 1.0)) < 1e-6)
    // NA survival ≥ KM survival pointwise (standard inequality)
    val km = TimeSeries.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getAs[Int]("t") -> r.getAs[Double]("survival")).toMap
    val nas = TimeSeries.nelsonAalen(df, "dur", "ev").collect()
      .map(r => r.getAs[Int]("t") -> r.getAs[Double]("survival")).toMap
    assert(km.keySet == nas.keySet)
    assert(km.keys.forall(t => nas(t) >= km(t) - 1e-9), s"$nas vs $km")
  }

  test("rfmScores: direction of every axis, deterministic tiles") {
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // u1: recent, frequent, big; u5: stale, rare, small
    val tx = (1 to 5).flatMap { u =>
      (1 to (6 - u)).map(i => (u.toLong, t(u * 5), (6 - u) * 10.0))
    }.toDF("u", "ts", "amt")
    val out = Stats.rfmScores(tx, "u", "ts", col("amt")).collect()
      .map(r => r.getAs[Long]("u") ->
        (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
          r.getAs[Int]("m_score"), r.getAs[String]("rfm"))).toMap
    // u5 transacted LAST (day 25) → most recent → r=5; fewest+smallest
    assert(out(5L)._1 == 5 && out(5L)._2 == 1 && out(5L)._3 == 1)
    assert(out(5L)._4 == "511")
    // u1 stalest but most frequent and biggest spender
    assert(out(1L) == ((1, 5, 5, "155")))
    // recency of the frontier user is 0 days
    val rec = Stats.rfmScores(tx, "u", "ts", col("amt"))
      .filter(col("u") === 5).collect().head
    assert(rec.getAs[Int]("recency_days") == 0)
  }

  test("q262 bounded funnel: stages shrink and are subsets of q119's") {
    val free = graft.queries.Relational.q119Funnel(spark, sf).collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    val bound = graft.queries.Relational
      .q262ConstrainedFunnel(spark, sf).collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(bound(1) == free(1), "stage 1 has no window to constrain")
    assert(bound(2) <= free(2) && bound(3) <= free(3),
      s"window can only remove conversions: $bound vs $free")
    assert(bound(1) >= bound(2) && bound(2) >= bound(3),
      "funnel stages are monotone")
  }

  test("abcClassify: cumulative shares and class cuts are exact") {
    // values 50, 30, 15, 5 → cum shares .5, .8, .95, 1.0
    val df = Seq(("w", 50.0), ("x", 30.0), ("y", 15.0), ("z", 5.0))
      .toDF("k", "v")
    val out = Stats.abcClassify(df, "k", col("v")).collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("cum_share"), r.getAs[String]("abc"))).toMap
    assert(out("w") == ((0.5, "A")))
    assert(out("x") == ((0.8, "A")), "boundary is inclusive")
    assert(out("y") == ((0.95, "B")))
    assert(out("z") == ((1.0, "C")))
    // value ties break by key: stable classes under rerun/partitioning
    val tied = Seq(("a", 10.0), ("b", 10.0), ("c", 10.0))
      .toDF("k", "v")
    val classes = Stats.abcClassify(tied, "k", col("v")).collect()
      .map(r => r.getString(0) -> r.getAs[String]("abc")).toMap
    assert(classes == Map("a" -> "A", "b" -> "A", "c" -> "C"))
  }
}
