package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TimeSeriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillForwardHourly: fills gaps, flags observations, no leading null") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00"), 100L, 1.0),
      (1L, ts("2024-01-01 10:45:00"), 101L, 2.0), // same hour: latest wins
      (1L, ts("2024-01-01 13:05:00"), 102L, 9.0), // 2-hour gap before
      (2L, ts("2024-01-01 00:00:00"), 103L, 5.0)  // single-event user
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries
      .gapFillForwardHourly(ev, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        r.getBoolean(3)))
      .sortBy(t => (t._1, t._2.getTime))
    val u1 = got.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq == Seq("10", "11", "12", "13")
      .map(h => ts(s"2024-01-01 $h:00:00")))
    assert(u1.map(_._3).toSeq == Seq(2.0, 2.0, 2.0, 9.0)) // ffill + in-hour latest
    assert(u1.map(_._4).toSeq == Seq(true, false, false, true))
    val u2 = got.filter(_._1 == 2L)
    assert(u2.toSeq == Seq((2L, ts("2024-01-01 00:00:00"), 5.0, true)))
  }

  test("gapFillForwardHourly: null-valued rows are not observations") {
    val ev = Seq(
      // hour 09: ONLY a null-valued row → spine must not start here
      (1L, ts("2024-01-01 09:30:00"), 99L, None: Option[Double]),
      (1L, ts("2024-01-01 10:15:00"), 100L, Some(1.0)),
      // later null in the SAME hour must not shadow the 1.0 observation
      (1L, ts("2024-01-01 10:45:00"), 101L, None: Option[Double]),
      (1L, ts("2024-01-01 12:05:00"), 102L, Some(9.0))
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries
      .gapFillForwardHourly(ev, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => (r.getTimestamp(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1.getTime)
    assert(got.map(_._1).toSeq == Seq("10", "11", "12")
      .map(h => ts(s"2024-01-01 $h:00:00")), got.mkString(","))
    assert(got.map(_._2).toSeq == Seq(1.0, 1.0, 9.0), got.mkString(","))
    assert(got.map(_._3).toSeq == Seq(true, false, true))
  }

  test("gapFillForwardHourly is deterministic across partitionings") {
    val ev = (1L to 500L).map(i =>
      (i % 7, ts(f"2024-01-01 ${(i % 20) % 24}%02d:00:01"), i, i * 1.5))
      .toDF("user_id", "ts", "event_id", "value")
    def run(df: org.apache.spark.sql.DataFrame) = TimeSeries
      .gapFillForwardHourly(df, "user_id", "ts", "event_id", "value")
      .collect().map(_.toSeq).toSet
    assert(run(ev) == run(ev.repartition(17)))
  }

  test("scd2History compresses runs; open row has null valid_to") {
    val ev = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-01 01:00:00"), 2L), // same state: compressed
      (1L, "b", ts("2024-01-01 02:00:00"), 3L),
      (1L, "a", ts("2024-01-01 03:00:00"), 4L)  // state can recur
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = TimeSeries
      .scd2History(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("valid_from")
      .collect().map(r => (r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3))))
    assert(got.toSeq == Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00"))),
      ("b", ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 03:00:00"))),
      ("a", ts("2024-01-01 03:00:00"), None)))
  }

  test("scd2History treats null states null-safely (no spurious changes)") {
    val ev = Seq(
      (1L, null.asInstanceOf[String], ts("2024-01-01 00:00:00"), 1L),
      (1L, null.asInstanceOf[String], ts("2024-01-01 01:00:00"), 2L),
      (1L, "x", ts("2024-01-01 02:00:00"), 3L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = TimeSeries
      .scd2History(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("valid_from").collect()
    assert(got.length == 2) // null run compressed to one row
    assert(got(0).isNullAt(1) && got(1).getString(1) == "x")
  }

  test("coverageGaps finds only gaps strictly above the threshold") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:30:00"), 2L), // 30 min: below
      (1L, ts("2024-01-01 02:30:01"), 3L), // 2h1s: above
      (1L, ts("2024-01-01 04:30:01"), 4L), // exactly 2h: NOT a gap (>)
      (2L, ts("2024-01-01 00:00:00"), 5L)) // single row: no pair
      .toDF("user_id", "ts", "event_id")
    val got = TimeSeries.coverageGaps(ev, "user_id", "ts", "event_id",
        minGapSeconds = 7200L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, ts("2024-01-01 02:30:01"), 7201L)),
      got.mkString(","))
  }

  test("interpolateHourly: exact linear values across the gap, observed " +
      "hours pass through") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, Some(10.0)),
      (1L, ts("2024-01-01 04:20:00"), 2L, Some(18.0)), // 4h gap → 3 interp
      (1L, ts("2024-01-01 04:40:00"), 3L, Some(20.0)), // same hour, later
      (1L, ts("2024-01-01 02:00:00"), 4L, None))       // null: not an obs
      .toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.interpolateHourly(ev, "user_id", "ts",
        "event_id", "value")
      .orderBy("hour")
      .collect().map(r => (r.getTimestamp(1).toString.take(13),
        r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00", 10.0, true),
      ("2024-01-01 01", 12.5, false),
      ("2024-01-01 02", 15.0, false), // null row claims nothing
      ("2024-01-01 03", 17.5, false),
      ("2024-01-01 04", 20.0, true))) // latest (ts, tie) in hour wins
  }

  test("interpolateHourly spine is bounded by observed hours per key") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 05:00:00"), 1L, Some(1.0)),
      (2L, ts("2024-01-01 00:00:00"), 2L, Some(2.0)),
      (2L, ts("2024-01-01 01:00:00"), 3L, Some(4.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.interpolateHourly(ev, "user_id", "ts",
        "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString))
    assert(got.length == 3) // 1 hour for key 1, 2 hours for key 2
  }

  test("decayedSum: exact whole-week halving and merge-by-rescale law") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ref = lit("2024-01-29 00:00:00").cast("timestamp")
    val ev = Seq(
      ("a", ts("2024-01-28 23:59:59"), Some(8.0)),  // age 0 wk → w=1
      ("a", ts("2024-01-21 12:00:00"), Some(8.0)),  // age 1 wk → w=0.5
      ("a", ts("2024-01-08 00:00:01"), Some(8.0)),  // age 2 wk → w=0.25
      ("a", ts("2024-01-01 00:00:00"), None))       // null value excluded
      .toDF("event_type", "ts", "value")
    val r = TimeSeries.decayedSum(ev, "event_type", "ts", "value", ref)
      .head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 1.75)        // 1 + 0.5 + 0.25
    assert(r.getDouble(3) == 8.0 * 1.75)  // exact: 2^-k scaling
    // merge law: a sum referenced 1 week earlier re-references by ×0.5
    val older = TimeSeries.decayedSum(ev, "event_type", "ts", "value",
      lit("2024-02-05 00:00:00").cast("timestamp")).head()
    assert(older.getDouble(3) == r.getDouble(3) * 0.5)
  }

  test("kaplanMeier: textbook curve with censoring") {
    val s = spark
    import s.implicits._
    // durations (event=1 observed, 0 censored):
    // 2(e), 3(c), 4(e), 4(e), 5(c), 6(e)
    val df = Seq((2L, 1), (3L, 0), (4L, 1), (4L, 1), (5L, 0), (6L, 1))
      .toDF("dur", "ev")
    val got = TimeSeries.kaplanMeier(df, "dur", "ev")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
          r.getAs[Double]("survival"))).toMap
    // t=2: risk 6, 1 event → 5/6; t=4: risk 4, 2 events → 5/6·1/2 = 5/12
    // t=6: risk 1, 1 event → S = 0 (d = n case)
    assert(got(2L)._1 === 6L && math.abs(got(2L)._3 - 5.0 / 6) < 1e-5)
    assert(got(4L) === ((4L, 2L, got(4L)._3)))
    assert(math.abs(got(4L)._3 - 5.0 / 12) < 1e-5)
    assert(got(6L)._3 === 0.0)
    // censored-only times (3, 5) emit no curve row
    assert(!got.contains(3L) && !got.contains(5L))
  }

  test("kaplanMeier: no censoring reduces to the empirical survivor fn") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1)).toDF("dur", "ev")
    val got = TimeSeries.kaplanMeier(df, "dur", "ev")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("survival"))
      .toMap
    assert(math.abs(got(1L) - 0.75) < 1e-6)
    assert(math.abs(got(2L) - 0.5) < 1e-6)
    assert(math.abs(got(3L) - 0.25) < 1e-6)
    assert(got(4L) === 0.0)
  }
}
