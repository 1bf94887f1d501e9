package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class IntervalsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mergeIntervals coalesces overlapping and gap-adjacent intervals") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (1L, ts("2024-01-02 00:00:00"), ts("2024-01-04 00:00:00")), // overlaps
      (1L, ts("2024-01-05 00:00:00"), ts("2024-01-06 00:00:00")), // 1d gap
      (1L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00")), // far
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    ).toDF("k", "s", "e")

    // strict overlap: the 1-day gap splits
    val strict = Intervals.mergeIntervals(iv, Seq(col("k")), col("s"),
        col("e"), expr("INTERVAL 0 SECONDS"))
      .orderBy("k", "era_start").collect()
    assert(strict.map(_.getLong(3)).toSeq == Seq(2L, 1L, 1L, 1L))

    // 2-day persistence window: bridges the 1-day gap, not the far one
    val tolerant = Intervals.mergeIntervals(iv, Seq(col("k")), col("s"),
        col("e"), expr("INTERVAL 2 DAYS"))
      .orderBy("k", "era_start").collect()
    assert(tolerant.map(_.getLong(3)).toSeq == Seq(3L, 1L, 1L))
    val first = tolerant.head
    assert(first.getTimestamp(1) == ts("2024-01-01 00:00:00"))
    assert(first.getTimestamp(2) == ts("2024-01-06 00:00:00"))
  }

  test("mergeIntervals handles containment (running max end, not last end)") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")), // umbrella
      (1L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00")), // inside
      (1L, ts("2024-01-09 00:00:00"), ts("2024-01-12 00:00:00"))
    ).toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(iv, Seq(col("k")), col("s"), col("e"),
      expr("INTERVAL 0 SECONDS")).collect()
    // a naive lag(e) would see 01-03 < 01-09 and split; the running max
    // must keep all three in one era
    assert(got.length == 1 && got.head.getLong(3) == 3L)
  }

  test("property: mergeIntervals equals brute-force merge on random inputs") {
    // deterministic pseudo-random interval sets (numeric intervals: the
    // operator is generic over any ordered +-able type)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val gap = rnd.nextInt(5).toLong
      val rows = (1 to 60).map { _ =>
        val k = rnd.nextInt(4).toLong
        val s = rnd.nextInt(100).toLong
        (k, s, s + rnd.nextInt(10).toLong)
      }
      // reference implementation: per key, sort and fold
      val expected = rows.groupBy(_._1).flatMap { case (k, iv) =>
        val sorted = iv.map(r => (r._2, r._3)).sortBy(identity)
        val eras = scala.collection.mutable.ListBuffer
          .empty[(Long, Long, Long)] // start, maxEnd, n
        for ((s, e) <- sorted) {
          if (eras.nonEmpty && eras.last._2 + gap >= s) {
            val (cs, ce, n) = eras.last
            eras(eras.length - 1) = (cs, math.max(ce, e), n + 1)
          } else eras += ((s, e, 1L))
        }
        eras.map { case (s, e, n) => (k, s, e, n) }
      }.toSet
      val got = Intervals.mergeIntervals(
          rows.toDF("k", "s", "e").repartition(3),
          Seq(col("k")), col("s"), col("e"), lit(gap))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"trial $trial gap $gap")
    }
  }

  test("bandedRangeJoin equals the naive theta-join on events") {
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    // ±2h window: sf0.001 is sparse (~7 events/user over a month); the
    // wide window guarantees matches while still spanning several bands
    val banded = Intervals.bandedRangeJoin(errors, clicks, Seq("user_id"),
        "err_ts", "click_ts", -7200, 7200, bandSec = Some(600))
      .select("err_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val delta = unix_micros(col("click_ts")) - unix_micros(col("err_ts"))
    val naive = errors.join(clicks, Seq("user_id"))
      .filter(delta >= -7200000000L && delta <= 7200000000L)
      .select("err_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    assert(banded.nonEmpty)
  }

  test("bandedRangeJoin includes exact window boundaries, excludes outside") {
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("k", "lid", "l_ts")
    val r = Seq(
      (1L, 20L, ts("2024-01-01 09:59:00")), // exactly -60s
      (1L, 21L, ts("2024-01-01 10:01:00")), // exactly +60s
      (1L, 22L, ts("2024-01-01 10:01:00.000001")), // 1µs outside
      (2L, 23L, ts("2024-01-01 10:00:00"))  // wrong key
    ).toDF("k", "rid", "r_ts")
    val got = Intervals.bandedRangeJoin(l, r, Seq("k"), "l_ts", "r_ts",
        -60, 60)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(20L, 21L))
  }
}
