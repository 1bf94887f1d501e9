package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase

/** Drives the streaming operators through actual micro-batch execution
  * (MemoryStream → writeStream → memory sink) and checks parity with the
  * batch forms of the same transforms. */
class EventStreamsSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    // user 1: two sessions separated by > 30 min
    (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
    (1L, ts("2024-01-01 10:10:00"), "click", 2.0),
    (1L, ts("2024-01-01 11:30:00"), "purchase", 3.0),
    // user 2: one session
    (2L, ts("2024-01-01 10:05:00"), "signup", 4.0),
    // late sentinel that closes everything via watermark
    (9L, ts("2024-01-02 00:00:00"), "click", 0.0))

  private def toDf(r: Seq[(Long, Timestamp, String, Double)]) = {
    import spark.implicits._
    r.toDF("user_id", "ts", "event_type", "value")
  }

  test("hourlyRollup parity: streaming complete-mode equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val sdf = mem.toDF.toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.hourlyRollup(sdf)
      .writeStream.format("memory").queryName("rollup_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("rollup_sink")
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      val batch = EventStreams.hourlyRollup(toDf(rows))
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("sessionizeStream closes sessions like sessionizeBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val sdf = mem.toDF.toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.sessionizeStream(sdf)
      .writeStream.format("memory").queryName("session_sink")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // push the watermark far forward so timed-out state flushes
      mem.addData((9L, ts("2024-01-03 00:00:00"), "click", 0.0))
      q.processAllAvailable()
      mem.addData((9L, ts("2024-01-04 00:00:00"), "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("session_sink")
        .select("user_id", "session_start", "session_end", "n_events")
        .filter(col("user_id").isin(1L, 2L))
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      val batch = EventStreams.sessionizeBatch(toDf(rows))
        .select("user_id", "session_start", "session_end", "n_events")
        .filter(col("user_id").isin(1L, 2L))
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch,
        s"streamed=$streamed\nbatch=$batch")
      // user 1 split into two sessions, user 2 one session
      assert(batch.count(_.head == 1L) == 2)
      assert(batch.count(_.head == 2L) == 1)
    } finally q.stop()
  }
}
