package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase

/** [[TransitionStream]] — streaming transition counts == batch operator
  * under in-order-append batches, additive under redelivery. */
class TransitionStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val batch1 = Seq(
    (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
    (2L, ts(1), 3L, "a"))
  private val batch2 = Seq(
    (1L, ts(3), 4L, "a"), (2L, ts(4), 5L, "b"), (2L, ts(5), 6L, "c"))

  test("streamed increments sum to the batch transition counts across " +
      "batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val sdf = mem.toDF.toDF("user_id", "ts", "event_id", "event_type")
    val q = TransitionStream.transitionStream(sdf)
      .writeStream.format("memory").queryName("trans_sink")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("trans_sink")
        .groupBy("from_state", "to_state")
        .agg(sum("n").as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getLong(2)).toMap
      val batch = graft.ops.Eval.transitionMatrix(
        (batch1 ++ batch2).toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "event_type", Seq("ts", "event_id"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getAs[Long]("n")).toMap
      assert(streamed === batch)
      // the boundary transition (user 1: b @t2 -> a @t3) crossed batches
      // and must be present — it only exists because state carried t2
      assert(streamed(("b", "a")) === 1L)
    } finally q.stop()
  }

  test("within-batch event-time order beats arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val sdf = mem.toDF.toDF("user_id", "ts", "event_id", "event_type")
    val q = TransitionStream.transitionStream(sdf)
      .writeStream.format("memory").queryName("trans_sink2")
      .outputMode(OutputMode.Append).start()
    try {
      // delivered out of order inside one batch: c@3, a@1, b@2
      mem.addData((9L, ts(3), 3L, "c"), (9L, ts(1), 1L, "a"),
        (9L, ts(2), 2L, "b"))
      q.processAllAvailable()
      val got = spark.table("trans_sink2")
        .select("from_state", "to_state", "n")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getLong(2)).toMap
      assert(got === Map(("a", "b") -> 1L, ("b", "c") -> 1L))
    } finally q.stop()
  }
}
