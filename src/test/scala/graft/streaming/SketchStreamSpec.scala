package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase

class SketchStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming CMS cells equal the batch sketch after each prefix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val sdf = mem.toDF.toDF("key")
    val q = SketchStream.cmsStream(sdf, depth = 4, width = 16)
      .writeStream.format("memory").queryName("cms_sink")
      .outputMode(OutputMode.Update).start()
    def cells(): Map[(Int, Long), Long] = {
      // update mode re-emits refreshed cells; latest emission per cell
      // is the current state — take the max (counts only grow)
      spark.table("cms_sink").collect()
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case (k, rs) => k -> rs.map(_.getLong(2)).max }
    }
    def batch(data: Seq[Long]): Map[(Int, Long), Long] =
      SketchStream.cmsBatch(data.toDF("key"), 4, 16)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val b1 = (1L to 40L).map(_ % 7)
    val b2 = (1L to 25L).map(_ % 3)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(cells() == batch(b1))
      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(cells() == batch(b1 ++ b2))
    } finally q.stop()
  }

  test("streaming KMV: per-batch updates match the batch sketch; " +
      "replay never corrupts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val sdf = mem.toDF.toDF("key", "h")
    val q = SketchStream.kmvStream(sdf, k = 8)
      .writeStream.format("memory").queryName("kmv_sink")
      .outputMode(OutputMode.Update).start()
    // updates appended per trigger: slice the memory table by the row
    // count before each batch to recover that batch's update set
    var seen = 0
    def batchUpdates(): Map[String, (Option[Long], Int, Long)] = {
      val all = spark.table("kmv_sink").collect()
      val slice = all.drop(seen)
      seen = all.length
      slice.map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          r.getInt(2), r.getLong(3))).toMap
    }
    val evens = (1L to 20L).map(_ * 2)
    val odds = (0L until 20L).map(_ * 2 + 1)
    try {
      mem.addData(evens.map(("a", _)) :+ (("b", 50L)): _*)
      q.processAllAvailable()
      val u1 = batchUpdates()
      // a: bottom-8 of evens 2..40 → kth 16, est = 7·Mod div 16
      assert(u1("a") == ((Some(16L), 8, 7L * 1000000007L / 16L)), u1)
      assert(u1("b") == ((None, 1, 1L)))
      mem.addData(odds.map(("a", _)) ++ Seq(10L, 20L, 30L).map(("b", _)): _*)
      q.processAllAvailable()
      val u2 = batchUpdates()
      // a: union bottom-8 is 1..8 → kth 8; b: 4 distinct, still exact
      assert(u2("a") == ((Some(8L), 8, 7L * 1000000007L / 8L)), u2)
      assert(u2("b") == ((None, 4, 4L)))
      // the running state now equals the batch sketch of the full stream
      val batch = SketchStream.kmvBatch(
        (evens.map(("a", _)) ++ odds.map(("a", _)) ++
          Seq(50L, 10L, 20L, 30L).map(("b", _))).toDF("key", "h"), 8)
        .collect().map(r => r.getString(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
            r.getInt(2), r.getLong(3))).toMap
      assert(batch == u2, s"$batch vs $u2")
      // at-least-once replay: re-delivering batch 1 re-emits updates but
      // every readout is unchanged — the set fold absorbs duplicates
      mem.addData(evens.map(("a", _)) :+ (("b", 50L)): _*)
      q.processAllAvailable()
      assert(batchUpdates() == u2)
    } finally q.stop()
  }
}
