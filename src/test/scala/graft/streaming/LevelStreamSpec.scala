package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase

class LevelStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, Long, Double)]])
      : (Seq[Map[Long, (Long, Double)]], Map[Long, (Long, Double)]) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val sdf = mem.toDF.toDF("key", "tsUs", "tie", "value")
    val name = s"level_sink_${System.nanoTime}"
    val q = LevelStream.levelStream(sdf)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    var seen = 0
    val perBatch = try {
      batches.map { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        val all = spark.table(name).collect()
        val slice = all.drop(seen); seen = all.length
        slice.map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
          .toMap
      }
    } finally q.stop()
    val batch = LevelStream.levelBatch(
      batches.flatten.toDF("key", "tsUs", "tie", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    (perBatch, batch)
  }

  test("streaming level equals batch ewmaTrailing after each prefix, " +
      "including out-of-order arrivals") {
    val b1 = (1 to 10).map(i =>
      (1L, i * 1000000L, i.toLong, i * 2.0)) :+ ((2L, 1000000L, 99L, 7.5))
    // batch 2: more rows for key 1, one OUT-OF-ORDER row landing
    // between batch-1 observations (ts 5.5s) — inside the 16-window
    val b2 = Seq((1L, 12000000L, 12L, 30.0),
      (1L, 5500000L, 55L, 100.0), (2L, 2000000L, 100L, 9.5))
    val (updates, batch) = run(Seq(b1, b2))
    // after the final batch the stream level equals the batch operator
    assert(updates.last.keySet == Set(1L, 2L))
    assert(updates.last(1L) == batch(1L), s"${updates.last(1L)} vs ${batch(1L)}")
    assert(updates.last(2L) == batch(2L))
    // and the first batch's emission equals batch-over-prefix
    val prefix = LevelStream.levelBatch(
      b1.toDF("key", "tsUs", "tie", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(updates.head(1L) == prefix(1L))
    assert(updates.head(2L) == prefix(2L))
  }

  test("window truncation: only the last 16 observations matter") {
    val many = (1 to 40).map(i => (9L, i * 1000000L, i.toLong, i * 1.0))
    val (updates, batch) = run(Seq(many))
    assert(updates.last(9L)._2 == batch(9L)._2)
    // shifting everything older than the window leaves the level alone
    val tail16 = many.takeRight(16)
    assert(LevelStream.ewmaOf(tail16.map(_._4)) == updates.last(9L)._2)
  }

  test("at-least-once replay re-emits but never skews the level") {
    val b1 = (1 to 5).map(i => (3L, i * 1000000L, i.toLong, i * 3.0))
    val (updates, _) = run(Seq(b1, b1)) // full replay of batch 1
    assert(updates(0)(3L)._2 == updates(1)(3L)._2,
      "replayed batch must not change the level")
  }
}
