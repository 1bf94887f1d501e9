package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase

class SprtStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(batches: Seq[Seq[(String, Long, Long, Int)]])
      : (Seq[Map[String, (Long, Long, Option[Long], Option[String])]],
         Map[String, (Long, Long, Option[Long], Option[String])]) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, Int)]
    val sdf = mem.toDF.toDF("key", "tsUs", "tie", "conv")
    val name = s"sprt_sink_${System.nanoTime}"
    val q = SprtStream.sprtStream(sdf)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    var seen = 0
    val perBatch = try {
      batches.map { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        val all = spark.table(name).collect()
        val slice = all.drop(seen); seen = all.length
        slice.map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.getString(4))))).toMap
      }
    } finally q.stop()
    val batch = SprtStream.sprtBatch(
      batches.flatten.toDF("key", "tsUs", "tie", "conv"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.getString(4))))).toMap
    (perBatch, batch)
  }

  test("stream equals batch sprtBoundary after each prefix; decision freezes") {
    // allwin crosses +A at its 8th success (batch-2 territory)
    val win = (1 to 12).map(i => ("w", i * 1000L, i.toLong, 1))
    val (b1, b2) = win.splitAt(5)
    // mixed walker that never crosses in this data
    val mix = (1 to 10).map(i => ("m", i * 1000L, i.toLong, i % 2))
    val (updates, batch) = run(Seq(b1 ++ mix.take(4), b2 ++ mix.drop(4)))
    assert(updates.last("w") == batch("w"), s"${updates.last("w")} vs ${batch("w")}")
    assert(updates.last("m") == batch("m"))
    assert(batch("w")._4.contains("h1") && batch("w")._2 == 8L)
    assert(batch("m")._4.isEmpty)
    // the batch-1 emission equals batch-over-prefix too
    val prefix = SprtStream.sprtBatch(
      (b1 ++ mix.take(4)).toDF("key", "tsUs", "tie", "conv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(updates.head("w")._1 == prefix("w"))
    // post-decision events advance n but never the frozen verdict
    assert(updates.last("w")._1 == 12L && updates.last("w")._2 == 8L)
  }

  test("at-least-once replay below the watermark never double-counts") {
    val b1 = (1 to 6).map(i => ("r", i * 1000L, i.toLong, 1))
    // batch 2 replays batch 1 entirely, plus two new rows — and one
    // same-batch duplicate of a new row
    val b2 = b1 ++ Seq(("r", 7000L, 7L, 1), ("r", 7000L, 7L, 1),
      ("r", 8000L, 8L, 1))
    val (updates, _) = run(Seq(b1, b2))
    // parity target is the DEDUPED logical stream, not the raw replay
    val logical = b1 ++ Seq(("r", 7000L, 7L, 1), ("r", 8000L, 8L, 1))
    val batch = SprtStream.sprtBatch(
      logical.toDF("key", "tsUs", "tie", "conv"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.getString(4))))).toMap
    assert(updates.last("r") == batch("r"), s"${updates.last("r")} vs ${batch("r")}")
    assert(updates.last("r")._1 == 8L, s"${updates.last("r")}")
    assert(batch("r")._2 == 8L && batch("r")._4.contains("h1"))
  }
}
