package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase
import graft.ops.VectorOps

class SrpNearDupStreamSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch parity: streaming bucket collisions reproduce the batch " +
      "banded operator's candidate pair set exactly (same mu, same " +
      "plane family, same band layout)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val mu = VectorOps.dimensionMeans(vecs, "embedding")
    // batch side: all candidates (minCos = -1 disables the verify gate)
    val batchPairs = VectorOps.srpBandedNearDupPairs(vecs, 4, 8, -1.0)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // stream side: one micro-batch, est gate disabled, cap above the
    // largest bucket so nothing evicts
    val mem = MemoryStream[(Long, Timestamp, Seq[Float])]
    val sdf = mem.toDF.toDF("vec_id", "ts", "embedding")
    val q = SrpNearDupStream.candidates(sdf, mu, bands = 4,
        planesPerBand = 8, minEstCos = -1.0, maxBucketDocs = 10000)
      .writeStream.format("memory").queryName("srp_parity_sink")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = vecs.collect().map(r => (r.getLong(0),
        ts("2024-01-01 10:00:00"), r.getSeq[Float](1)))
      mem.addData(rows.toSeq)
      q.processAllAvailable()
      val streamPairs = spark.table("srp_parity_sink")
        .select("vec_a", "vec_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamPairs == batchPairs,
        s"stream-only: ${streamPairs.diff(batchPairs).take(3)} " +
          s"batch-only: ${batchPairs.diff(streamPairs).take(3)}")
    } finally q.stop()
  }

  test("exact duplicate arriving in a later micro-batch estimates " +
      "cos = 1.0; unrelated noise stays below the gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = 8
    val mu = Seq.fill(dim)(0.0)
    val a = Seq.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val b = Seq.tabulate(dim)(i => if (i % 2 == 0) -1.0f else 1.0f) // -a
    val mem = MemoryStream[(Long, Timestamp, Seq[Float])]
    val sdf = mem.toDF.toDF("vec_id", "ts", "embedding")
    val q = SrpNearDupStream.candidates(sdf, mu, bands = 4,
        planesPerBand = 8, minEstCos = 0.9)
      .writeStream.format("memory").queryName("srp_dup_sink")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), a),
        (3L, ts("2024-01-01 10:00:05"), b))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 10:05:00"), a)) // exact dup of 1
      q.processAllAvailable()
      val got = spark.table("srp_dup_sink")
        .groupBy("vec_a", "vec_b").agg(max("est_cos").as("est"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(got.contains((1L, 2L)) && got((1L, 2L)) == 1.0, s"$got")
      // -a shares no sign bit with a: never a candidate, never emitted
      assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L), s"$got")
    } finally q.stop()
  }
}
