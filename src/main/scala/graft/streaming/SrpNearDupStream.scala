package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.VectorOps

/** Streaming EMBEDDING near-duplicate candidates — the SRP twin of
  * [[NearDupStream]] (which covers the minhash/text side): as vectors
  * arrive, flag the ones whose banded SRP buckets collide with a recently
  * seen vector, without aggregating the stream.
  *
  * Shape mirrors the batch [[VectorOps.srpBandedNearDupPairs]]: each row
  * computes its b band signatures over the MEAN-CENTERED vector (same
  * Knuth-mixed plane family, bit-identical to batch), explodes to
  * (band, sig) buckets, and a `flatMapGroupsWithState` keyed on the
  * bucket keeps the last `maxBucketDocs` (vec_id, full signature)
  * entries. An arriving vector emits one candidate per stored bucket-mate
  * with the SRP angle estimate of cosine — cos(π · disagreeing planes /
  * total planes) over all b·r planes, the hyperplane analog of the
  * minhash twin's agreement/k estimate. Exact-cosine verification stays a
  * batch concern: state stores b longs per vector, never the d-float
  * embedding.
  *
  * CENTERING IS A PARAMETER here (`mu`): a stream has no corpus mean to
  * aggregate, and at 100 TB the mean comes from the batch profile of the
  * reference corpus anyway ([[VectorOps]] dimensionMeans) and is
  * broadcast into the job. Pass the same μ the batch side used and the
  * bucket keys are bit-identical (batch-parity spec-pinned).
  *
  * State is O(active buckets × maxBucketDocs × bands) and event-time
  * timeouts evict buckets idle past the watermark. A pair sharing k bands
  * emits once per shared bucket; downstream `dropDuplicates("vec_a",
  * "vec_b")` within its own watermark, exactly like the minhash twin. */
object SrpNearDupStream {

  case class BucketVec(bucket: String, vec_id: Long,
                       ts: java.sql.Timestamp, sig: Seq[Long])
  case class BucketState(vecs: List[(Long, Seq[Long])])
  case class Candidate(vec_a: Long, vec_b: Long, est_cos: Double)

  /** Per-row banded signature array: element b = band b's sign bits over
    * family planes [b·r, (b+1)·r) of v − μ — the batch operator's exact
    * bucketing, as a pure Column (zero shuffle, stream-safe). */
  def bandedSignature(vecCol: Column, mu: Seq[Double], bands: Int,
                      planesPerBand: Int): Column = {
    val centered = zip_with(vecCol,
      array(mu.map(lit(_)): _*),
      (x, m) => x.cast("double") - m)
    array((0 until bands).map(b =>
      VectorOps.srpSignature(centered, planesPerBand, mu.length,
        planeOffset = b * planesPerBand)): _*)
  }

  /** [[candidates]] with (planes, bands) derived from the EXPECTED
    * corpus size by the batch tier's recall contract
    * ([[VectorOps.autoPlaneCount]] / [[VectorOps.srpBandCount]]) — a
    * stream cannot count itself, so the caller declares the scale the
    * ingest is sized for (same posture as `mu`: both come from the
    * batch profile of the reference corpus). */
  def candidatesAuto(vecs: DataFrame, mu: Seq[Double], expectedN: Long,
                     watermarkDelay: String = "1 hour",
                     minEstCos: Double = 0.5,
                     maxBucketDocs: Int = 64): Dataset[Candidate] = {
    require(expectedN > 0, s"expectedN must be > 0, got $expectedN")
    candidates(vecs, mu, VectorOps.srpBandCount(expectedN),
      VectorOps.autoPlaneCount(expectedN), watermarkDelay, minEstCos,
      maxBucketDocs)
  }

  /** @param vecs stream (or batch frame) with vec_id, ts, embedding
    * @param mu per-dimension mean of the reference corpus (drives
    *           centering; length pins the dimensionality)
    * @param minEstCos emit only pairs whose angle estimate reaches this
    * @param maxBucketDocs per-bucket state cap (oldest evicted first) */
  def candidates(vecs: DataFrame, mu: Seq[Double], bands: Int,
                 planesPerBand: Int, watermarkDelay: String = "1 hour",
                 minEstCos: Double = 0.5,
                 maxBucketDocs: Int = 64): Dataset[Candidate] = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val spark = vecs.sparkSession
    import spark.implicits._
    val totalPlanes = bands * planesPerBand

    val banded = vecs
      .withWatermark("ts", watermarkDelay)
      .select(col("vec_id"), col("ts"),
        bandedSignature(col("embedding"), mu, bands, planesPerBand)
          .as("sig"))
      .select(col("vec_id"), col("ts"), col("sig"),
        explode(array((0 until bands).map(b => concat_ws("-",
          lit(b), col("sig")(b).cast("string"))): _*)).as("bucket"))
      .as[BucketVec]

    // SRP angle estimate: each plane disagrees with probability θ/π, so
    // θ̂ = π · (disagreeing planes / total) and est_cos = cos(θ̂) — the
    // Goemans–Williamson estimator over the full b·r-plane signature
    def estCos(a: Seq[Long], b: Seq[Long]): Double = {
      var disagree = 0
      var i = 0
      while (i < a.length) {
        disagree += java.lang.Long.bitCount(a(i) ^ b(i))
        i += 1
      }
      math.cos(math.Pi * disagree / totalPlanes)
    }

    def update(bucket: String, rows: Iterator[BucketVec],
               state: GroupState[BucketState]): Iterator[Candidate] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var stored = state.getOption.map(_.vecs).getOrElse(Nil)
        val out = List.newBuilder[Candidate]
        var maxTs = Long.MinValue
        for (d <- rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id))) {
          maxTs = math.max(maxTs, d.ts.getTime)
          for ((oldId, oldSig) <- stored if oldId != d.vec_id) {
            val est = estCos(oldSig, d.sig)
            if (est >= minEstCos)
              out += Candidate(math.min(oldId, d.vec_id),
                math.max(oldId, d.vec_id), est)
          }
          // at-least-once sources can redeliver a vec_id; without the
          // dedupe it occupies a second slot and double-emits forever
          stored = ((d.vec_id, d.sig) :: stored.filterNot(_._1 == d.vec_id))
            .take(maxBucketDocs)
        }
        state.update(BucketState(stored))
        if (maxTs != Long.MinValue)
          state.setTimeoutTimestamp(maxTs, watermarkDelay)
        out.result().iterator
      }
    }

    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
