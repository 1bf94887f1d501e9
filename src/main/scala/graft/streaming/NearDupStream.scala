package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.NearDup

/** Streaming near-duplicate candidate detection — the ingest-time tier of
  * corpus dedup: as documents arrive, flag the ones that near-duplicate a
  * recently seen doc, without ever aggregating the corpus.
  *
  * Shape: the minhash signature is computed PER ROW
  * ([[NearDup.signatureColumn]], bit-identical to the batch aggregation,
  * zero shuffle), rows explode to their LSH band buckets, and a
  * `flatMapGroupsWithState` keyed on the bucket keeps the last
  * `maxBucketDocs` (doc_id, signature) entries per bucket. An arriving doc
  * emits one candidate per stored bucket-mate with the signature-agreement
  * estimate of Jaccard (k-minhash agreement / k — the standard streaming
  * estimate; exact verification stays a batch concern, the stored docs'
  * text is gone).
  *
  * State is O(active buckets × maxBucketDocs × k) and event-time timeouts
  * evict buckets idle past the watermark — never O(stream history). A pair
  * sharing several bands emits once per shared bucket; downstream consumers
  * `dropDuplicates("doc_a", "doc_b")` within their own watermark.
  */
object NearDupStream {

  case class BucketDoc(bucket: String, doc_id: Long,
                       ts: java.sql.Timestamp, sig: Seq[Long])
  case class BucketState(docs: List[(Long, Seq[Long])])
  case class Candidate(doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** @param docs stream (or batch frame) with doc_id, ts, text
    * @param minEstJaccard emit only pairs whose signature agreement
    *                      reaches this estimate
    * @param maxBucketDocs per-bucket state cap (oldest evicted first) */
  def candidates(docs: DataFrame, shingleN: Int = 3, numHashes: Int = 16,
                 rowsPerBand: Int = 4, watermarkDelay: String = "1 hour",
                 minEstJaccard: Double = 0.5,
                 maxBucketDocs: Int = 64): Dataset[Candidate] = {
    require(numHashes % rowsPerBand == 0, "numHashes % rowsPerBand != 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val nBands = numHashes / rowsPerBand
    val k = numHashes

    val sig = NearDup.signatureColumn(col("text"), shingleN, numHashes)
    val banded = docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), sig.as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(array((0 until nBands).map(b =>
          concat_ws("-", lit(b) +: (0 until rowsPerBand).map(s =>
            col("sig")(b * rowsPerBand + s).cast("string")): _*)): _*))
          .as("bucket"))
      .as[BucketDoc]

    def agreement(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / k

    def update(bucket: String, rows: Iterator[BucketDoc],
               state: GroupState[BucketState]): Iterator[Candidate] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var stored = state.getOption.map(_.docs).getOrElse(Nil)
        val out = List.newBuilder[Candidate]
        var maxTs = Long.MinValue
        // deterministic within-batch order: arrival is (ts, doc_id)
        for (d <- rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))) {
          maxTs = math.max(maxTs, d.ts.getTime)
          for ((oldId, oldSig) <- stored if oldId != d.doc_id) {
            val est = agreement(oldSig, d.sig)
            if (est >= minEstJaccard)
              out += Candidate(math.min(oldId, d.doc_id),
                math.max(oldId, d.doc_id), est)
          }
          // filterNot: an at-least-once source can redeliver a doc_id —
          // without the dedupe the duplicate occupies a second state slot
          // (evicting a distinct older doc early) and double-emits every
          // future candidate against this doc
          stored = ((d.doc_id, d.sig) :: stored.filterNot(_._1 == d.doc_id))
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
