package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.ops.Eval.sprtBoundary]]: the sequential
  * A/B decision maintained AT INGEST — each micro-batch advances the
  * per-key log-likelihood walk and the emitted row always carries the
  * current verdict, so "stop the experiment" fires the moment the
  * evidence crosses a Wald boundary instead of at the next batch query.
  *
  * State per key is four scalars (running LLR in exact 1e-9 units as a
  * long, rows seen, the frozen decision, the (ts, tie) high-watermark)
  * — constant-size, never the stream. The LLR increments are the SAME
  * 9-decimal literals the batch operator folds, and a long sum of
  * 1e-9 units IS that decimal sum, so after any in-order prefix the
  * stream's (n_seen, decision) equals the batch operator bit-for-bit.
  *
  * Delivery contract: in-order per key across batches (each batch is
  * sorted internally, so same-batch disorder is fine). At-least-once
  * replays are absorbed by the (ts, tie) high-watermark: a replayed
  * row sorts at-or-below the watermark and is dropped before it can
  * double-count — under the in-order contract that is exactly-once
  * semantics. A genuinely late NEW event below the watermark would be
  * dropped too (documented limit: an order-sensitive statistic cannot
  * rewind a frozen decision without unbounded history).
  */
object SprtStream extends Serializable {

  /** q227's test: H0 rate 0.2 vs H1 rate 0.3, α = β = 0.05 — LLR
    * increments and boundaries in exact 1e-9 units (the same literals
    * [[graft.ops.Eval.sprtBoundary]] derives with math.rint). */
  val L1: Long = 405465108L   // round9(ln(0.3/0.2)) · 1e9
  val L0: Long = -133531393L  // round9(ln(0.7/0.8)) · 1e9
  val UpperA: Long = 2944438979L  // round9(ln(0.95/0.05)) · 1e9
  val LowerB: Long = -2944438979L

  case class Obs(key: String, tsUs: Long, tie: Long, conv: Int)

  case class SprtState(llrNanos: Long, seen: Long, wmTsUs: Long,
                       wmTie: Long, decidedN: Long, decidedAtUs: Long,
                       decision: String)

  /** Per-batch emission: the key's current walk position and verdict
    * (decision null while the walk is still between the boundaries). */
  case class SprtUpdate(key: String, n: Long, n_seen: Long,
                        decidedAtUs: Option[Long], decision: Option[String])

  def sprtStream(rows: DataFrame): Dataset[SprtUpdate] = {
    val spark = rows.sparkSession
    import spark.implicits._

    def update(key: String, it: Iterator[Obs],
               state: GroupState[SprtState]): SprtUpdate = {
      val st = state.getOption
        .getOrElse(SprtState(0L, 0L, Long.MinValue, Long.MinValue,
          0L, 0L, null))
      var (llr, seen) = (st.llrNanos, st.seen)
      var (wmTs, wmTie) = (st.wmTsUs, st.wmTie)
      var (decN, decAt, dec) = (st.decidedN, st.decidedAtUs, st.decision)
      val fresh = it.toVector
        .filter(o => o.tsUs > wmTs || (o.tsUs == wmTs && o.tie > wmTie))
        .sortBy(o => (o.tsUs, o.tie))
        // same-batch replay dedup on the (ts, tie) identity
        .distinctBy(o => (o.tsUs, o.tie))
      fresh.foreach { o =>
        llr += (if (o.conv == 1) L1 else L0)
        seen += 1
        wmTs = o.tsUs; wmTie = o.tie
        if (dec == null && (llr >= UpperA || llr <= LowerB)) {
          decN = seen; decAt = o.tsUs
          dec = if (llr >= UpperA) "h1" else "h0"
        }
      }
      state.update(SprtState(llr, seen, wmTs, wmTie, decN, decAt, dec))
      SprtUpdate(key, seen, if (dec == null) seen else decN,
        if (dec == null) None else Some(decAt), Option(dec))
    }

    rows.select(col("key"), col("tsUs"), col("tie"), col("conv"))
      .as[Obs]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch twin for parity checks (same literals via p0 = 0.2,
    * p1 = 0.3). */
  def sprtBatch(rows: DataFrame): DataFrame =
    graft.ops.Eval.sprtBoundary(
      rows.select(col("key"), col("tsUs"), col("tie"), col("conv")),
      Seq("key"), "tsUs", "tie", "conv", p0 = 0.2, p1 = 0.3)
}
