package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of [[graft.ops.TimeSeries.ewmaTrailing]]: the running
  * EWMA "current level" per key, updated as events arrive — the metric
  * smoother maintained at ingest instead of recomputed per query.
  *
  * State per key is the last ≤ `WindowK` observations keyed by
  * (ts, tie) plus a seen-counter — constant-size, never the stream.
  * Because the trailing-window EWMA is a pure function of the latest 16
  * observations, the stream can absorb OUT-OF-ORDER arrivals exactly
  * (the buffer re-sorts on merge), where an infinite-recursion EWMA
  * would have to replay history. The buffer dedupes on (ts, tie), so
  * at-least-once redelivery re-emits an update row but can never skew
  * the level (same posture as the dedup/quota/KMV streams); only the
  * diagnostic n_seen counter can overcount on replay — documented, not
  * load-bearing. After any exactly-once prefix, the emitted level
  * equals the batch operator on that prefix bit-for-bit: both compute
  * the identical exact-decimal weighted sum ([[ewmaOf]] mirrors the
  * plan's DECIMAL(14,4) value cast and 18-digit weight literals).
  */
object LevelStream extends Serializable {

  val WindowK = 16
  val Alpha = BigDecimal("0.25")

  /** (key, tsUs, tie, value) input row — ts pre-converted to epoch µs. */
  case class Obs(key: Long, tsUs: Long, tie: Long, value: Double)

  /** Per-key buffer: parallel arrays sorted by (tsUs, tie), ≤ WindowK
    * entries, plus the total-seen counter. */
  case class LevelState(tsUs: Array[Long], tie: Array[Long],
                        v: Array[Double], seen: Long)

  /** Per-batch update: the key's refreshed level. */
  case class LevelUpdate(key: Long, n_seen: Long, ewma: Double)

  /** Exact-decimal EWMA of the (already time-sorted) window — the same
    * arithmetic the batch plan runs: values cast to DECIMAL(14,4)
    * half-up, weights from [[graft.ops.TimeSeries.ewmaWeights]], sum
    * exact, one final 6-digit rounding. */
  def ewmaOf(sortedValues: Seq[Double]): Double = {
    val m = sortedValues.length
    require(m >= 1 && m <= WindowK, s"window size out of range: $m")
    val ws = graft.ops.TimeSeries.ewmaWeights(Alpha, WindowK)
    val sum = sortedValues.reverseIterator.zipWithIndex.map {
      case (x, idx) =>
        val j = idx + 1 // 1 = newest
        val w = BigDecimal(if (j == m) ws(j - 1)._2 else ws(j - 1)._1)
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * w
    }.sum
    sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Update-mode running level stream. */
  def levelStream(rows: DataFrame): Dataset[LevelUpdate] = {
    val spark = rows.sparkSession
    import spark.implicits._

    def update(key: Long, it: Iterator[Obs],
               state: GroupState[LevelState]): LevelUpdate = {
      val prev = state.getOption
        .map(s => (s.tsUs, s.tie, s.v).zipped.toVector)
        .getOrElse(Vector.empty)
      val prevKeys = prev.map(o => (o._1, o._2)).toSet
      var added = 0L
      val fresh = it.toVector.filter { o =>
        val dup = prevKeys.contains((o.tsUs, o.tie))
        if (!dup) added += 1
        !dup
      }.map(o => (o.tsUs, o.tie, o.value))
        // in-batch dedup on (ts, tie) too — replays can arrive same-batch
        .groupBy(o => (o._1, o._2)).map(_._2.head).toVector
      val merged = (prev ++ fresh).sortBy(o => (o._1, o._2))
        .takeRight(WindowK)
      val seen = state.getOption.map(_.seen).getOrElse(0L) + added
      state.update(LevelState(merged.map(_._1).toArray,
        merged.map(_._2).toArray, merged.map(_._3).toArray, seen))
      LevelUpdate(key, seen, ewmaOf(merged.map(_._3)))
    }

    rows.select(col("key"), col("tsUs"), col("tie"), col("value"))
      .as[Obs]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch twin for parity checks (events-table column shape). */
  def levelBatch(rows: DataFrame): DataFrame =
    graft.ops.TimeSeries.ewmaTrailing(
      rows.select(col("key"), timestamp_micros(col("tsUs")).as("t"),
        col("tie"), col("value")),
      "key", "t", "tie", "value", Alpha, WindowK)
}
