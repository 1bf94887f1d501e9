package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Sketches

/** Streaming KMV distinct sketch: a running per-key distinct-count
  * estimate over an unbounded hash stream — "how many distinct tokens /
  * urls / users has each source produced so far", maintained at ingest.
  *
  * State per key is the bottom-k distinct hash set (≤ k longs, constant)
  * — never the values themselves. Because the sketch is a SET fold,
  * at-least-once redelivery is harmless: re-adding a hash that is
  * already in (or above) the bottom-k cannot change it, so replays can
  * re-emit an update row but never corrupt the estimate (spec-pinned,
  * same posture as the dedup/quota streams). After any prefix of the
  * stream, the state equals the batch [[Sketches.Kmv]] sketch of that
  * prefix exactly — streaming and batch tiers are the same estimator,
  * not two approximations.
  */
object SketchStream {

  /** (key, hash) input row. */
  case class KeyedHash(key: String, h: Long)

  /** Per-batch update: the key's current sketch readout. */
  case class KmvUpdate(key: String, kth_hash: Option[Long], n_kept: Int,
                       est_distinct: Long)

  /** Update-mode running estimate; `k` is the sketch capacity. */
  def kmvStream(rows: DataFrame, k: Int): Dataset[KmvUpdate] = {
    require(k >= 2, s"sketch capacity must be >= 2, got $k")
    val spark = rows.sparkSession
    import spark.implicits._

    def update(key: String, it: Iterator[KeyedHash],
               state: GroupState[Array[Long]]): KmvUpdate = {
      val set = new java.util.TreeSet[java.lang.Long]()
      state.getOption.foreach(_.foreach(h => set.add(h)))
      it.foreach { r =>
        if (set.size < k) set.add(r.h)
        else if (r.h < set.last.longValue) {
          if (set.add(r.h)) set.pollLast()
        }
      }
      val arr = new Array[Long](set.size)
      val iter = set.iterator(); var i = 0
      while (iter.hasNext) { arr(i) = iter.next().longValue; i += 1 }
      state.update(arr)
      val s = Sketches.kmvEstimate(set, k)
      KmvUpdate(key, s.kth_hash, s.n_kept, s.est_distinct)
    }

    rows.select(col("key"), col("h")).as[KeyedHash]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch twin for parity checks. */
  def kmvBatch(rows: DataFrame, k: Int): DataFrame =
    Sketches.kmvDistinct(rows, "key", col("h"), k)

  /** Streaming count–min sketch: the running (row, bucket) cell counts
    * of [[Sketches.countMinSketch]] maintained as a plain streaming
    * aggregation — CMS cells are counters, so the built-in stateful
    * agg IS the right state machine (state = depth·width longs total,
    * independent of stream length; update-mode emits refreshed cells
    * per batch). After any exactly-once prefix the cell table equals
    * the batch sketch of that prefix exactly, so estimates probed from
    * it inherit the batch one-sided bound. Input: a `key` column. */
  def cmsStream(rows: DataFrame, depth: Int = 4,
                width: Int = 64): DataFrame =
    rows.select(col("key"),
        explode(array((0 until depth).map(lit): _*)).as("row"))
      .groupBy(col("row"),
        Sketches.cmsBucket(col("key"), col("row"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Batch twin for the CMS parity spec. */
  def cmsBatch(rows: DataFrame, depth: Int = 4, width: Int = 64): DataFrame =
    Sketches.countMinSketch(rows, col("key"), depth, width)
}
