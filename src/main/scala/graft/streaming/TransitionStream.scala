package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Eval.transitionMatrix]]: per-key
  * (state → next state) transition INCREMENTS as events arrive, via
  * `flatMapGroupsWithState`. Per-key state is one (ts, event_id, state)
  * triple — O(1), no buffered history — so state size is bounded by the
  * key cardinality alone.
  *
  * Contract: within each micro-batch the group's rows are sorted by
  * (ts, event_id) before folding, and the fold seeds from the key's
  * carried last event, so a stream split across any batch boundaries
  * emits EXACTLY the batch operator's transitions as long as batches
  * respect event-time order across batches (the same in-order-append
  * contract the rollup parity specs state; a late event that belongs
  * before the carried frontier would need a watermark + buffered
  * reorder, which this operator deliberately trades away for O(1)
  * state). Downstream, `SUM(n) GROUP BY from_state, to_state` over the
  * emitted increments reproduces the batch counts — increments are
  * additive, so at-least-once redelivery of an UNCHANGED batch re-emits
  * the same rows rather than corrupting a running total kept here. */
object TransitionStream {

  case class Step(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                  state: String)
  case class LastEvent(ts: Long, eventId: Long, state: String)
  case class Transition(user_id: Long, from_state: String,
                        to_state: String, n: Long)

  def transitionStream(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    def update(userId: Long, it: Iterator[Step],
               state: GroupState[LastEvent]): Iterator[Transition] = {
      val sorted = it.toSeq.sortBy(s => (s.ts.getTime, s.event_id))
      var last = state.getOption
      val counts = scala.collection.mutable.LinkedHashMap
        .empty[(String, String), Long]
      sorted.foreach { s =>
        last.foreach { l =>
          val k = (l.state, s.state)
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
        last = Some(LastEvent(s.ts.getTime, s.event_id, s.state))
      }
      last.foreach(state.update)
      counts.iterator.map { case ((f, t), n) =>
        Transition(userId, f, t, n)
      }
    }
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .as[Step]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
