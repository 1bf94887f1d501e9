package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the credit-assignment readout on
  * top of the funnel family ([[graft.queries.Relational]] q119 measures
  * WHETHER stages convert; this decides which touch GETS PAID for each
  * conversion): first-touch, last-touch, and linear credit per touch
  * event within a lookback window.
  *
  * Scale shape: the touch↔conversion pairing is a user-keyed equi-join
  * with a time-band predicate — at 100 TB the join shuffles on user (the
  * partitioning every per-user analysis shares) and per-user slivers are
  * activity-bounded; the credit windows run inside (user, conversion)
  * partitions of that sliver. Nothing leaves the user partition until
  * the final channel-domain rollup, whose shuffle is |channels| rows per
  * partition. The banded-pair volume is ∝ per-user touches×conversions
  * inside the window, the same density² bound as the q53/q201 range
  * join — and like there, the window bound IS the cost control.
  *
  * Determinism: first/last pick by (ts, event id) — a TOTAL order, so
  * simultaneous touches can't flip credit between runs or engines.
  * Linear credit 1/n is 9-rounded per touch then decimal-summed, so
  * channel rollups are partitioning-invariant.
  */
object Attribution {

  /** Per-(conversion, touch) credit rows under the three standard
    * models. `touches`/`conversions` select the two event roles from
    * the same log; both need (userCol, tsCol, idCol) plus a
    * `channelCol` on the touch side. Returns one row per attributed
    * touch: user, conv_id, touch_id, channel, n_touches,
    * credit_first, credit_last, credit_linear (9-rounded decimal). */
  def touchCredit(touches: DataFrame, conversions: DataFrame,
                  userCol: String, tsCol: String, idCol: String,
                  channelCol: String, windowSeconds: Long): DataFrame = {
    val t = touches.select(col(userCol).as("__u"),
      col(tsCol).as("__tts"), col(idCol).as("__tid"),
      col(channelCol).as("channel"))
    val c = conversions.select(col(userCol).as("__u"),
      col(tsCol).as("__cts"), col(idCol).as("conv_id"))
    val paired = c.join(t, Seq("__u"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $windowSeconds SECOND"))
    val w = Window.partitionBy(col("__u"), col("conv_id"))
    val wAsc = w.orderBy(col("__tts").asc, col("__tid").asc)
    val wDesc = w.orderBy(col("__tts").desc, col("__tid").desc)
    paired
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("credit_first",
        (row_number().over(wAsc) === 1).cast("int"))
      .withColumn("credit_last",
        (row_number().over(wDesc) === 1).cast("int"))
      .withColumn("credit_linear",
        round(lit(1.0) / col("n_touches"), 9).cast("decimal(18,9)"))
      .select(col("__u").as(userCol), col("conv_id"),
        col("__tid").as("touch_id"), col("channel"), col("n_touches"),
        col("credit_first"), col("credit_last"), col("credit_linear"))
  }

  /** Channel-level rollup of [[touchCredit]]: total credit per channel
    * under each model (first/last credits are exact longs; linear is an
    * exact decimal sum — all three columns total to the conversion
    * count, the accounting identity the spec pins). */
  def channelCredit(credits: DataFrame): DataFrame =
    credits.groupBy(col("channel")).agg(
      sum(col("credit_first")).cast("long").as("first_touch"),
      sum(col("credit_last")).cast("long").as("last_touch"),
      round(sum(col("credit_linear")), 6).cast("double")
        .as("linear_touch"),
      count(lit(1)).as("n_attributed"))

  /** Top-k behavioral paths: per (user, sessionKey) the ORDERED step
    * sequence rendered as a `a>b>c` string, counted across sessions,
    * top k by frequency — the journey-analysis readout behind every
    * "what do users do before X" question (the pairwise
    * [[graft.ops.Eval.transitionMatrix]] loses order beyond length 2;
    * paths keep it).
    *
    * Scale shape: one hash aggregation collects each session's steps —
    * per-group state is session-length-bounded (the [[graft.ops
    * .TimeSeries.holtLinear]] posture: bounded per-entity runs), and
    * `array_sort` over (ts, tie, step) structs makes the order
    * deterministic regardless of collect order — then a path-domain
    * count and a TakeOrdered top-k (count desc, path asc: total
    * order). The shuffle carries (session, step) rows once and path
    * strings once; nothing is ever globally sorted. */
  def topPaths(df: DataFrame, sessionCols: Seq[Column], tsCol: String,
               tieCol: String, stepCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val path = array_join(
      transform(
        array_sort(collect_list(struct(col(tsCol).as("t"),
          col(tieCol).as("i"), col(stepCol).as("s")))),
        x => x.getField("s")),
      ">")
    df.groupBy(sessionCols: _*)
      .agg(path.as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }
}
