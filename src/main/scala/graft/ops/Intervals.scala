package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval operators: era building (merge overlapping/adjacent intervals
  * per key with a persistence gap) and banded range joins.
  *
  * Era building is the OMOP CDM "era" semantics (drug_era/condition_era:
  * merge exposures whose gaps are within a persistence window) — the
  * reference stops at observation_period min/max sweeps
  * (sql/etl/create_observation_period_v2.sql:46-55); eras generalize that
  * to gap-tolerant islands. Both operators are single-shuffle,
  * whole-stage-codegen shapes: a window cumulative max for islands, an
  * explode+equi-join for the range join — never a nested-loop theta-join,
  * which is what Spark would plan for a naive range predicate and what
  * dies first at 100 TB.
  */
object Intervals {

  /** Gaps-and-islands merge: coalesce intervals per key whose start is
    * within `gap` of the running max end of earlier intervals. One shuffle
    * (by the keys), one sort (by start, end), all codegen.
    *
    * Output: keys, era_start (min start), era_end (max end), n_merged.
    *
    * @param gap tolerance added to the running end when testing adjacency
    *   (e.g. `expr("INTERVAL 30 DAYS")` for drug-era persistence windows,
    *   `lit(0)` cast to the interval/numeric type of the columns for
    *   strict overlap). Works for timestamp, date, and numeric intervals
    *   alike — anything `+` and `>=` support. */
  def mergeIntervals(df: DataFrame, keyCols: Seq[Column],
                     startCol: Column, endCol: Column,
                     gap: Column): DataFrame =
    assignIslands(df, keyCols, startCol, endCol, gap)
      .groupBy(keyCols :+ col("__island"): _*)
      .agg(min(startCol).as("era_start"), max(endCol).as("era_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")

  /** The row-level half of [[mergeIntervals]]: tag every row with the id
    * (`__island`, 1-based per key) of the gap-tolerant island it belongs
    * to, without aggregating. Lets callers run further same-partitioning
    * analytics inside each island (e.g. covered-day sums for OMOP
    * gap_days) — windows over (keys :+ __island) reuse the (keys) hash
    * partitioning, so no second exchange. */
  def assignIslands(df: DataFrame, keyCols: Seq[Column],
                    startCol: Column, endCol: Column, gap: Column,
                    outCol: String = "__island"): DataFrame = {
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(startCol.asc, endCol.asc)
    // running max end over STRICTLY EARLIER rows; null for the first row
    // of each key → always a new island
    val prevMaxEnd = max(endCol)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(prevMaxEnd.isNotNull &&
      prevMaxEnd + gap >= startCol, 0).otherwise(1)
    val islandId = sum(newIsland)
      .over(w.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn(outCol, islandId)
  }

  /** Banded range join: pair left rows with right rows of the same key
    * whose `rightTs` lies in [leftTs + lowerSec, leftTs + upperSec].
    *
    * Scale shape: rather than the O(|L|·|R|) broadcast-nested-loop Spark
    * plans for a raw range predicate, each right row is assigned to a
    * fixed-width time band (one row), and each left row explodes to the
    * few bands its window can touch; the join is then a plain equi hash
    * join on (key, band) with the exact range check as a post-filter.
    * Shuffle volume: |L|·ceil(window/band)+|R| rows, hashed — skew is
    * bounded by rows-per-(key, band), not by key cardinality.
    *
    * Band width defaults to the window span, so left explodes to ≤ 2
    * bands. Each qualifying (l, r) pair appears exactly once (the right
    * row's band is unique). */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      lowerSec: Long, upperSec: Long,
                      bandSec: Option[Long] = None): DataFrame = {
    require(upperSec >= lowerSec, s"empty window [$lowerSec, $upperSec]")
    require(leftTs != rightTs,
      "leftTs and rightTs must have distinct names (rename one side)")
    val width = bandSec.getOrElse((upperSec - lowerSec).max(1L))
    def bandOf(ts: Column, offSec: Long): Column =
      floor((unix_timestamp(ts) + offSec) / width)
    val r = right.withColumn("__band", bandOf(col(rightTs), 0))
    val l = left.withColumn("__band",
      explode(sequence(bandOf(col(leftTs), lowerSec),
        bandOf(col(leftTs), upperSec))))
    // exact check at full µs precision (banding truncates to seconds,
    // which can only widen the candidate set, never lose a match)
    val delta = unix_micros(col(rightTs)) - unix_micros(col(leftTs))
    l.join(r, keys :+ "__band")
      .filter(delta >= lowerSec * 1000000L && delta <= upperSec * 1000000L)
      .drop("__band")
  }

  /** Pro-rata calendar allocation: spread each [start, end] interval's
    * value across the MONTHS it touches, weighted by overlapping days —
    * the accrual/amortization shape (contract revenue per month, plan
    * coverage per period, capacity per billing cycle) that a plain
    * date_trunc GROUP BY gets wrong the moment an interval crosses a
    * month boundary. Inclusive day semantics on both ends.
    *
    * Per-row expansion via `sequence(trunc start, trunc end, 1 month)`
    * + explode — scan-side, shuffle-free, bounded by interval length
    * (≤ span/28 + 1 rows per input); at 100 TB the expansion is the
    * flat per-row cost, and the only shuffle is whatever aggregation
    * the caller runs on the result. frac is a fixed-order division;
    * the allocated value is 9-rounded into DECIMAL so downstream sums
    * are partitioning-invariant and the accounting identity
    * Σ alloc ≈ value holds to 1e-9 per interval (exactly the rounding
    * budget, spec-pinned).
    *
    * Output: keyCols + (month, overlap_days, span_days, frac 6-rounded,
    * alloc DECIMAL(18,9)). */
  def allocateMonthly(df: DataFrame, keyCols: Seq[Column],
                      startCol: Column, endCol: Column,
                      valueCol: Column): DataFrame = {
    val start = startCol.cast("date")
    val end = endCol.cast("date")
    val span = (datediff(end, start) + 1).as("span_days")
    val month = explode(sequence(trunc(start, "MM"), trunc(end, "MM"),
      expr("INTERVAL 1 MONTH"))).as("month")
    val base = df.filter(start <= end)
      .select(keyCols ++ Seq(start.as("__s"), end.as("__e"),
        valueCol.cast("double").as("__v"), span, month): _*)
    val ovl = (datediff(least(col("__e"), last_day(col("month"))),
      greatest(col("__s"), col("month"))) + 1).as("overlap_days")
    val frac = col("overlap_days").cast("double") /
      col("span_days").cast("double")
    base.withColumn("overlap_days", ovl)
      .select(keyCols ++ Seq(col("month"), col("overlap_days"),
        col("span_days"), round(frac, 6).as("frac"),
        round(col("__v") * frac, 9).cast("decimal(18,9)")
          .as("alloc")): _*)
  }
}
