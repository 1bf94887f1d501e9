package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate sketches — the scale tier of the exact aggregates the
  * engine already ships (q44 exact distinct counts, q12 exact
  * percentiles). At 100 TB an exact COUNT(DISTINCT) shuffles every
  * distinct value; an HLL sketch shuffles a fixed few-KB buffer per
  * group×partition, and approx percentiles likewise. Both built-ins are
  * mergeable partial aggregates (map-side combine for free) — the exact
  * forms remain the oracle-checkable tier, these are the ones a 1000-
  * executor job actually runs first.
  */
object Sketches {

  /** HLL++ distinct counts per group; `rsd` = target relative standard
    * deviation (Spark default 0.05). */
  def distinctCounts(df: DataFrame, groupCols: Seq[Column],
                     valueCol: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"))

  /** Approximate percentiles per group; `accuracy` trades memory for
    * error (err ≤ 1/accuracy of rank). */
  def quantiles(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
                percentiles: Seq[Double],
                accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile_approx(valueCol,
        array(percentiles.map(lit): _*), lit(accuracy)).as("approx_pcts"))

  /** Explicit bloom-prune for a selective join: build a bloom filter over
    * the dim side's keys (driver-held, ~`fpp`-sized bits), then filter the
    * fact side BEFORE its shuffle. False positives only — no fact row
    * that joins is ever dropped, so `prunedFact.join(dim)` is exactly
    * `fact.join(dim)` with less shuffle I/O.
    *
    * Complements the automatic runtime bloom filter (enabled in
    * [[graft.core.Sessions]]) for cases the optimizer won't inject —
    * e.g. the dim side is an arbitrary DataFrame, not a filtered scan.
    * The membership test is a deserialized function call (not codegen);
    * worth it only when selectivity is high — measure. */
  def bloomPrune(fact: DataFrame, factKey: Column, dimKeys: DataFrame,
                 expectedDim: Long, fpp: Double = 0.01): DataFrame = {
    val keyName = dimKeys.columns.head
    val bloom = dimKeys.stat.bloomFilter(keyName, expectedDim, fpp)
    val spark = fact.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    // type-matched membership probe: a long key through the string path
    // (or vice versa) would hash differently and break the no-false-
    // negative guarantee; string keys also must never be ANSI-cast to long
    val isString = fact.select(factKey).schema.head.dataType ==
      org.apache.spark.sql.types.StringType
    if (isString) {
      val mc = udf((k: String) => k != null && bloomBc.value.mightContain(k))
      fact.filter(mc(factKey))
    } else {
      val mc = udf((k: java.lang.Long) =>
        k != null && bloomBc.value.mightContainLong(k))
      fact.filter(mc(factKey.cast("long")))
    }
  }

  /** Misra–Gries heavy-hitter sketch state: bounded candidate counters
    * plus the total number of items folded in. */
  case class MgState(counts: Map[String, Long], total: Long)

  /** Misra–Gries frequent-items sketch with capacity `k`: one pass,
    * O(k) memory per partition, mergeable (partial aggregation applies).
    * Guarantee: every item with true frequency > total/(k+1) is present
    * in the final candidate set — no false negatives above that bar;
    * counts are under-estimates, so callers recount exactly (see
    * [[frequentTokens]]). */
  class MisraGries(k: Int)
      extends Aggregator[String, MgState, MgState] with Serializable {
    require(k >= 1, s"sketch capacity must be >= 1, got $k")

    def zero: MgState = MgState(Map.empty, 0L)

    def reduce(b: MgState, item: String): MgState = {
      val c = b.counts
      val nc = c.get(item) match {
        case Some(n) => c.updated(item, n + 1)
        case None if c.size < k => c.updated(item, 1L)
        // full and item absent: decrement every counter (dropping zeros)
        case None => c.collect { case (t, n) if n > 1 => t -> (n - 1) }
      }
      MgState(nc, b.total + 1)
    }

    def merge(a: MgState, b: MgState): MgState = {
      val summed = b.counts.foldLeft(a.counts) { case (m, (t, n)) =>
        m.updated(t, m.getOrElse(t, 0L) + n)
      }
      val trimmed =
        if (summed.size <= k) summed
        else {
          // subtract the (k+1)-th largest count from all (the merge-side
          // analogue of the decrement step), drop non-positive
          val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
          summed.collect { case (t, n) if n > cut => t -> (n - cut) }
        }
      MgState(trimmed, a.total + b.total)
    }

    def finish(r: MgState): MgState = r
    def bufferEncoder: Encoder[MgState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[MgState] = bufferEncoder
  }

  /** Exact frequent items at scale, classic two-pass plan:
    * pass 1 folds the whole column into one O(k) Misra–Gries sketch
    * (map-side partial merge — the shuffle carries one small Map per
    * partition, never per-item rows); pass 2 recounts ONLY the ≤k
    * candidates exactly and keeps those at or above `minFrac` of the
    * total. Because the sketch has no false negatives above total/(k+1)
    * and the recount is exact, the result equals the naive
    * group-everything-and-filter plan — without ever shuffling the long
    * tail. Requires minFrac > 1/(k+1) for that guarantee.
    *
    * Output: (item, n, frac) for items with n >= ceil(total * minFrac). */
  def frequentItems(items: DataFrame, itemCol: String,
                    minFrac: Double, k: Int): DataFrame = {
    require(minFrac > 1.0 / (k + 1),
      s"minFrac=$minFrac below sketch guarantee 1/(k+1)=${1.0 / (k + 1)}; " +
        "raise k or minFrac")
    val spark = items.sparkSession
    import spark.implicits._
    val col0 = col(itemCol)
    val sketch = items.select(col0.as[String](Encoders.STRING))
      .select(new MisraGries(k).toColumn).head()
    val threshold = math.ceil(sketch.total * minFrac).toLong
    val candidates = sketch.counts.keys.toSeq
    items.filter(col0.isin(candidates: _*))
      .groupBy(col0.as("item"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .withColumn("frac",
        round(col("n").cast("double") / lit(sketch.total.toDouble), 6))
  }
}
