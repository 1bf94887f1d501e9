package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
