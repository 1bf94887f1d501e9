package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distribution statistics over numeric columns — the profiling
  * tier a corpus pipeline runs before choosing filters (e.g. "what does
  * the length distribution look like" before setting quality cutoffs).
  */
object Stats {

  /** Bin index for a fixed-width histogram over [lo, hi): floor((x-lo)/w)
    * clamped into [0, nbins-1] so out-of-range FINITE values land in the
    * edge bins (width_bucket-style, without the unbounded overflow
    * buckets). Callers must pre-filter non-finite values —
    * floor(NaN) would silently land in bin 0 ([[histogram]] does). Pure
    * arithmetic — stays in codegen, identical IEEE math on any engine,
    * so the oracle can reproduce it bit-for-bit. */
  def binIndex(c: Column, lo: Double, hi: Double, nbins: Int): Column = {
    require(nbins >= 1 && hi > lo, s"bad histogram spec [$lo,$hi)/$nbins")
    val width = (hi - lo) / nbins
    least(lit(nbins - 1L), greatest(lit(0L), floor((c - lo) / width)))
  }

  /** True for non-null finite doubles — the rows a histogram can bin. */
  def isFinite(c: Column): Column =
    c.isNotNull && !isnan(c) &&
      c =!= Double.PositiveInfinity && c =!= Double.NegativeInfinity

  /** Fixed-width histogram: one hash-aggregate over ≤nbins groups (the
    * shuffle carries nbins rows per partition — nothing scales with data
    * size). Empty bins are omitted; null/NaN/±Inf rows are excluded (a
    * NaN would otherwise silently inflate bin 0 — count non-finite rows
    * separately if they matter). Output: (bin, bin_lo, bin_hi, n). */
  def histogram(df: DataFrame, valueCol: Column,
                lo: Double, hi: Double, nbins: Int): DataFrame = {
    val width = (hi - lo) / nbins
    df.filter(isFinite(valueCol))
      .groupBy(binIndex(valueCol, lo, hi, nbins).as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * width)
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * width)
  }
}
