package graft.tools

import org.apache.spark.sql.functions._

/** Saturation measurement for the substring tier's repeated-window
  * prefilter: 30-bit vs wide (two-plane, ≈2^60) window-hash keys under
  * the `count > 1` frequency gate that feeds
  * [[graft.ops.NearDup.repeatedSpans]] / [[graft.ops.NearDup.exciseSpans]].
  *
  *   runMain graft.tools.GateSelectivity [nDocs]
  *
  * Synthesizes an nDocs corpus with NO planted duplicates (the
  * ExciseBench/CorpusBench doc recipe: hash-derived 40-word docs over an
  * n/100-word vocabulary — the 8-gram space is vocab^8, so genuine
  * cross-doc window repeats are essentially impossible). Every window the
  * gate passes is therefore a FALSE positive: pure hash-space saturation.
  * Prints, for both key widths, the gated window count and gate
  * selectivity, plus the birthday-bound expectation — the measurement
  * behind widening the prefilter (a 30-bit space at 180M windows already
  * passes millions of windows that share nothing; the wide key passes
  * ~n²/2^60.8 ≈ 0). */
object GateSelectivity {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000000)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    val vocabSize = math.max(1000, n / 100)
    def word(i: Int) = format_string("w%05x",
      pmod(hash(col("doc_id"), lit(i)), lit(vocabSize)))
    val docs = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(word): _*).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def gated(fn: String): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val wins = docs
        .select(col("doc_id"),
          graft.ops.TextOps.tokens(col("text")).as("__t"))
        .select(col("doc_id"),
          posexplode(call_function(fn, col("__t"), lit(8)))
            .as(Seq("pos", "h")))
      val row = wins.groupBy(col("h"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("total"),
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
            .as("gatedWins"))
        .head()
      (row.getLong(0), row.getLong(1), (System.nanoTime() - t0) / 1e9)
    }

    val (tot30, gate30, sec30) = gated("shingle_hashes")
    val (totW, gateW, secW) = gated("shingle_hashes_wide")
    require(tot30 == totW, s"window streams diverge: $tot30 vs $totW")
    // birthday expectation: E[windows in a >1 bucket] ≈ m·(1 − e^(−m/S))
    def expect(space: Double) =
      tot30.toDouble * (1.0 - math.exp(-tot30.toDouble / space))
    println(
      s"""{"gate_selectivity":{"docs":$n,"windows":$tot30,""" +
      f""""gate30_windows":$gate30,"gate30_frac":${
        gate30.toDouble / tot30}%.6f,"gate30_expected":${
        expect(1000000007.0)}%.0f,"sec30":$sec30%.1f,""" +
      f""""gateWide_windows":$gateW,"gateWide_frac":${
        gateW.toDouble / tot30}%.8f,"gateWide_expected":${
        expect(1000000007.0 * 998244353.0)}%.2f,"secWide":$secW%.1f}}""")
    spark.stop()
  }
}
