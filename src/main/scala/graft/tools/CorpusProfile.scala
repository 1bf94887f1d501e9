package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Sketches, Stats, TextOps}

/** CLI for the corpus profiling tier — the report a pipeline operator
  * reads BEFORE setting quality cutoffs and dedup thresholds:
  *
  *   runMain graft.tools.CorpusProfile <docsParquetDirOrSfDir> <outDir>
  *
  * One pass family over the corpus: language mix, token-count histogram,
  * heavy-hitter tokens (two-pass Misra–Gries — exact), top bigrams,
  * posting stats for the heavy tokens, and exact length moments. Each
  * section writes parquet under <outDir>/ and prints a one-line JSON
  * summary. Every operator here is the oracle-gated one the query
  * surface exposes (q69/q70/q71/q74/q81 machinery). */
object CorpusProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusProfile <docsParquet|sfDir> <outDir>")
    val spark = graft.core.Sessions.local()
    run(spark, args(0), args(1))
    spark.stop()
  }

  /** The profiling run itself, session-agnostic (specs drive it on the
    * shared test session, which must NOT be stopped). */
  def run(spark: org.apache.spark.sql.SparkSession,
          in: String, out: String): Unit = {
    val docs =
      (if (in.endsWith(".parquet")) spark.read.parquet(in)
       else graft.core.Tables.documents(spark, in))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t0 = System.nanoTime()

    val langMix = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"),
      sum(length(col("text"))).as("n_chars"))
    langMix.write.mode("overwrite").parquet(s"$out/lang_mix.parquet")

    val lenHist = Stats.histogram(
      docs.select(TextOps.tokenCount(col("text")).cast("double").as("v")),
      col("v"), lo = 0.0, hi = 512.0, nbins = 32)
    lenHist.write.mode("overwrite").parquet(s"$out/len_hist.parquet")

    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
    // persisted: the exact recount is a full corpus aggregation and this
    // ≤k-row frame is referenced three times (write, semi join, count)
    val heavy = Sketches.frequentItems(toks, "token", minFrac = 0.01, k = 256)
      .withColumnRenamed("item", "token")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    heavy.write.mode("overwrite").parquet(s"$out/heavy_tokens.parquet")

    val bigrams = docs.select(TextOps.tokens(col("text")).as("t"))
      .select(explode(TextOps.bigramsFromTokens(col("t"))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc).limit(100)
    bigrams.write.mode("overwrite").parquet(s"$out/top_bigrams.parquet")

    val postings = TextOps.invertedPostings(docs, "doc_id", "text", 5)
      .join(heavy.select(col("token")), Seq("token"), "left_semi")
    postings.write.mode("overwrite").parquet(s"$out/heavy_postings.parquet")

    val nDocs = docs.count()
    val nHeavy = heavy.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"docs":$nDocs,"heavy_tokens":$nHeavy,""" +
      s""""sections":["lang_mix","len_hist","heavy_tokens",""" +
      s""""top_bigrams","heavy_postings"],"sec":$sec}""")
    heavy.unpersist()
    docs.unpersist()
  }
}
