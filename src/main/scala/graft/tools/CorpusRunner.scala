package graft.tools

import graft.ops.CorpusPipeline

/** CLI for the training-corpus pipeline:
  *
  *   runMain graft.tools.CorpusRunner <docsParquetDir> <outDir> \
  *     [enFraction] [--transitive]
  *
  * Reads a documents table (doc_id, text, lang, ...), runs
  * quality→exact-dedup→near-dedup→sample, writes the surviving rows as
  * parquet and prints one JSON stats line. `--transitive` switches the
  * near-dup survivor policy to connected-components clusters. */
object CorpusRunner {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusRunner <docsParquet> <outDir> [enFraction] [--transitive]")
    val (in, out) = (args(0), args(1))
    val flags = args.drop(2)
    val enFraction = flags.find(a => !a.startsWith("--"))
      .map(_.toDouble).getOrElse(1.0)
    val spark = graft.core.Sessions.local()
    val docs =
      if (in.endsWith(".parquet")) spark.read.parquet(in)
      else graft.core.Tables.documents(spark, in)
    val cfg = CorpusPipeline.Config(
      transitiveClusters = flags.contains("--transitive"),
      sampleFractions = if (enFraction < 1.0) Map("en" -> enFraction)
                        else Map.empty)
    val t0 = System.nanoTime()
    val (result, stats) = CorpusPipeline.run(docs, cfg)
    result.write.mode("overwrite").parquet(s"$out/corpus.parquet")
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"input":${stats.input},"after_quality":${stats.afterQuality},""" +
      s""""after_exact":${stats.afterExact},"after_neardup":${stats.afterNearDup},""" +
      s""""output":${stats.output},"sec":$sec}""")
    spark.stop()
  }
}
