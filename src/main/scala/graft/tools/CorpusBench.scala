package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.CorpusPipeline

/** Scale benchmark of the full training-corpus pipeline
  * (quality → exact dedup → near-dedup → stratified sample) on a
  * synthesized multilingual corpus with planted duplicates:
  *
  *   runMain graft.tools.CorpusBench [nDocs]
  */
object CorpusBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = graft.core.Sessions.local()

    // vocabulary grows with corpus size (real text's does too): a fixed
    // tiny vocab makes every doc share most 3-grams, so LSH buckets
    // degenerate into corpus-sized near-cliques and the candidate join
    // goes quadratic — a property of the SYNTHETIC corpus, not the
    // pipeline. ~1 word per 100 docs keeps shingle diversity realistic.
    val vocabSize = math.max(1000, n / 100)
    def word(i: Int) = format_string("w%05x",
      pmod(hash(col("id"), lit(i)), lit(vocabSize)))
    val langs = Seq("en", "en", "en", "de", "es", "fr", "zh") // en-dominant
    val langArr = array(langs.map(lit): _*)
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(word): _*).as("text"),
      element_at(langArr,
        (pmod(hash(col("id"), lit(99)), lit(langs.size)) + 1).cast("int"))
        .as("lang"))
    // plant exact + near duplicates for every 100th doc, and junk docs
    // the quality filter must drop
    val exactDups = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + n).as("doc_id"), col("text"), col("lang"))
    val nearDups = base.filter(col("doc_id") % 100 === 50)
      .select((col("doc_id") + 2L * n).as("doc_id"),
        concat(lit("changed "), substring_index(col("text"), " ", 39))
          .as("text"), col("lang"))
    val junk = spark.range(n / 50).select(
      (col("id") + 3L * n).as("doc_id"), lit("!!! ??? ..").as("text"),
      lit("en").as("lang"))
    val docs = base.unionByName(exactDups).unionByName(nearDups)
      .unionByName(junk)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()

    val t0 = System.nanoTime()
    val (result, stats) = CorpusPipeline.run(docs,
      CorpusPipeline.Config(jaccardMin = 0.5,
        sampleFractions = Map("en" -> 0.5)))
    val secs = (System.nanoTime() - t0) / 1e9
    val enFrac = result.filter(col("lang") === "en").count().toDouble /
      stats.output
    println(f"""{"corpus_bench": {"docs": $total, "secs": $secs%.2f, """ +
      f""""docs_per_sec": ${(total / secs).toLong}, "input": ${stats.input}, """ +
      f""""after_quality": ${stats.afterQuality}, "after_exact": ${stats.afterExact}, """ +
      f""""after_neardup": ${stats.afterNearDup}, "output": ${stats.output}, """ +
      f""""en_frac_out": $enFrac%.3f}}""")
    spark.stop()
  }
}
