package graft.analyze

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Drives the CorpusProfile CLI main end-to-end on the sf0.001 corpus
  * and checks each section materializes sensibly — the CLI is a product
  * surface, so its wiring (section list, schemas, the heavy-token semi
  * join) deserves a gate beyond the per-operator specs. */
class CorpusProfileSpec extends SparkSpecBase {

  test("CorpusProfile writes all five sections with coherent contents") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_profile_spec").toString
    graft.tools.CorpusProfile.run(spark, sf, out)
    val s2 = spark

    val lang = s2.read.parquet(s"$out/lang_mix.parquet")
    assert(lang.columns.toSeq == Seq("lang", "n_docs", "n_chars"))
    val nDocs = lang.agg(sum("n_docs")).head().getLong(0)
    assert(nDocs == s2.read.parquet(s"$sf/documents.parquet").count())

    val hist = s2.read.parquet(s"$out/len_hist.parquet")
    assert(hist.agg(sum("n")).head().getLong(0) <= nDocs)
    assert(hist.count() > 1) // token lengths actually spread over bins

    val heavy = s2.read.parquet(s"$out/heavy_tokens.parquet")
    assert(heavy.count() > 0 && heavy.count() <= 256)

    val bigrams = s2.read.parquet(s"$out/top_bigrams.parquet")
    assert(bigrams.count() <= 100 && bigrams.count() > 0)

    // postings are restricted to heavy tokens (the semi join contract)
    val postings = s2.read.parquet(s"$out/heavy_postings.parquet")
    assert(postings.join(heavy, Seq("token"), "left_anti").count() == 0)
    assert(postings.count() == heavy.count())
  }
}
