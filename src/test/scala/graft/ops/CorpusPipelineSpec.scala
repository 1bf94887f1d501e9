package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class CorpusPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("stages prune monotonically and keep a non-empty corpus") {
    val (result, stats) = CorpusPipeline.run(docs,
      CorpusPipeline.Config(minTokens = 5, jaccardMin = 0.8,
        sampleFractions = Map("en" -> 0.5)))
    assert(stats.input >= stats.afterQuality)
    assert(stats.afterQuality >= stats.afterExact)
    assert(stats.afterExact >= stats.afterNearDup)
    assert(stats.afterNearDup >= stats.output)
    assert(stats.output > 0)
    assert(result.count() == stats.output)
    // schema passes through unchanged
    assert(result.columns.toSet == docs.columns.toSet)
  }

  test("optional benchmark stage decontaminates before dedup") {
    val base = docs.limit(20)
    // benchmark = one corpus doc verbatim: that doc (and only it) shares
    // shingles and must drop; the stat records exactly one removal
    val bench = base.filter(col("doc_id") === base.select(min("doc_id"))
      .head().getLong(0))
    val (result, stats) = CorpusPipeline.run(base,
      CorpusPipeline.Config(minTokens = 0, maxPunctRatio = 1.0),
      benchmark = Some(bench))
    assert(stats.decontaminated == 1, s"$stats")
    val benchId = bench.select("doc_id").head().getLong(0)
    assert(!result.select("doc_id").as[Long].collect().contains(benchId))
    // without a benchmark the stat stays zero
    val (_, s2) = CorpusPipeline.run(base,
      CorpusPipeline.Config(minTokens = 0, maxPunctRatio = 1.0))
    assert(s2.decontaminated == 0)
  }

  test("decontamination uses the long n-gram window, not the LSH shingle") {
    // corpus doc shares the trigram "alpha bravo charlie" with the
    // benchmark but no 8-gram: at decontaminationN = 8 (default) it must
    // SURVIVE — coupling the stage to shingleN = 3 would gut any natural-
    // language corpus, where common trigrams are unavoidable
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india", "en",
        "t", 50L),
      (2L, "unrelated words entirely different content here now ok", "en",
        "t", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val bench = Seq(
      (100L, "xray yankee zulu alpha bravo charlie quebec romeo sierra",
        "en", "t", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (result, stats) = CorpusPipeline.run(corpus,
      CorpusPipeline.Config(minTokens = 0, maxPunctRatio = 1.0),
      benchmark = Some(bench))
    assert(stats.decontaminated == 0, s"$stats")
    assert(result.count() == 2)
    // at decontaminationN = 3 the trigram overlap does disqualify doc 1
    val (r3, s3) = CorpusPipeline.run(corpus,
      CorpusPipeline.Config(minTokens = 0, maxPunctRatio = 1.0,
        decontaminationN = 3),
      benchmark = Some(bench))
    assert(s3.decontaminated == 1, s"$s3")
    assert(r3.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("near-dup stage removes planted duplicates, keeps the smallest id") {
    val base = docs.limit(50)
    // plant: doc_id+100000 with identical text (exact dup), doc_id+200000
    // with one token appended (near dup)
    val exactDups = base.select((col("doc_id") + 100000).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))
    val nearDups = base.select((col("doc_id") + 200000).as("doc_id"),
      concat(col("text"), lit(" trailingtoken")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val corpus = base.unionByName(exactDups).unionByName(nearDups)
    val (result, stats) = CorpusPipeline.run(corpus,
      CorpusPipeline.Config(minTokens = 0, maxPunctRatio = 1.0,
        jaccardMin = 0.5))
    val ids = result.select("doc_id").as[Long].collect().toSet
    // all originals that passed quality survive; all planted ids are gone
    assert(ids.forall(_ < 100000), s"planted dup survived: ${ids.filter(_ >= 100000)}")
    assert(stats.afterExact == stats.afterQuality - 50) // exact dups dropped
    assert(stats.afterNearDup < stats.afterExact)       // near dups dropped
  }

  test("append drops increment rows duplicating the corpus or the batch") {
    import org.apache.spark.sql.functions._
    // deterministic id-range selections (limit() without order would
    // pick different rows on each plan reference)
    val existing = docs.filter(col("doc_id") < 40)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    // increment: exact dups of existing, near dups of existing,
    // an intra-batch dup pair, and fresh docs
    val exactOfExisting = existing.filter(col("doc_id") < 10)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val nearOfExisting = existing.filter(col("doc_id") < 10)
      .select((col("doc_id") + 600000).as("doc_id"),
        concat(col("text"), lit(" tailtoken")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val fresh = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .select((col("doc_id") + 700000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val batchDup = fresh.filter(col("doc_id") < 700105)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val incoming = exactOfExisting.unionByName(nearOfExisting)
      .unionByName(fresh).unionByName(batchDup).select(cols.map(col): _*)

    val (result, stats) = CorpusPipeline.append(
      existing.select(cols.map(col): _*), incoming,
      CorpusPipeline.Config(minTokens = 0, maxPunctRatio = 1.0,
        jaccardMin = 0.5))
    val ids = result.select("doc_id").as[Long].collect().toSet
    assert(stats.input == 45)
    // all exact/near dups of the corpus are gone
    assert(!ids.exists(id => id >= 500000 && id < 700000),
      s"corpus dup survived: ${ids.filter(id => id >= 500000 && id < 700000)}")
    // fresh docs survive once: 20 fresh, their 5 batch-dups dropped
    assert(ids.count(_ >= 700000) == 20, s"got ${ids.count(_ >= 700000)}")
    assert(ids.size == 20)
  }

  test("pipeline is deterministic across partitionings") {
    val cfg = CorpusPipeline.Config(sampleFractions = Map("en" -> 0.4))
    val a = CorpusPipeline.run(docs, cfg)._1
      .select("doc_id").as[Long].collect().toSet
    val b = CorpusPipeline.run(docs.repartition(13), cfg)._1
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("transitive clustering resolves chains greedy dedup keeps") {
    // doc 3 duplicates BOTH 1 and 2 (J = 3/4 each), but 1 vs 2 fall
    // below the threshold (J = 1/2): verified pairs (1,3),(2,3) form a
    // chain. Greedy drops only doc_b's → {1,2} survive; transitive
    // components keep one doc per cluster → {1}.
    val chain = Seq(
      (1L, "alpha bravo charlie", "en", "t", 19L),
      (2L, "bravo charlie delta", "en", "t", 19L),
      (3L, "alpha bravo charlie delta", "en", "t", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cfg = CorpusPipeline.Config(minTokens = 0, maxPunctRatio = 1.0,
      shingleN = 1, rowsPerBand = 1, jaccardMin = 0.7)
    val greedy = CorpusPipeline.run(chain, cfg)._1
      .select("doc_id").as[Long].collect().toSet
    val transitive = CorpusPipeline.run(chain,
        cfg.copy(transitiveClusters = true))._1
      .select("doc_id").as[Long].collect().toSet
    assert(greedy === Set(1L, 2L))
    assert(transitive === Set(1L))
  }
}
