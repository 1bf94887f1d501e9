package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus construction: the standard LLM-data staging
  * (quality filter → exact dedup → MinHash-LSH near-dedup → stratified
  * sample) composed from this library's operators into one deterministic,
  * resumable pipeline.
  *
  * Every stage is a pure DataFrame→DataFrame function; between stages the
  * only materialized state is (doc_id) survivor sets, so at 100 TB each
  * stage streams the corpus once and shuffles only ids/hashes. Dedup
  * survivor choice and sampling are deterministic (content-hash tiebreaks,
  * [[Sampling]] hash membership) — rerunning the pipeline on the same
  * input yields byte-identical output regardless of partitioning.
  */
object CorpusPipeline {

  /** @param minTokens      drop docs shorter than this many tokens
    * @param maxPunctRatio  drop docs with a higher punctuation ratio
    * @param shingleN       n-gram width for near-dup detection
    * @param numHashes      minhash signature length
    * @param rowsPerBand    LSH banding (numHashes/rowsPerBand bands)
    * @param jaccardMin     verified near-dup threshold
    * @param sampleFractions per-language sample fractions ([[Sampling]])
    * @param sampleDefault  fraction for languages not listed
    * @param seed           sampling seed */
  final case class Config(
    minTokens: Int = 5,
    maxPunctRatio: Double = 0.3,
    shingleN: Int = 3,
    numHashes: Int = 16,
    rowsPerBand: Int = 4,
    jaccardMin: Double = 0.8,
    sampleFractions: Map[String, Double] = Map.empty,
    sampleDefault: Double = 1.0,
    seed: Long = 42L)

  final case class Stats(input: Long, afterQuality: Long, afterExact: Long,
                         afterNearDup: Long, output: Long)

  /** Run the four stages over `docs(doc_id, text, lang)`; returns the
    * surviving rows (original columns) and per-stage counts.
    *
    * Near-dup policy: for every verified pair (a, b) with a < b, the
    * higher id is dropped — the minimum of each duplicate cluster is never
    * a `doc_b`, so each cluster keeps exactly its smallest id (the
    * standard greedy MinHash-dedup policy; exact transitive clustering
    * would need iterated connected components for no retention benefit). */
  def run(docs: DataFrame, cfg: Config): (DataFrame, Stats) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val input = docs.count()

    // 1. quality: cheap per-row features, no shuffle, filter at the scan
    val q = TextOps.qualityFeatures(col("text"))
    val quality = docs
      .withColumn("__q", q)
      .filter(col("__q.n_tokens") >= cfg.minTokens &&
        col("__q.punct_ratio") <= cfg.maxPunctRatio)
      .drop("__q")
    val afterQuality = quality.count()

    // 2. exact dedup: smallest doc_id survives per content hash.
    // Persisted: it feeds the stage count, the shingle stream, AND the
    // final anti-join — without a persist each consumer re-runs the
    // scan+filter+dedup shuffle. This is the pipeline's stage boundary
    // (survivor rows, corpus-sized once, disk-spillable).
    val exact = Dedup.exactDedup(quality, Seq(col("text")),
        col("doc_id").asc)
      .persist(MEMORY_AND_DISK)
    val afterExact = exact.count()

    // 3. near-dup: LSH candidates → exact-Jaccard verify (restricted to
    // candidate docs) → drop the larger id of each verified pair
    val sh = NearDup.shingleRows(exact, "doc_id", "text", cfg.shingleN)
    val mh = NearDup.minhashRows(sh, "doc_id", cfg.numHashes)
    val pairs = NearDup.candidatePairs(
        NearDup.lshBands(mh, "doc_id", cfg.rowsPerBand), "doc_id")
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupIds = NearDup.jaccard(pairs, sh, "doc_id")
      .filter(col("jaccard") >= cfg.jaccardMin)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = exact.join(dupIds, Seq("doc_id"), "left_anti")
      .persist(MEMORY_AND_DISK) // consumed by count + sample + caller
    val afterNearDup = deduped.count()

    // 4. deterministic stratified sample by language
    val sampled =
      if (cfg.sampleFractions.isEmpty && cfg.sampleDefault >= 1.0) deduped
      else Sampling.stratifiedHashSample(deduped, col("doc_id"),
        col("lang"), cfg.sampleFractions, cfg.sampleDefault, cfg.seed)
    val output = sampled.count()

    (sampled, Stats(input, afterQuality, afterExact, afterNearDup, output))
  }
}
