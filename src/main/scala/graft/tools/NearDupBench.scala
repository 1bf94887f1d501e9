package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.NearDup

/** Near-dup pipeline scale benchmark with planted duplicates:
  * synthesizes N documents (deterministic word salads), plants an exact
  * duplicate and a near-duplicate (one token changed) for every 100th
  * doc, runs shingle→minhash→LSH→exact-Jaccard end-to-end, and reports
  * throughput plus recall of the planted pairs.
  *
  *   runMain graft.tools.NearDupBench [nDocs]
  */
object NearDupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = graft.core.Sessions.local()

    val words = Seq("spark", "shuffle", "join", "filter", "vector", "batch",
      "stream", "column", "row", "hash", "sort", "merge", "scan", "agg",
      "query", "table", "key", "value", "data", "part")
    val wordArr = array(words.map(lit): _*)
    // base docs: 40 words drawn via murmur mixing of (doc_id, position) —
    // NOT a linear congruence, which would alias docs into identical
    // classes and blow candidate pairs up quadratically
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(i =>
        element_at(wordArr,
          (pmod(hash(col("id"), lit(i)), lit(words.size)) + 1).cast("int"))
      ): _*).as("text"))
    val exactDups = base.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + n).as("doc_id"), col("text"))
    val nearDups = base.filter(col("doc_id") % 100 === 50)
      .select((col("doc_id") + 2L * n).as("doc_id"),
        concat(lit("changed "), substring_index(col("text"), " ", 39))
          .as("text"))
    val docs = base.unionByName(exactDups).unionByName(nearDups)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()

    val t0 = System.nanoTime()
    val sh = NearDup.shingleRows(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mh = NearDup.minhashRows(sh, "doc_id", 16)
    val pairs = NearDup.candidatePairs(
      NearDup.lshBands(mh, "doc_id", 4), "doc_id")
      .select(col("doc_a"), col("doc_b"))
    val verified = NearDup.jaccard(pairs, sh, "doc_id")
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val found = verified.count()
    val secs = (System.nanoTime() - t0) / 1e9

    // recall of planted pairs
    val plantedExact = verified
      .filter(col("doc_b") === col("doc_a") + n).count()
    val plantedNear = verified
      .filter(col("doc_b") === col("doc_a") + 2L * n).count()
    val expectedExact = n / 100
    val expectedNear = n / 100
    println(f"""{"neardup_bench": {"docs": $total, "secs": $secs%.2f, "docs_per_sec": ${(total / secs).toLong}, "verified_pairs": $found, "recall_exact": ${plantedExact.toDouble / expectedExact}%.3f, "recall_near": ${plantedNear.toDouble / expectedNear}%.3f}}""")
    spark.stop()
  }
}
