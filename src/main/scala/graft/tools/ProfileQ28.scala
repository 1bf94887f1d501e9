package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.NearDup
import graft.queries.TextQueries

/** Ad-hoc stage profiler for the near-dup cascade (q28). Not part of the
  * driver surface; used to attribute time between the LSH candidate stage
  * and the exact-Jaccard verify stage. */
object ProfileQ28 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to 3).foreach { it =>
      println(s"--- iteration $it ---")
      val docs = Tables.documents(spark, dir)
      val sh = NearDup.shingleRows(docs, "doc_id", "text",
        TextQueries.ShingleN)
      time("shingle+minhash")(
        NearDup.minhashRows(sh, "doc_id", TextQueries.NumHashes).count())
      val mh = NearDup.minhashRows(sh, "doc_id", TextQueries.NumHashes)
      time("  +bands")(
        NearDup.lshBands(mh, "doc_id", TextQueries.RowsPerBand).count())
      val pairs = NearDup.candidatePairs(
        NearDup.lshBands(mh, "doc_id", TextQueries.RowsPerBand), "doc_id")
        .select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  +candidatePairs")(pairs.count())
      val pairDocs = pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val shCand = NearDup.shingleRows(
        docs.join(pairDocs, Seq("doc_id"), "left_semi"),
        "doc_id", "text", TextQueries.ShingleN)
      time("jaccard verify")(
        NearDup.jaccard(pairs, shCand, "doc_id",
          restrictToPairDocs = false)
          .filter(col("jaccard") >= 0.3).count())
      pairs.unpersist()
      time("q28 end-to-end")(
        TextQueries.qNearDupVerified(spark, dir).count())
    }
    spark.stop()
  }
}
