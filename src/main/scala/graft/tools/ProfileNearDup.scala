package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.NearDup

/** Stage-by-stage timing of the near-dup pipeline (dev tool):
  *   runMain graft.tools.ProfileNearDup [sfDir]
  */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    // warmup scan
    docs.count()
    val sh = NearDup.shingleRows(docs, "doc_id", "text", 3)
    time("shingleRows")(sh.count())
    val shP = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle persist")(shP.count())
    val mh = NearDup.minhashRows(shP, "doc_id", 16)
    time("minhashRows")(mh.count())
    val bands = NearDup.lshBands(mh, "doc_id", 4)
    time("lshBands")(bands.count())
    val pairs = NearDup.candidatePairs(bands, "doc_id")
    time("candidatePairs")(pairs.count())
    val j = NearDup.jaccard(pairs.select(col("doc_a"), col("doc_b")), shP,
      "doc_id")
    time("jaccard")(j.count())
    time("full q28 fresh")(
      graft.queries.TextQueries.qNearDupVerified(spark, sfDir).count())
    spark.stop()
  }
}
