package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Shuffle-volume proof for the paragraph-dedup pair: the exact path
  * shuffles each distinct paragraph STRING once per map partition (the
  * min-doc agg's key), the hashed path shuffles two 64-bit hashes per
  * paragraph instead. Runs both on the same documents table, asserts the
  * outputs are row-for-row identical, and prints total shuffle write
  * bytes + wall seconds for each — the number SCALE.md cites.
  *
  *   runMain graft.tools.ParDedupBench [sfDir]
  */
object ParDedupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val written = new ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) written.add(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    case class Run(bytes: Long, rows: Long, digest: BigDecimal, secs: Double)
    def measure(f: => org.apache.spark.sql.DataFrame): Run = {
      written.clear()
      val t0 = System.nanoTime()
      // order-independent row-set digest: sum of per-row hashes (as
      // decimal — a long sum of 500k 64-bit hashes overflows under ANSI)
      val r = f.agg(
        count(lit(1)).as("rows"),
        sum(xxhash64(col("doc_id"), col("n_pars"), col("n_kept"),
          col("text_deduped")).cast("decimal(38,0)")).as("digest")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events arrive asynchronously; drain the bus for real
      // (a fixed sleep is a race on a slow bus — ADVICE r10)
      org.apache.spark.graftspark.ListenerBusAccess
        .waitUntilEmpty(spark.sparkContext, 30000L)
      var bytes = 0L
      written.forEach(b => bytes += b)
      Run(bytes, r.getLong(0), BigDecimal(r.getDecimal(1)), secs)
    }

    val exact =
      measure(graft.ops.Dedup.paragraphDedup(docs, "doc_id", "text"))
    val hashed =
      measure(graft.ops.Dedup.paragraphDedupHashed(docs, "doc_id", "text"))
    def d2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f",
      Double.box(v))
    println(s"""{"par_dedup_bench":{"dir":"$dir","rows":${exact.rows},""" +
      s""""exact_shuffle_bytes":${exact.bytes},""" +
      s""""hashed_shuffle_bytes":${hashed.bytes},""" +
      s""""exact_secs":${d2(exact.secs)},"hashed_secs":${d2(hashed.secs)},""" +
      s""""outputs_match":${exact.rows == hashed.rows &&
        exact.digest == hashed.digest}}}""")
    spark.stop()
  }
}
