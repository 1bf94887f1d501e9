package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Adjudicator for q162's run-to-run spread (the board's noisiest query:
  * 3.0–6.8 s on identical code and bytes in past driver runs). Runs the
  * query `reps` times in one session and prints, per run: wall seconds,
  * summed task JVM GC time, execution-memory spill bytes (memory+disk),
  * and shuffle read/write bytes. If the wall spread tracks gcMillis /
  * spill while shuffle bytes stay constant, the cause is pool pressure
  * (GC + spill timing), not plan drift — the SCALE.md record.
  *
  *   runMain graft.tools.Q162Profile [sfDir] [reps]
  */
object Q162Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val gc = new AtomicLong
    val spillMem = new AtomicLong
    val spillDisk = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          gc.addAndGet(m.jvmGCTime)
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // same warmup discipline as Bench: absorb JVM/codegen first-touch
    try graft.SparkEntry.entry(spark).count()
    catch { case _: Throwable => }
    val walls = (1 to reps).map { i =>
      gc.set(0); spillMem.set(0); spillDisk.set(0)
      shufRead.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q162_setsim_join")(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(v))
      println(s"""{"q162_run":{"rep":$i,"rows":$n,"secs":${d3(secs)},""" +
        s""""gc_millis":${gc.get},"spill_mem":${spillMem.get},""" +
        s""""spill_disk":${spillDisk.get},"shuffle_read":${shufRead.get},""" +
        s""""shuffle_write":${shufWrite.get}}}""")
      spark.catalog.clearCache()
      System.gc()
      secs
    }
    def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    println(s"""{"q162_spread":{"reps":$reps,"min":${d3(walls.min)},""" +
      s""""max":${d3(walls.max)},"spread":${d3(walls.max / walls.min)}}}""")
    spark.stop()
  }
}
