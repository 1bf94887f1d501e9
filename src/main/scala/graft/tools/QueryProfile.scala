package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Generalized [[Q162Profile]] — the GC-vs-plan adjudicator for ANY
  * bench outlier (r11 verdict #6: q169/q110/q226 ran 2–3.5× the
  * committed HEAD record in both driver reps). Per query, per rep:
  * wall seconds, summed task JVM GC time, execution-memory spills, and
  * shuffle read/write bytes. Byte-identical shuffles + wall tracking
  * gcMillis = single-JVM pool-pressure noise (the q162-proven class);
  * byte drift = a real plan change worth chasing.
  *
  *   runMain graft.tools.QueryProfile <sfDir> <reps> <query> [query...]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: QueryProfile <sfDir> <reps> <query>...")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
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
    def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    // same warmup discipline as Bench: absorb JVM/codegen first-touch
    try graft.SparkEntry.entry(spark).count()
    catch { case _: Throwable => }
    names.foreach { name =>
      val walls = (1 to reps).map { i =>
        gc.set(0); spillMem.set(0); spillDisk.set(0)
        shufRead.set(0); shufWrite.set(0)
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain
        println(s"""{"profile":{"query":"$name","rep":$i,"rows":$n,""" +
          s""""secs":${d3(secs)},"gc_millis":${gc.get},""" +
          s""""spill_mem":${spillMem.get},"spill_disk":${spillDisk.get},""" +
          s""""shuffle_read":${shufRead.get},""" +
          s""""shuffle_write":${shufWrite.get}}}""")
        spark.catalog.clearCache()
        System.gc()
        secs
      }
      println(s"""{"profile_spread":{"query":"$name","reps":$reps,""" +
        s""""min":${d3(walls.min)},"max":${d3(walls.max)},""" +
        s""""spread":${d3(walls.max / walls.min)}}}""")
    }
    spark.stop()
  }
}
