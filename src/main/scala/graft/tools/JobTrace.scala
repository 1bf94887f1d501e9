package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

/** Per-JOB wall breakdown of one query's reps — the missing level between
  * [[QueryProfile]] (whole-rep wall/GC/shuffle) and the plan dump: a
  * cascade query is a SEQUENCE of driver-submitted jobs (eager persists,
  * size-gate counts, fixpoint rounds, the final count), and the rep wall
  * is their sum plus driver-side gaps (analysis/optimization, AQE
  * replanning, collect handling). This prints every job's wall and the
  * total driver gap, so "which stage of the cascade costs" and "is the
  * time even in jobs at all" stop being guesses.
  *
  *   runMain graft.tools.JobTrace <sfDir> <reps> <query> [query...]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.WARN)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: JobTrace <sfDir> <reps> <query>...")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    final case class J(id: Int, desc: String, start: Long, var end: Long,
                       stages: Int)
    val jobs = ArrayBuffer.empty[J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += J(e.jobId,
            Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""),
            e.time, -1L, e.stageInfos.size)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = e.time)
        }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val tBuilt = System.nanoTime()
        val n = df.count()
        val t1 = System.nanoTime()
        // listener bus is async; give it a beat to drain
        Thread.sleep(150)
        val snap = jobs.synchronized(jobs.toVector)
        val jobMs = snap.filter(_.end > 0).map(j => j.end - j.start).sum
        println(f"== $name rep $r: wall ${(t1 - t0) / 1e9}%.3f s " +
          f"(construct ${(tBuilt - t0) / 1e9}%.3f, action ${(t1 - tBuilt) / 1e9}%.3f), " +
          f"rows $n, jobs ${snap.size}, job-wall ${jobMs / 1e3}%.3f s, " +
          f"driver-gap ${(t1 - t0) / 1e9 - jobMs / 1e3}%.3f s")
        snap.sortBy(j => -(j.end - j.start)).take(12).foreach { j =>
          println(f"   job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s " +
            f"stages ${j.stages}%2d  ${j.desc.take(90)}")
        }
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
