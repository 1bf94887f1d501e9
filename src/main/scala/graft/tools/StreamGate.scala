package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end STREAMING oracle gate (r11 verdict #7): drive the hourly
  * rollup through real Structured Streaming micro-batches over the
  * actual sf parquet and dump the file-sink output in Verify layout, so
  * `tools/check.py` hash-compares it against the SAME DuckDB oracle the
  * batch query (q40) gates on.
  *
  *   runMain graft.tools.StreamGate <sfDir> <workDir> [nChunks=16]
  *   python3 tools/check.py <sfDir> <workDir>/out
  *
  * Shape: the events table is split into nChunks time-ordered parquet
  * files (a replayed "day of traffic"); `readStream` consumes them at
  * maxFilesPerTrigger=1 under Trigger.AvailableNow — one real
  * micro-batch per file, state carried across batches, watermark
  * advancing with event time. Append mode only emits a window once the
  * watermark passes it, so a final SENTINEL file (one event 5 hours past
  * the real maximum, outside every real window) flushes the tail
  * windows; the sentinel's own window stays in state by design and its
  * event never reaches any real window's aggregate. The dumped result
  * filters nothing else — every emitted row is sink output, and the
  * batch oracle must match it row-for-row, value-for-value.
  *
  * What this pins beyond EventStreamsSpec's MemoryStream parity: the
  * file-source discovery order, checkpointed state across restarts of
  * the micro-batch loop, watermark-gated append emission, and the exact
  * parquet the FILE SINK writes — the full production data path. */
object StreamGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val workDir = args(1)
    val nChunks = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(workDir))
    val srcDir = s"$workDir/src"
    new java.io.File(srcDir).mkdirs()

    val events = graft.core.Tables.events(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)

    // time-ordered chunks: a replayed stream arrives roughly in event
    // order, which is also what keeps the watermark advancing and state
    // bounded (windows retire steadily instead of all at the end)
    val chunked = events
      .withColumn("__chunk", ntile(nChunks).over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("ts"), col("event_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    chunked.count()
    for (i <- 1 to nChunks) {
      val tmp = s"$workDir/tmp_chunk"
      chunked.filter(col("__chunk") === i).drop("__chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, f"chunk_$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 1000L) // discovery order
      rm(new java.io.File(tmp))
    }
    // sentinels: events 5h past the real max — their window contains no
    // real event, and +5h clears the 2h watermark past every real
    // window. TWO sentinel FILES, because append emission is one batch
    // behind the watermark: the watermark computed from sentinel #1
    // advances at the END of its batch, and only the NEXT batch
    // (sentinel #2's) flushes the final real windows — with a single
    // sentinel, AvailableNow stops before that flush and the tail hour
    // stays in state (measured: 3585/3600 rows emitted).
    for (k <- 1 to 2) {
      // anchor on the CORPUS max, not on limit(1)'s arbitrary (early)
      // row: a sentinel derived from an early row lands below the
      // watermark and is silently dropped as late data — the watermark
      // never advances and the tail windows never flush (measured:
      // exactly the last 2h of windows missing)
      val sentinelSec = maxTs.getTime / 1000 + 5 * 3600 + k
      val sentinel = events.limit(1)
        .withColumn("ts", timestamp_seconds(lit(sentinelSec)))
        .withColumn("event_id", lit(-k.toLong))
      val tmp = s"$workDir/tmp_sentinel"
      sentinel.coalesce(1).write.mode("overwrite").parquet(tmp)
      val spart = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val sdst = new java.io.File(srcDir, f"chunk_${nChunks + k}%04d.parquet")
      java.nio.file.Files.move(spart.toPath, sdst.toPath)
      sdst.setLastModified(1700000000000L + (nChunks + k) * 1000L)
      rm(new java.io.File(tmp))
    }

    // the stream: one micro-batch per file, append mode, parquet sink
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) batches.incrementAndGet()
        override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit = ()
      })
    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = graft.streaming.EventStreams.hourlyRollupStream(stream)
      .writeStream.format("parquet")
      .option("path", s"$workDir/sink")
      .option("checkpointLocation", s"$workDir/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    // Verify-layout dump: the sink parquet IS the spark side; q40's
    // oracle SQL is the compare target. No filtering — the sentinel's
    // own window never emits (nothing advances the watermark past it).
    val outDir = s"$workDir/out"
    new java.io.File(outDir).mkdirs()
    val sink = spark.read.parquet(s"$workDir/sink")
    sink.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/q40_hourly_rollup")
    val oracleJson = graft.SparkEntry.oracleSql("q40_hourly_rollup")
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"""{"q40_hourly_rollup": "${esc(oracleJson)}"}""")

    val sinkRows = sink.count()
    val batchRows = graft.streaming.EventStreams.hourlyRollup(events).count()
    println(s"""{"stream_gate":{"sf":"$sfDir","chunks":$nChunks,""" +
      s""""micro_batches":${batches.get()},"secs":${f"$secs%.1f"},""" +
      s""""sink_rows":$sinkRows,"batch_rows":$batchRows,""" +
      s""""max_ts":"$maxTs"}}""")
    require(batches.get() >= nChunks,
      s"expected >= $nChunks micro-batches, saw ${batches.get()}")
    spark.stop()
  }
}
