package graft.tools

import org.apache.spark.sql.streaming.Trigger

/** Exactly-once-under-CRASH gate: [[StreamGate]] restarts its streams at
  * a clean AvailableNow termination; this tool kills the JVM
  * (`Runtime.halt` — no shutdown hooks, no graceful stop, the in-flight
  * micro-batch dies uncommitted) partway through the replay, then a
  * fresh invocation recovers from the checkpoint, and the final sink
  * must STILL hash-match the same DuckDB oracle. That is the property a
  * 1000-executor job actually needs: a lost driver mid-batch must not
  * lose emitted rows, re-emit committed ones, or corrupt operator state
  * (window aggregates, flatMapGroupsWithState sessions, dedup keys).
  *
  * The gate pipelines are [[StreamGate.gateDefs]] — the SAME definitions
  * the restart board runs, so the two gates cannot drift onto different
  * operators or oracles. Reuses a completed StreamGate workDir's source
  * dirs (src = chunked replay + sentinels, src_dup = re-delivery
  * traffic):
  *
  *   tools/run_main.sh graft.tools.StreamGate <sfDir> <wd>        # build
  *   tools/stream_crash_gate.sh <sfDir> <wd> <gate> [crashSecs...]
  *
  * where <gate> ∈ q40 | q75 | sessionize | dedup. Each crash invocation
  * runs the stream and halts after the given seconds — FAILING CLOSED if
  * the replay already finished (exit 3: the crash would not have hit a
  * live micro-batch, so the property was not exercised; rerun with a
  * smaller offset). The final invocation (crashAfterSec = 0) runs to
  * termination, dumps the sink in Verify layout, and
  * `tools/check.py <sfDir> <wd>/crash_<gate>/out` gates it. The sink
  * parquet is read back through the FileStreamSink's _spark_metadata
  * log, so any uncommitted part files the crash left behind are
  * invisible — exactly what a downstream batch reader sees. */
object StreamCrashGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val sgDir = args(1)
    val gateArg = args(2)
    val crashAfterSec = args(3).toDouble
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.core.Tables.events(spark, sfDir)
    val byAlias = Map(
      "q40" -> "q40_hourly_rollup",
      "q75" -> "q75_sliding_window",
      "sessionize" -> "q41_sessionize_stream",
      "dedup" -> "stream_dedup")
    val gateName = byAlias.getOrElse(gateArg, gateArg)
    val g = StreamGate.gateDefs.find(_.name == gateName).getOrElse(
      sys.error(s"unknown gate: $gateArg (know ${byAlias.keys.mkString("/")})"))
    val src = StreamGate.srcDirOf(sgDir, g.srcKind)
    require(new java.io.File(src).isDirectory,
      s"$src missing — run graft.tools.StreamGate $sfDir $sgDir first")

    val work = s"$sgDir/crash_${gateArg}"
    val q = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .transform(g.mk)
      .writeStream.format("parquet")
      .option("path", s"$work/sink")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

    if (crashAfterSec > 0) {
      Thread.sleep((crashAfterSec * 1000).toLong)
      if (!q.isActive) {
        // fail CLOSED: the replay finished before the crash offset, so
        // halting now would "pass" without ever crashing a live batch
        Console.err.println(s"[crash-gate] replay already terminated " +
          s"before the ${crashAfterSec}s crash offset — nothing was " +
          "crashed; use a smaller offset")
        spark.stop()
        sys.exit(3)
      }
      // the hard way out: no stop(), no shutdown hooks, no sink/state
      // commit for the in-flight batch
      Console.err.println(s"[crash-gate] halting JVM mid-stream " +
        s"(${g.name}, after ${crashAfterSec}s)")
      Runtime.getRuntime.halt(137)
    }
    q.awaitTermination()

    val outDir = s"$work/out"
    new java.io.File(outDir).mkdirs()
    val sink = spark.read.parquet(s"$work/sink")
    sink.coalesce(1).write.mode("overwrite").parquet(s"$outDir/${g.name}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"""{"${g.name}": "${StreamGate.escJson(g.oracle)}"}""")
    println(s"""{"stream_crash_gate":{"gate":"${g.name}",""" +
      s""""sink_rows":${sink.count()}}}""")
    spark.stop()
  }
}
