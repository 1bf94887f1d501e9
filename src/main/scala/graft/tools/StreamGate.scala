package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end STREAMING oracle gates (r11 verdict #7, widened in r13):
  * drive the streaming tier's three semantically distinct paths through
  * real Structured Streaming micro-batches over the actual sf parquet
  * and dump each file-sink output in Verify layout, so `tools/check.py`
  * hash-compares every one against a DuckDB oracle over the same raw
  * events table:
  *
  *   - q40_hourly_rollup      — tumbling-window aggregation (the
  *     watermark-gated append path), same oracle as batch q40;
  *   - q75_sliding_window     — sliding-window aggregation (each event
  *     feeds 4 overlapping windows; state holds ~8x the window count of
  *     the tumbling path), same oracle as batch q75;
  *   - q41_sessionize_stream  — arbitrary stateful processing via
  *     flatMapGroupsWithState with event-time timeout (gap-close
  *     emission AND watermark-driven timeout emission both exercised).
  *     Oracle = batch q41's session SQL with the session ordinal
  *     projected away: the stream emits sessions as they close, in no
  *     deterministic order and without a per-user index, so the gate
  *     compares the ordinal-free projection (still unique per
  *     (user_id, session_start)) — every other value is bit-identical.
  *   - stream_dedup           — streaming exact-dedup
  *     (dropDuplicatesWithinWatermark) over a COPY of the traffic with
  *     planted re-deliveries: every tenth event duplicated in its own
  *     micro-batch, and each chunk's last 30 minutes re-delivered in
  *     the next chunk — inside the 1h watermark, so only the dedup
  *     STATE STORE (not the late-data filter) can drop them. Oracle =
  *     SELECT * FROM events: one extra surviving copy fails the gate.
  *
  *   runMain graft.tools.StreamGate <sfDir> <workDir> [nChunks=16]
  *   python3 tools/check.py <sfDir> <workDir>/out
  *
  * Shape: the events table is split into nChunks time-ordered parquet
  * files (a replayed "day of traffic"); `readStream` consumes them at
  * maxFilesPerTrigger=1 under Trigger.AvailableNow — one real
  * micro-batch per file, state carried across batches, watermark
  * advancing with event time. Each gate runs as TWO separate streaming
  * queries on one checkpoint: the first consumes half the traffic and
  * terminates mid-stream with windows/sessions open; the second starts
  * fresh against the same checkpoint and must recover that state
  * exactly — lost state, re-emitted rows, or a reset watermark all
  * land in the sink and fail the oracle compare. Append mode only emits a window once the
  * watermark passes it, so a final SENTINEL file (one event 5 hours past
  * the real maximum, outside every real window) flushes the tail
  * windows; the sentinel's own window stays in state by design and its
  * event never reaches any real window's aggregate. TWO sentinel FILES,
  * because append emission is one batch behind the watermark: the
  * watermark computed from sentinel #1 advances at the END of its
  * batch, and only the NEXT batch (sentinel #2's) flushes the final
  * real windows — with a single sentinel, AvailableNow stops before
  * that flush and the tail hour stays in state (measured: 3585/3600
  * rows emitted). The same pair drives the sessionize gate's event-time
  * TIMEOUTS: sentinel #1 lifts the watermark past every real session's
  * (last + gap) timeout timestamp, sentinel #2's batch fires them. The
  * sentinel rows themselves corrupt nothing: their windows/sessions
  * open at +5h and nothing ever advances the watermark past THEM, so
  * they die in state — except the sentinel USER's last real session,
  * which the sentinel event closes by gap (exactly the session the
  * batch oracle computes for those events).
  *
  * What this pins beyond EventStreamsSpec's MemoryStream parity: the
  * file-source discovery order, checkpointed state across restarts of
  * the micro-batch loop, watermark-gated append emission, event-time
  * timeout firing, and the exact parquet the FILE SINK writes — the
  * full production data path for all three streaming operator shapes. */
object StreamGate {

  /** Ordinal-free projection of q41's session oracle: the stream emits
    * sessions without a per-user index; (user_id, session_start) is
    * still a unique key so the compare loses nothing but the ordinal.
    * Shared with [[StreamCrashGate]]. */
  def sessionizeOracleSql: String =
    """WITH g AS (
      |  SELECT user_id, ts,
      |    CASE WHEN prev IS NULL
      |           OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM (SELECT user_id, ts,
      |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |        FROM events) t),
      |s AS (SELECT user_id, ts,
      |        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |      FROM g)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_idx""".stripMargin

  /** Which replay a gate consumes: the plain chunked traffic (+ the two
    * watermark-flush sentinels) or the re-delivery copy. */
  sealed trait SrcKind
  case object MainSrc extends SrcKind
  case object DupSrc extends SrcKind

  /** One gate = a streamed operator, its independent DuckDB oracle, and
    * which replay it consumes. Single definition shared by the restart
    * board ([[StreamGate.main]]) and the crash gate ([[StreamCrashGate]])
    * so the two can never drift onto different pipelines. */
  case class GateDef(name: String, mk: DataFrame => DataFrame,
                     oracle: String, srcKind: SrcKind)

  def gateDefs: Seq[GateDef] = Seq(
    GateDef("q40_hourly_rollup",
      graft.streaming.EventStreams.hourlyRollupStream _,
      graft.SparkEntry.oracleSql("q40_hourly_rollup"), MainSrc),
    GateDef("q75_sliding_window",
      graft.streaming.EventStreams.slidingRollupStream _,
      graft.SparkEntry.oracleSql("q75_sliding_window"), MainSrc),
    GateDef("q41_sessionize_stream",
      (df: DataFrame) => graft.streaming.EventStreams
        .sessionizeStream(df).toDF(),
      sessionizeOracleSql, MainSrc),
    GateDef("stream_dedup",
      (df: DataFrame) => graft.streaming.EventStreams
        .dedupStream(df, Seq("event_id")),
      "SELECT * FROM events", DupSrc))

  def srcDirOf(workDir: String, kind: SrcKind): String = kind match {
    case MainSrc => s"$workDir/src"
    case DupSrc  => s"$workDir/src_dup"
  }

  def escJson(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** Locale-proof fixed-point seconds (the f-interpolator uses the JVM
    * default locale — a comma decimal separator breaks the JSON line). */
  def secs1(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

  /** Micro-batches that actually consumed rows, read from the query's
    * own progress ring — NOT from an async StreamingQueryListener, whose
    * bus is not flushed by awaitTermination (a late-delivered event
    * undercounts one gate and inflates the next). */
  def inputBatches(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.count(_.numInputRows > 0).toLong

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val workDir = args(1)
    val nChunks = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    // the per-phase micro-batch floor counts q.recentProgress entries,
    // and that ring is capped by numRecentProgressUpdates (default
    // 100): a run with more chunks than the cap would undercount and
    // spuriously fail the floor require on a healthy stream — size the
    // ring to the chunk count (+ sentinels + slack)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      math.max(100, 2 * nChunks + 16).toString)

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
    // bounded (windows retire steadily instead of all at the end).
    // Chunk = equal TIME slice (narrow arithmetic on ts, no global sort:
    // an ntile over an unpartitioned window drags the whole corpus
    // through one partition — fine at sf0.1, the anti-pattern this
    // library exists to avoid at sf10+). Slices are disjoint ts
    // intervals, so chunk files are strictly time-ordered; sizes track
    // the (near-uniform) event rate.
    val b = events.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val (tsMin, tsSpan) = (b.getLong(0), b.getLong(1) - b.getLong(0) + 1)
    val chunked = events
      .withColumn("__chunk",
        (((unix_micros(col("ts")) - tsMin) * nChunks / tsSpan) + 1)
          .cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    chunked.count()

    def placeChunk(dir: String, df: DataFrame, i: Int): Unit = {
      val tmp = s"$workDir/tmp_chunk"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"chunk_$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 1000L) // discovery order
      rm(new java.io.File(tmp))
    }
    def chunk(i: Int): DataFrame =
      chunked.filter(col("__chunk") === i).drop("__chunk")
    def writeSentinels(): Unit = for (k <- 1 to 2) {
      // anchor on the CORPUS max, not on limit(1)'s arbitrary (early)
      // row: a sentinel derived from an early row lands below the
      // watermark and is silently dropped as late data — the watermark
      // never advances and the tail windows never flush (measured:
      // exactly the last 2h of windows missing)
      val sentinelSec = maxTs.getTime / 1000 + 5 * 3600 + k
      placeChunk(srcDir, events.limit(1)
        .withColumn("ts", timestamp_seconds(lit(sentinelSec)))
        .withColumn("event_id", lit(-k.toLong)), nChunks + k)
    }

    // the dedup gate's source: the SAME traffic with planted
    // re-deliveries — (a) every event_id % 10 == 0 row duplicated
    // within its own chunk file (in-batch duplicate), and (b) each
    // chunk's last 30 minutes of events re-delivered in the NEXT chunk
    // file. The (b) copies arrive one micro-batch later but their event
    // time is inside the 1h watermark delay, so ONLY the dedup state
    // store — not the late-data filter — can drop them; the copies that
    // straddle the mid-stream restart prove that state survives
    // checkpoint recovery. No sentinels: dedup emission is immediate,
    // nothing needs flushing.
    val srcDupDir = s"$workDir/src_dup"
    new java.io.File(srcDupDir).mkdirs()
    val chunkMaxTs: Map[Int, java.sql.Timestamp] =
      chunked.groupBy(col("__chunk")).agg(max(col("ts")).as("mx"))
        .collect().map(r => r.getInt(0) -> r.getTimestamp(1)).toMap
    def writeChunks(from: Int, to: Int): Unit = for (i <- from to to) {
      placeChunk(srcDir, chunk(i), i)
      val cur = chunk(i)
      val inBatchDups = cur.filter(col("event_id") % 10 === 0)
      // redeliver from the latest NON-EMPTY earlier slice: the
      // time-slice chunker (unlike the old ntile) can leave a slice
      // empty on a skewed event-time distribution, and that slice has
      // no chunkMaxTs entry — a bare Map.apply would crash the gate
      // before any oracle compare
      val prevNonEmpty = (i - 1 to 1 by -1).find(chunkMaxTs.contains)
      val redelivered = prevNonEmpty match {
        case None => cur.limit(0)
        case Some(j) => chunk(j).filter(col("ts") >=
          timestamp_seconds(lit(chunkMaxTs(j).getTime / 1000 - 1800)))
      }
      placeChunk(srcDupDir,
        cur.unionAll(inBatchDups).unionAll(redelivered), i)
    }

    // the oracle runs over the RAW sf events (no sentinels): every
    // sentinel-touched window/session either never emits (nothing
    // advances the watermark past it) or — the sentinel user's last
    // real session — closes with values drawn from real events only,
    // so each sink must equal its oracle row-for-row (per-gate notes
    // above)
    val outDir = s"$workDir/out"
    new java.io.File(outDir).mkdirs()

    val batchTwins: Map[String, DataFrame] = Map(
      "q40_hourly_rollup" ->
        graft.streaming.EventStreams.hourlyRollup(events),
      "q75_sliding_window" ->
        graft.streaming.EventStreams.slidingRollup(events),
      "q41_sessionize_stream" ->
        graft.streaming.EventStreams.sessionizeBatch(events)
          .drop("session_idx"),
      "stream_dedup" -> events)

    // two REAL process phases per gate: phase A consumes the first half
    // of the traffic and the query TERMINATES (AvailableNow); phase B
    // writes the rest (plus sentinels) and starts a NEW query on the
    // SAME checkpoint + sink. The restart must recover every open
    // window / session / watermark from the checkpoint — a recovery bug
    // (lost state, re-emitted rows, reset watermark) lands in the sink
    // and fails the oracle compare. This turns "replay-safe" from a
    // claim into a gated measurement.
    val half = nChunks / 2
    writeChunks(1, half)
    def runGate(g: GateDef): (Long, Double) = {
      val t0 = System.nanoTime()
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDirOf(workDir, g.srcKind))
      val q = g.mk(stream)
        .writeStream.format("parquet")
        .option("path", s"$workDir/sink_${g.name}")
        .option("checkpointLocation", s"$workDir/ckpt_${g.name}")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (inputBatches(q), (System.nanoTime() - t0) / 1e9)
    }
    val phaseA = gateDefs.map(g => g.name -> runGate(g)).toMap
    writeChunks(half + 1, nChunks)
    writeSentinels()
    val results = gateDefs.map { g =>
      val (nbA, secsA) = phaseA(g.name)
      val (nbB, secsB) = runGate(g)
      val nb = nbA + nbB
      val secs = secsA + secsB
      val sink = spark.read.parquet(s"$workDir/sink_${g.name}")
      sink.coalesce(1).write.mode("overwrite").parquet(s"$outDir/${g.name}")
      val sinkRows = sink.count()
      val batchRows = batchTwins(g.name).count()
      // MainSrc phase B = remaining chunks + BOTH sentinel files (each
      // carries one row and must have produced a consuming batch — a
      // missed sentinel surfaces here as the precise count, not as a
      // baffling oracle mismatch on the tail windows); DupSrc has no
      // sentinels by design
      val wantB = g.srcKind match {
        case MainSrc => nChunks - half + 2
        case DupSrc  => nChunks - half
      }
      require(nbA >= half && nbB >= wantB,
        s"${g.name}: expected >= $half phase-A + >= $wantB phase-B " +
          s"micro-batches across the restart, saw $nbA + $nbB")
      (g, nb, secs, sinkRows, batchRows)
    }

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      results.map { case (g, _, _, _, _) =>
        s""""${g.name}": "${escJson(g.oracle)}""""
      }.mkString("{", ", ", "}"))

    val detail = results.map { case (g, nb, secs, sr, br) =>
      s""""${g.name}":{"micro_batches":$nb,"secs":${secs1(secs)},""" +
        s""""sink_rows":$sr,"batch_rows":$br}"""
    }.mkString(",")
    println(s"""{"stream_gate":{"sf":"$sfDir","chunks":$nChunks,""" +
      s""""max_ts":"$maxTs",$detail}}""")
    spark.stop()
  }
}
