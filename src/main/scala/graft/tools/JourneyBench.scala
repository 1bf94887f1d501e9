package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Attribution

/** Scale proof for the journey family (attribution + paths): cost must
  * track the per-user touch×conversion DENSITY inside the lookback
  * window, and the three credit models must reconcile exactly at any
  * size (Σ first = Σ last = Σ linear = attributed conversions).
  *
  *   runMain graft.tools.JourneyBench [nUsers] [eventsPerUser]
  *
  * Workload: `nUsers` users × `eventsPerUser` events over 30 days
  * (defaults 100k × 20 = 2M events), deterministic pseudo-random
  * timestamps/types from the id (no RNG — reruns identical). ~25% of
  * events are conversions; lookback 24 h. Reports wall-clock for the
  * credit rows, the channel rollup, and topPaths, plus the accounting
  * identity drift (must be 0 for first/last and ≤ 1e-6·conversions for
  * the 9-rounded linear sum).
  */
object JourneyBench {
  def main(args: Array[String]): Unit = {
    val nUsers = args.headOption.map(_.toInt).getOrElse(100000)
    val perUser = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    val n = nUsers.toLong * perUser
    // deterministic event stream: hash-spread seconds over 30 days,
    // type by a different remix of the id
    val h1 = (col("id") * 2654435761L) % 1000000007L
    val h2 = (col("id") * 2246822519L) % 1000000007L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % nUsers).as("user_id"),
      timestamp_seconds(lit(1704067200L) + h1 % (30L * 86400L)).as("ts"),
      when(h2 % 4 === 0, "purchase")
        .when(h2 % 4 === 1, "view").otherwise("click").as("event_type"))
      .localCheckpoint() // freeze the input so both passes time the ops

    def d(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val t0 = System.nanoTime()
    val credits = Attribution.touchCredit(
      ev.filter(col("event_type").isin("view", "click")),
      ev.filter(col("event_type") === "purchase"),
      "user_id", "ts", "event_id", "event_type", windowSeconds = 86400L)
    val ch = Attribution.channelCredit(credits)
      .localCheckpoint()
    val creditSecs = (System.nanoTime() - t0) / 1e9

    val agg = ch.agg(sum("first_touch").as("f"), sum("last_touch").as("l"),
      sum("linear_touch").as("lin")).head()
    val f = agg.getLong(0); val l = agg.getLong(1)
    val lin = agg.getDouble(2)
    val convs = credits.select("conv_id").distinct().count()

    val t1 = System.nanoTime()
    val paths = Attribution.topPaths(ev,
      Seq(col("user_id"), to_date(col("ts")).as("day")),
      "ts", "event_id", "event_type", 20).collect()
    val pathSecs = (System.nanoTime() - t1) / 1e9

    println(
      s"""{"journey_bench": {"events": $n, "users": $nUsers, """ +
        s""""attributed_conversions": $convs, """ +
        s""""first_total": $f, "last_total": $l, """ +
        s""""linear_total": ${d(lin)}, """ +
        s""""credit_secs": ${d(creditSecs)}, """ +
        s""""top_path_n": ${paths.head.getLong(1)}, """ +
        s""""paths_secs": ${d(pathSecs)}}}""")
    assert(f == convs && l == convs,
      s"first/last must credit one unit per conversion: $f/$l vs $convs")
    assert(math.abs(lin - convs) <= 1e-6 * convs + 1e-6,
      s"linear total $lin drifted from $convs beyond the rounding budget")
    spark.stop()
  }
}
