package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: only dump queries whose name starts with one
    // of them (local iteration; the driver always passes exactly two)
    // GRAFT_VERIFY_EXCLUDE: comma-separated exact names to skip — for the
    // above-driver-scale (sf1) board, where the two output-cardinality-
    // bound queries (q150 dup² id-pairs, q201 proximity ∝ density²) are
    // excluded by documented contract (SCALE.md). Unset for driver runs.
    val excluded = sys.env.get("GRAFT_VERIFY_EXCLUDE")
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty[String])
    // audit trail for exclusion runs: print what is ACTUALLY excluded and
    // call out names matching no query — a typo would otherwise exclude
    // nothing, silently, and the sf1 board would quietly run the query it
    // meant to skip (or skip nothing and look green for the wrong reason)
    if (excluded.nonEmpty) {
      val (known, unknown) = excluded.partition(SparkEntry.queries.contains)
      System.err.println(
        s"[verify] GRAFT_VERIFY_EXCLUDE active: skipping " +
          s"${known.toSeq.sorted.mkString(", ")}")
      if (unknown.nonEmpty)
        System.err.println(
          s"[verify] WARNING: excluded names matching NO query (typo?): " +
            s"${unknown.toSeq.sorted.mkString(", ")}")
    }
    // GRAFT_SCALE_OVERRIDES=1 (sf1-board runs only): swap in the
    // resource-bounded twins — folded query projections AND their
    // matching oracle forms (SparkEntry.queriesScaleOverrides /
    // oracleSqlScaleOverrides). Driver runs leave it unset and get the
    // independent full-shape forms.
    val scaleOverrides =
      sys.env.get("GRAFT_SCALE_OVERRIDES").contains("1")
    if (scaleOverrides)
      System.err.println("[verify] scale-override twins active: " +
        (SparkEntry.queriesScaleOverrides.keySet ++
          SparkEntry.oracleSqlScaleOverrides.keySet).toSeq.sorted
          .mkString(", "))
    val baseQueries =
      if (scaleOverrides) SparkEntry.queries ++ SparkEntry.queriesScaleOverrides
      else SparkEntry.queries
    val selected =
      (if (args.length <= 2) baseQueries
       else baseQueries.filter { case (n, _) =>
         args.drop(2).exists(n.startsWith) })
        .filter { case (n, _) => !excluded.contains(n) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // delete any STALE output from a previous run: most failures
        // throw at plan time, before overwrite touches the directory —
        // leaving last round's (passing) parquet in place would let the
        // DuckDB compare validate stale results and MASK the regression
        // this dump exists to catch.
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(new java.io.File(s"$outDir/$name"))
        // then write an EXPLICIT one-row error marker in its place: a
        // compare harness that treats "no output" as "skip this name"
        // (the r4 driver artifact did exactly that) would silently drop
        // the failing query from the round's correctness board. The
        // marker's schema can never match any oracle, so every checker
        // records a loud schema/hash FAIL row instead of an omission.
        try {
          import spark.implicits._
          Seq((name, String.valueOf(e.getMessage)))
            .toDF("__graft_failed_query__", "__error__")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () } // marker write is best-effort
      }
      // release caches the query's operators persisted internally —
      // across ~100 queries the dead entries would otherwise accumulate
      // in executor storage for the whole run (CacheManager entries are
      // never GC-collected). The GC nudge then lets the ContextCleaner
      // drop localCheckpoint blocks (DenseId, candidatePairs), which
      // CLEARCACHE DOES NOT TOUCH — they'd otherwise crowd the storage
      // pool and evict later queries' live intermediates (see Bench).
      spark.catalog.clearCache()
      System.gc()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles =
      if (scaleOverrides) SparkEntry.oracleSql ++
        SparkEntry.oracleSqlScaleOverrides
      else SparkEntry.oracleSql
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
