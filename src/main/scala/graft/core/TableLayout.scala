package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical table layout for co-located joins (SURVEY.md §4). The OMOP DDL
  * itself hints the intent: `--HINT DISTRIBUTE ON KEY (person_id)`
  * (sql/omop_ddl/OMOPCDM_postgresql_5.4_ddl.sql:2). Spark's equivalent is
  * bucketing: write both sides bucketed by the join key into the catalog,
  * and joins on that key need no exchange at read time — at 100 TB,
  * person-keyed OMOP domain joins become shuffle-free. */
object TableLayout {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * merge joins skip the sort too). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // drop table AND its files: overwrite alone refuses when a previous
    // location survives a dropped catalog entry
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // resolve the stale location the way the CATALOG will (lowercased
    // name, database subdirectory) — a naive <warehouse>/<table> concat
    // misses for "MyTable" or "db.table", leaving the stale dir in place
    // and saveAsTable failing on "location already exists"
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new java.io.File(
      spark.sessionState.catalog.defaultTablePath(ident).getPath)
    if (loc.exists()) rm(loc)
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` directory-partitioned by `partitionCol` (Hive-style
    * `col=value/` layout). Predicates on the partition column then prune
    * at PLANNING time — unmatched directories are never listed into the
    * scan, the dominant I/O lever for time-partitioned fact tables (the
    * reference's event-date batching, but done by layout instead of
    * WHERE-ranges per batch). Combine with [[writeBucketed]]'s key for
    * co-located joins within partitions. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    if (!f.delete() && f.exists())
      throw new java.io.IOException(s"could not delete $f")
  }

  private def swapOldOf(live: java.io.File) =
    new java.io.File(live.getParentFile, s".${live.getName}.compact_old")
  private def swapTmpOf(live: java.io.File) =
    new java.io.File(live.getParentFile, s".${live.getName}.compact_tmp")

  /** Crash recovery for [[compact]]'s rename-aside swap of `live`: if a
    * previous run renamed the live dir aside and died before completing
    * the swap, the aside copy is the ONLY complete one — restore it.
    * Stale tmp dirs are always disposable (incomplete, or complete but
    * never swapped in while the original was restored); a stale old
    * beside an existing live means the swap completed — drop it. */
  private def recoverSwap(live: java.io.File): Unit = {
    val old = swapOldOf(live)
    val tmp = swapTmpOf(live)
    if (!live.exists() && old.exists())
      require(old.renameTo(live), s"compact recovery: restore $old failed")
    if (tmp.exists()) rm(tmp)
    if (live.exists() && old.exists()) rm(old)
  }

  /** Compact a parquet directory to ~`targetFileBytes` files — the
    * small-files remedy for incrementally-appended tables (every
    * `append` run adds a file per task; a year of daily drops makes the
    * NameNode/listing and per-file open costs dominate the scan).
    *
    * Hive-partitioned layouts (`col=value/` subdirectories, e.g. from
    * [[writePartitioned]]) compact per leaf partition, preserving the
    * directory structure AND the partition column's stored absence — a
    * naive whole-table read-rewrite would flatten the layout and retype
    * the partition column from directory-name inference.
    *
    * The swap is rename-aside (live → hidden old, tmp → live, delete
    * old): a crash at any point leaves at least one complete copy on
    * disk, unlike delete-then-rename which has a window with only the
    * temp copy. The aside/tmp dirs are DOT-PREFIXED siblings
    * (`.day=1.compact_old`): Spark ignores dot-paths, so a crash can
    * never surface the stale copy as a phantom partition (an unhidden
    * `day=1.compact_old` would be read as partition day='1.compact_old',
    * duplicating every row of that partition), and each compact() run
    * first restores/cleans any interrupted swap it finds. Single-writer
    * batch semantics. Returns the new parquet file count across all
    * leaves. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val dir = new java.io.File(path.stripSuffix("/"))
    recoverSwap(dir) // the target itself may have been mid-swap
    require(dir.isDirectory, s"$path is not a directory")
    // restore partitions a crashed run left renamed-aside, THEN list
    dir.listFiles().filter(_.isDirectory)
      .filter(d => d.getName.startsWith(".") &&
        (d.getName.endsWith(".compact_old") ||
          d.getName.endsWith(".compact_tmp")))
      .map(d => new java.io.File(dir, d.getName.stripPrefix(".")
        .stripSuffix(".compact_old").stripSuffix(".compact_tmp")))
      .distinct.foreach(recoverSwap)
    val parts = dir.listFiles().filter(d => d.isDirectory &&
      d.getName.contains("=") && !d.getName.startsWith("."))
    if (parts.nonEmpty) {
      // partitioned layout: recurse into each partition branch
      parts.map(d => compact(spark, d.getPath, targetFileBytes)).sum
    } else {
      def bytes(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(bytes).sum else f.length()
      val total = bytes(dir)
      val nFiles =
        math.max(1, math.ceil(total.toDouble / targetFileBytes).toInt)
      val tmp = swapTmpOf(dir)
      val old = swapOldOf(dir)
      spark.read.parquet(dir.getPath)
        .repartition(nFiles)
        .write.mode("overwrite").parquet(tmp.getPath)
      require(dir.renameTo(old), s"compact: rename $path aside failed")
      if (!tmp.renameTo(dir)) {
        old.renameTo(dir) // roll back; the original is intact
        throw new java.io.IOException(s"compact: swap into $path failed")
      }
      rm(old)
      dir.listFiles().count(_.getName.endsWith(".parquet"))
    }
  }
}
