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
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
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
    * The swap is rename-aside (old → .compact_old, tmp → live, delete
    * old): a crash at any point leaves at least one complete copy on
    * disk, unlike delete-then-rename which has a window with only the
    * temp copy. Single-writer batch semantics. Returns the new parquet
    * file count across all leaves. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val dir = new java.io.File(path)
    require(dir.isDirectory, s"$path is not a directory")
    val subdirs = dir.listFiles().filter(_.isDirectory)
    if (subdirs.exists(_.getName.contains("="))) {
      // partitioned layout: recurse into each partition branch
      subdirs.filter(_.getName.contains("="))
        .map(d => compact(spark, d.getPath, targetFileBytes)).sum
    } else {
      def bytes(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(bytes).sum else f.length()
      val total = bytes(dir)
      val nFiles =
        math.max(1, math.ceil(total.toDouble / targetFileBytes).toInt)
      val tmp = new java.io.File(path.stripSuffix("/") + ".compact_tmp")
      val old = new java.io.File(path.stripSuffix("/") + ".compact_old")
      spark.read.parquet(path)
        .repartition(nFiles)
        .write.mode("overwrite").parquet(tmp.getPath)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        if (!f.delete() && f.exists())
          throw new java.io.IOException(s"could not delete $f")
      }
      if (old.exists()) rm(old) // leftover from a prior crash
      require(dir.renameTo(old), s"compact: rename $path aside failed")
      if (!tmp.renameTo(dir)) {
        old.renameTo(dir) // roll back; the original is intact
        throw new java.io.IOException(s"compact: swap into $path failed")
      }
      rm(old)
      new java.io.File(path).listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
  }
}
