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
}
