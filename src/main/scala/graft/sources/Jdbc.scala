package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source/sink (SURVEY.md §2.1 S7/S10) — the reference engine lives
  * inside PostgreSQL; this is the surface a user points at that database
  * when switching to this library.
  *
  * Scale posture: a single-connection JDBC read is one task no matter the
  * cluster size, so every read here goes through stride partitioning
  * ([[readPartitioned]] / [[readAuto]]): N concurrent connections each
  * scan a key range, and Spark's JDBC relation pushes filters and column
  * pruning into the remote SQL (`PushedFilters` in `.explain`, asserted
  * in JdbcSpec). Writes batch inserts (`batchsize`) and are restartable
  * via [[appendIdempotent]]'s anti-join against the target's keys — the
  * reference's `ON CONFLICT DO NOTHING` re-expressed (§2.7 M1). */
object Jdbc {

  def props(user: String = "", password: String = "",
            driver: String = ""): Properties = {
    val p = new Properties()
    if (user.nonEmpty) p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    if (driver.nonEmpty) p.setProperty("driver", driver)
    p
  }

  /** Single-partition read — only for small lookup/dim tables (the
    * reference's gender/race maps); facts must use [[readPartitioned]]. */
  def read(spark: SparkSession, url: String, table: String,
           connProps: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, connProps)

  /** Stride-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning one `partitionCol` range of
    * [lower, upper]. Rows outside the bounds are still read (first/last
    * stride are unbounded) — bounds shape parallelism, not a filter. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      connProps: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      connProps)

  /** [[readPartitioned]] with bounds discovered by one remote
    * `MIN/MAX(partitionCol)` query (the reference's batch-planning
    * min/max, §2.4 A8 — here it sizes partitions instead of loops). */
  def readAuto(spark: SparkSession, url: String, table: String,
               partitionCol: String, numPartitions: Int,
               connProps: Properties = new Properties()): DataFrame = {
    val bounds = read(spark, url, table, connProps)
      .agg(min(col(partitionCol)).cast("long"),
        max(col(partitionCol)).cast("long"))
      .head()
    if (bounds.isNullAt(0)) // empty table: single empty partition
      read(spark, url, table, connProps)
    else
      readPartitioned(spark, url, table, partitionCol,
        bounds.getLong(0), bounds.getLong(1), numPartitions, connProps)
  }

  /** Batched write. `Overwrite` drops/recreates the table (the
    * reference's TRUNCATE-reload, §2.7 M4); `Append` is S7. */
  def write(df: DataFrame, url: String, table: String, mode: SaveMode,
            batchSize: Int = 10000,
            connProps: Properties = new Properties()): Unit =
    df.write.mode(mode)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, connProps)

  /** Idempotent append: only rows whose `keys` are absent from the target
    * table are inserted (`ON CONFLICT DO NOTHING`, §2.7 M1). The existing
    * keys are read back key-columns-only (column pruning pushes into the
    * remote SELECT). Not atomic versus concurrent writers — same as the
    * reference's per-batch transactions. */
  def appendIdempotent(df: DataFrame, url: String, table: String,
                       keys: Seq[String], batchSize: Int = 10000,
                       connProps: Properties = new Properties()): Unit = {
    val spark = df.sparkSession
    val existing = read(spark, url, table, connProps)
      .select(keys.map(col): _*)
    val fresh = graft.ops.Dedup.antiAppend(df, existing, keys)
    write(fresh, url, table, SaveMode.Append, batchSize, connProps)
  }
}
