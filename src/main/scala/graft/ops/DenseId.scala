package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic dense-integer id assignment (SURVEY.md §1.4, §2.5 W2).
  *
  * The reference assigns ids with Postgres sequences over not-yet-mapped
  * source ids (enhanced_synthea_to_omop.py:770-777,935-944). The observable
  * contract is: dense, unique, stable-given-input-order integers. We
  * strengthen it to *deterministic*: id = row_number under ORDER BY the
  * source key (+ offset) — reproducible across reruns and engines, which is
  * what the DuckDB oracle check requires (SURVEY.md §7.4 risk 1).
  *
  * NOT `monotonically_increasing_id()`: that is partition-layout-dependent
  * and non-reproducible.
  */
object DenseId {

  /** Small/medium inputs: a single global window. Catalyst plans this as a
    * single-partition sort — exact but not scalable past ~10^8 rows. */
  def withDenseIdWindow(df: DataFrame, orderBy: Seq[Column],
                        idCol: String, offset: Long = 0L): DataFrame =
    df.withColumn(idCol,
      row_number().over(Window.orderBy(orderBy: _*)) + lit(offset))

  /** Scale path: identical output, no global single-partition sort.
    * Range-partition by the key (ordered contiguous ranges →
    * spark_partition_id() is an ordered bucket id), row_number within each
    * bucket, then add per-bucket cumulative offsets — computed as a
    * running sum over the (parts-row) bucket-count aggregate and
    * broadcast-joined back. Entirely Catalyst/Tungsten — the earlier RDD
    * zipWithIndex formulation paid InternalRow↔Row boxing on every row
    * (~3× slower end-to-end on the ETL bench).
    *
    * The bucketed data is materialized ONCE via eager localCheckpoint:
    * the bucket-count collect and the returned lineage both read that
    * materialization, so the sampling-based range partitioner can never
    * re-execute with different bounds between them (a lazy shared-plan
    * formulation relying on ReuseExchange was tried and CORRUPTED ids
    * when the rule didn't fire inside a larger query — caught by the
    * q06 oracle). Unlike a persist, a checkpoint holds no CacheManager
    * entry: its blocks are released by the ContextCleaner as soon as the
    * returned frame is unreferenced, so repeated ETL call sites don't
    * accumulate application-lifetime caches. (Local checkpoints trade
    * executor-loss recovery for speed — the ETL driver rewrites the
    * table on failure anyway; swap for reliable `checkpoint` on
    * churn-prone clusters.)
    *
    * Ties across bucket boundaries are broken by the range partitioner,
    * so `orderBy` should be a unique key (it is for the reference's UUID
    * source ids); ids are then independent of where the sampled bucket
    * boundaries land (within-bucket rank + earlier-bucket counts = global
    * rank). */
  def withDenseIdScalable(df: DataFrame, orderBy: Seq[Column],
                          idCol: String, offset: Long = 0L,
                          numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val bucketed = df.repartitionByRange(parts, orderBy: _*)
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint(true)
    val starts = bucketed.groupBy(col("__bucket")).count()
      .collect().sortBy(_.getInt(0))
      .foldLeft((offset, Map.empty[Int, Long])) {
        case ((acc, m), r) => (acc + r.getLong(1), m + (r.getInt(0) -> acc))
      }._2
    import spark.implicits._
    val offsets = broadcast(starts.toSeq.toDF("__bucket", "__start"))
    val w = Window.partitionBy(col("__bucket")).orderBy(orderBy: _*)
    bucketed
      .join(offsets, "__bucket")
      .withColumn(idCol, row_number().over(w) + col("__start"))
      .drop("__bucket", "__start")
  }

  /** M1 composite: extend an existing (sourceKey → id) map with ids for the
    * not-yet-mapped keys of `incoming`, first-writer-wins, appended after
    * the current max id. Mirrors the reference's
    * `INSERT ... SELECT nextval(seq) ... WHERE NOT IN (SELECT source_id)`
    * (enhanced_synthea_to_omop.py:770-777).
    *
    * New-key ids go through the scalable range-partitioned path — a bulk
    * first load maps EVERY source id here, so the single-partition global
    * window would be the whole pipeline's bottleneck at scale. */
  def extendIdMap(existing: DataFrame, incoming: DataFrame,
                  sourceKeyCol: String, idCol: String): DataFrame = {
    val maxId: Long = existing.agg(coalesce(max(col(idCol)), lit(0L)))
      .head().getLong(0)
    val fresh = Dedup.antiAppend(
      incoming.select(col(sourceKeyCol)).distinct(), existing,
      Seq(sourceKeyCol))
    val newRows = withDenseIdScalable(
      fresh, Seq(col(sourceKeyCol)), idCol, maxId)
      .select(col(sourceKeyCol), col(idCol).cast(LongType))
    existing.select(col(sourceKeyCol), col(idCol).cast(LongType))
      .unionByName(newRows)
  }
}
