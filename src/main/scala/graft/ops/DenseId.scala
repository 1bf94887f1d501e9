package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    * Range-partition by the key, sort within partitions, then add
    * per-partition cumulative offsets (classic zipWithIndex layout). Costs
    * one extra light job to count partition sizes; every heavy step stays
    * fully parallel. Ties across partition boundaries are broken by the
    * range partitioner, so `orderBy` should be a unique key (it is for the
    * reference's UUID source ids). */
  def withDenseIdScalable(df: DataFrame, orderBy: Seq[Column],
                          idCol: String, offset: Long = 0L,
                          numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val rdd = sorted.rdd
    rdd.cache()
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val starts = counts.scanLeft(offset)(_ + _)
    val withId = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = starts(i)
      it.map { r => n += 1; Row.fromSeq(r.toSeq :+ n) }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val out = spark.createDataFrame(withId, schema)
    rdd.unpersist(false)
    out
  }

  /** M1 composite: extend an existing (sourceKey → id) map with ids for the
    * not-yet-mapped keys of `incoming`, first-writer-wins, appended after
    * the current max id. Mirrors the reference's
    * `INSERT ... SELECT nextval(seq) ... WHERE NOT IN (SELECT source_id)`
    * (enhanced_synthea_to_omop.py:770-777). */
  def extendIdMap(existing: DataFrame, incoming: DataFrame,
                  sourceKeyCol: String, idCol: String): DataFrame = {
    val maxId: Long = existing.agg(coalesce(max(col(idCol)), lit(0L)))
      .head().getLong(0)
    val fresh = Dedup.antiAppend(
      incoming.select(col(sourceKeyCol)).distinct(), existing,
      Seq(sourceKeyCol))
    val newRows = withDenseIdWindow(
      fresh, Seq(col(sourceKeyCol)), idCol, maxId)
      .select(col(sourceKeyCol), col(idCol).cast(LongType))
    existing.select(col(sourceKeyCol), col(idCol).cast(LongType))
      .unionByName(newRows)
  }
}
