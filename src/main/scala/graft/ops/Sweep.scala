package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Union sweeps + span aggregation (SURVEY.md §2.4 A2, §2.6 U1).
  *
  * The reference computes observation periods as min/max event date per
  * person over a 5–8-way UNION ALL of per-domain projections
  * (enhanced_synthea_to_omop.py:2181-2200,
  * sql/etl/create_observation_period_v2.sql:10-45). In Spark the union is
  * free (no shuffle — partitions are concatenated) and the min/max groupBy
  * does partial map-side aggregation, so the shuffle carries one row per
  * (key, partition), not the raw events. This is the shape that survives a
  * 100× scale-up: cost ∝ distinct keys, not input rows.
  */
object Sweep {

  /** U1: align-by-name union of per-domain (key, start, end) projections. */
  def unionSweep(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _)

  /** A2: min(start)/max(end) span per key over the unioned sweep. */
  def spanPerKey(sweep: DataFrame, keyCol: String,
                 startCol: String, endCol: String): DataFrame =
    sweep.groupBy(col(keyCol))
      .agg(min(col(startCol)).as("period_start"),
           max(coalesce(col(endCol), col(startCol))).as("period_end"))
}
