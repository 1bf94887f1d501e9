package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Update-join / staged concept mapping (SURVEY.md §2.3 J9, §2.7 M2).
  *
  * The reference backfills concept ids with three sequential `UPDATE ... FROM`
  * stages — direct code match, "Maps to" traversal, fallback standard match —
  * each seeing the previous stage's effects
  * (etl_pipeline/etl_concept_mapping.py:136-180). Spark has no UPDATE;
  * the functional re-expression threads a new DataFrame through each stage
  * (left join + coalesce), which is exactly what Catalyst wants: each stage
  * is a broadcastable lookup join, nothing is mutated, and the whole chain
  * stays one lazy lineage (SURVEY.md §7.4 risk 7).
  */
object ConceptMap {

  /** One update-join stage: where `df.targetCol` is still unset (null or 0),
    * fill it from `lookup.valueCol` joined on `keys`; else keep it.
    *
    * A key mapping to SEVERAL lookup values (OMOP "Maps to" is
    * legitimately 1-to-many) resolves to the LOWEST value — a
    * deterministic pick via firstRowPerGroup, where dropDuplicates would
    * keep whichever row a partition surfaced first and flip concept
    * assignments between reruns (the byte-stable contract Vocab.mapDomain
    * enforces the same way). */
  def updateJoinStage(df: DataFrame, lookup: DataFrame,
                      keys: Seq[String], targetCol: String,
                      lookupValueCol: String,
                      broadcastLookup: Boolean = true): DataFrame = {
    val lk0 = Dedup.firstRowPerGroup(
      lookup.select(
        (keys.map(col) :+ col(lookupValueCol).as("__mapped")): _*),
      keys.map(col), Seq(col("__mapped").asc_nulls_last))
    val lk = if (broadcastLookup) broadcast(lk0) else lk0
    val unset = col(targetCol).isNull || col(targetCol) === 0
    df.join(lk, keys, "left")
      .withColumn(targetCol,
        when(unset, coalesce(col("__mapped"), col(targetCol)))
          .otherwise(col(targetCol)))
      .drop("__mapped")
  }

  /** Full 3-stage mapping: stage lookups applied in order, unmapped → 0
    * (reference COALESCE-to-0 contract, enhanced_synthea_to_omop.py:836). */
  def stagedMapping(df: DataFrame,
                    stages: Seq[(DataFrame, Seq[String], String)],
                    targetCol: String): DataFrame = {
    val mapped = stages.foldLeft(
      df.withColumn(targetCol, lit(null).cast("long"))) {
      case (acc, (lookup, keys, valueCol)) =>
        updateJoinStage(acc, lookup, keys, targetCol, valueCol)
    }
    mapped.withColumn(targetCol, coalesce(col(targetCol), lit(0L)))
  }

  /** J8: two-hop "Maps to" traversal — source concept → relationship
    * (relationship_id = 'Maps to') → standard concept
    * (etl_pipeline/etl_concept_mapping.py:153-165). Vocab tables are
    * ~500k rows (enhanced_vocabulary_loader.py:75) — broadcastable at
    * default thresholds; at larger vocab scale Catalyst falls back to
    * shuffle hash join on concept_id, which is the right plan. */
  def mapsToStandard(rel: DataFrame, concept: DataFrame): DataFrame =
    rel.filter(col("relationship_id") === "Maps to")
      .join(concept,
        rel("concept_id_2") === concept("concept_id") &&
          concept("standard_concept") === "S" &&
          concept("invalid_reason").isNull)
      .select(rel("concept_id_1").as("source_concept_id"),
        concept("concept_id").as("standard_concept_id"),
        concept("domain_id"))
}
