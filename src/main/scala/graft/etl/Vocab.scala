package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ConceptMap

/** Vocabulary concept mapping (SURVEY.md §2.3 J7–J9), the reference's
  * 3-stage UPDATE chain (etl_pipeline/etl_concept_mapping.py:136-180)
  * re-expressed functionally:
  *
  *   1. source concept: concept_code = source_value, vocabulary match
  *   2. standard concept via 'Maps to' relationship traversal (J8)
  *   3. fallback: direct standard-concept code match for rows still 0
  *
  * Each stage is a left join + coalesce threading a NEW DataFrame (no
  * mutation; stage N sees stage N−1's effects, SURVEY §7.4 risk 7). The
  * concept table (~500k rows, enhanced_vocabulary_loader.py:75) broadcasts
  * at default thresholds; at bigger vocab scale Catalyst shifts to a
  * shuffled hash join on the code column, which is the right plan.
  */
object Vocab {

  /** Load OMOP vocabulary tables from TSV (CONCEPT.csv etc. are
    * tab-separated in OMOP distributions). */
  def loadConcept(spark: SparkSession, path: String): DataFrame =
    Ingest.readVocabTsv(spark, path).select(
      // try_cast: a malformed id in a vocab distribution becomes a
      // droppable NULL row instead of an ANSI CAST error killing the load
      // (the reference's loader also skips bad rows while cleaning,
      // enhanced_vocabulary_loader.py:700-760)
      col("concept_id").try_cast("long").as("concept_id"),
      col("concept_name"),
      col("domain_id"),
      col("vocabulary_id"),
      col("standard_concept"),
      col("concept_code"),
      col("invalid_reason"))
      .filter(col("concept_id").isNotNull)

  def loadConceptRelationship(spark: SparkSession, path: String): DataFrame =
    Ingest.readVocabTsv(spark, path).select(
      col("concept_id_1").try_cast("long").as("concept_id_1"),
      col("concept_id_2").try_cast("long").as("concept_id_2"),
      col("relationship_id"))
      .filter(col("concept_id_1").isNotNull && col("concept_id_2").isNotNull)

  /** Apply the 3-stage mapping to one domain table.
    *
    * @param table          domain rows with `sourceValueCol` and the two
    *                       concept columns pre-initialized to 0
    * @param vocabularyId   e.g. "SNOMED", "RxNorm", "LOINC"
    * @param domainId       e.g. "Condition", "Drug", "Procedure"
    */
  def mapDomain(table: DataFrame, concept: DataFrame, rel: DataFrame,
                sourceValueCol: String, sourceConceptCol: String,
                targetConceptCol: String, vocabularyId: String,
                domainId: String): DataFrame = {
    // stage 1: source concept by exact code in the vocabulary
    val byCode = concept
      .filter(col("vocabulary_id") === vocabularyId)
      .select(col("concept_code").as(sourceValueCol),
        col("concept_id").as("__src_concept"))
    val s1 = table
      .join(broadcast(byCode.dropDuplicates(sourceValueCol)),
        Seq(sourceValueCol), "left")
      .withColumn(sourceConceptCol, coalesce(col("__src_concept"), lit(0L)))
      .drop("__src_concept")

    // stage 2: standard concept via Maps-to traversal from the source
    // concept (J8)
    val mapsTo = ConceptMap.mapsToStandard(rel, concept)
      .filter(col("domain_id") === domainId)
      .select(col("source_concept_id").as(sourceConceptCol),
        col("standard_concept_id").as("__std_concept"))
    val s2 = s1
      .join(broadcast(mapsTo.dropDuplicates(sourceConceptCol)),
        Seq(sourceConceptCol), "left")
      .withColumn(targetConceptCol, coalesce(col("__std_concept"), lit(0L)))
      .drop("__std_concept")

    // stage 3: fallback direct standard-code match for still-unmapped rows
    val standardByCode = concept
      .filter(col("vocabulary_id") === vocabularyId &&
        col("standard_concept") === "S" && col("domain_id") === domainId)
      .select(col("concept_code").as(sourceValueCol),
        col("concept_id").as("__direct_concept"))
    s2.join(broadcast(standardByCode.dropDuplicates(sourceValueCol)),
        Seq(sourceValueCol), "left")
      .withColumn(targetConceptCol,
        when(col(targetConceptCol) === 0,
          coalesce(col("__direct_concept"), lit(0L)))
          .otherwise(col(targetConceptCol)))
      .drop("__direct_concept")
  }

  /** Mapping-rate stats per the reference's post-mapping report
    * (etl_concept_mapping.py:183-189). */
  def mappingStats(table: DataFrame, targetConceptCol: String): DataFrame =
    table.agg(
      count(lit(1)).as("total"),
      sum(when(col(targetConceptCol) > 0, 1).otherwise(0)).as("mapped"),
      sum(when(col(targetConceptCol) === 0, 1).otherwise(0)).as("unmapped"))
}
