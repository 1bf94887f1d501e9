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
      col("concept_class_id"),
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

  /** Load omop.concept_ancestor (enhanced_vocabulary_loader.py:492-498 DDL;
    * the OMOP distribution ships it as CONCEPT_ANCESTOR.csv TSV). The
    * transitive-closure hierarchy table: one row per (ancestor, descendant)
    * pair with min/max separation levels. ~500k rows in the reference's
    * estimate (enhanced_vocabulary_loader.py:78) — broadcastable. */
  def loadConceptAncestor(spark: SparkSession, path: String): DataFrame =
    Ingest.readVocabTsv(spark, path).select(
      col("ancestor_concept_id").try_cast("long").as("ancestor_concept_id"),
      col("descendant_concept_id").try_cast("long")
        .as("descendant_concept_id"),
      col("min_levels_of_separation").try_cast("int")
        .as("min_levels_of_separation"),
      col("max_levels_of_separation").try_cast("int")
        .as("max_levels_of_separation"))
      .filter(col("ancestor_concept_id").isNotNull &&
        col("descendant_concept_id").isNotNull)

  /** Load omop.concept_synonym (enhanced_vocabulary_loader.py:564-570 DDL):
    * alternate names per concept, used for name-based lookups. */
  def loadConceptSynonym(spark: SparkSession, path: String): DataFrame =
    Ingest.readVocabTsv(spark, path).select(
      col("concept_id").try_cast("long").as("concept_id"),
      col("concept_synonym_name"),
      col("language_concept_id").try_cast("long")
        .as("language_concept_id"))
      .filter(col("concept_id").isNotNull)

  /** Ancestor rollup — how real OMOP users aggregate drugs to classes
    * (e.g. RxNorm ingredients → ATC classes): domain rows join
    * concept_ancestor on descendant = their concept, restricted to
    * ancestors of the requested concept class, then count per ancestor.
    *
    * Plan shape: the hierarchy slice (ancestors of one class) is a small
    * filtered projection → broadcast; the fact table never shuffles on the
    * hierarchy — one hash-agg on ancestor_concept_id whose shuffle is
    * ∝ distinct classes, not rows. */
  def rollupByAncestor(table: DataFrame, conceptCol: String,
                       ancestor: DataFrame, concept: DataFrame,
                       ancestorClassId: String): DataFrame = {
    val classConcepts = concept
      .filter(col("concept_class_id") === ancestorClassId)
      .select(col("concept_id").as("ancestor_concept_id"),
        col("concept_name").as("ancestor_concept_name"))
    val slice = ancestor
      .join(broadcast(classConcepts), Seq("ancestor_concept_id"))
      .select(col("ancestor_concept_id"), col("ancestor_concept_name"),
        col("descendant_concept_id"))
    table
      .join(broadcast(slice),
        col(conceptCol) === col("descendant_concept_id"))
      .groupBy(col("ancestor_concept_id"), col("ancestor_concept_name"))
      .agg(count(lit(1)).as("record_count"),
        countDistinct(col("person_id")).as("person_count"))
  }

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
    // stage 1: source concept by exact code in the vocabulary.
    // Lookup dedup is firstRowPerGroup with a concept-id tiebreak, NOT
    // dropDuplicates: a code carried by several concept rows (e.g. a
    // valid and a deprecated concept sharing the code) would otherwise
    // resolve to whichever row a partition delivered first — concept
    // assignments flipping between reruns, against the pipeline's
    // byte-stable contract. Same below for the Maps-to and direct-code
    // tiers.
    val byCode = concept
      .filter(col("vocabulary_id") === vocabularyId)
      .select(col("concept_code").as(sourceValueCol),
        col("concept_id").as("__src_concept"))
    val s1 = table
      .join(broadcast(graft.ops.Dedup.firstRowPerGroup(byCode,
          Seq(col(sourceValueCol)), Seq(col("__src_concept").asc))),
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
      .join(broadcast(graft.ops.Dedup.firstRowPerGroup(mapsTo,
          Seq(col(sourceConceptCol)), Seq(col("__std_concept").asc))),
        Seq(sourceConceptCol), "left")
      .withColumn(targetConceptCol, coalesce(col("__std_concept"), lit(0L)))
      .drop("__std_concept")

    // stage 3: fallback direct standard-code match for still-unmapped rows
    val standardByCode = concept
      .filter(col("vocabulary_id") === vocabularyId &&
        col("standard_concept") === "S" && col("domain_id") === domainId)
      .select(col("concept_code").as(sourceValueCol),
        col("concept_id").as("__direct_concept"))
    s2.join(broadcast(graft.ops.Dedup.firstRowPerGroup(standardByCode,
          Seq(col(sourceValueCol)), Seq(col("__direct_concept").asc))),
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
