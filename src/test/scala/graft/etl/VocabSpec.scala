package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class VocabSpec extends SparkSpecBase {
  import spark.implicits._

  /** Tiny OMOP-shaped vocabulary: 44054006 (SNOMED source, non-standard)
    * Maps-to 201826 (standard); 38341003 has no relationship but IS
    * standard itself (stage-3 fallback); 99999 is unknown. */
  private lazy val vocabDir = {
    val d = Files.createTempDirectory("vocab").toString
    Files.writeString(java.nio.file.Paths.get(s"$d/CONCEPT.csv"),
      Seq(
        "concept_id\tconcept_name\tdomain_id\tvocabulary_id\tconcept_class_id\tstandard_concept\tconcept_code\tinvalid_reason",
        "1001\tDiabetes src\tCondition\tSNOMED\tClinical Finding\t\t44054006\t",
        "201826\tType 2 DM\tCondition\tSNOMED\tClinical Finding\tS\t201826X\t",
        "1002\tHypertension\tCondition\tSNOMED\tClinical Finding\tS\t38341003\t"
      ).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$d/CONCEPT_RELATIONSHIP.csv"),
      Seq(
        "concept_id_1\tconcept_id_2\trelationship_id\tvalid_start_date\tvalid_end_date\tinvalid_reason",
        "1001\t201826\tMaps to\t2000-01-01\t2099-12-31\t"
      ).mkString("\n"))
    d
  }

  test("3-stage mapping: Maps-to, fallback-standard, and unmapped → 0") {
    val concept = Vocab.loadConcept(spark, s"$vocabDir/CONCEPT.csv")
    val rel = Vocab.loadConceptRelationship(spark,
      s"$vocabDir/CONCEPT_RELATIONSHIP.csv")
    val table = Seq(
      (1L, "44054006"), // → src 1001 → Maps-to → 201826 (stage 2)
      (2L, "38341003"), // no rel; direct standard match → 1002 (stage 3)
      (3L, "99999")     // unknown → 0
    ).toDF("condition_occurrence_id", "condition_source_value")
      .withColumn("condition_source_concept_id", lit(0L))
      .withColumn("condition_concept_id", lit(0L))

    val mapped = Vocab.mapDomain(table, concept, rel,
      "condition_source_value", "condition_source_concept_id",
      "condition_concept_id", "SNOMED", "Condition")
      .collect()
      .map(r => r.getAs[Long]("condition_occurrence_id") ->
        (r.getAs[Long]("condition_source_concept_id"),
         r.getAs[Long]("condition_concept_id"))).toMap

    assert(mapped(1L) == (1001L, 201826L))
    assert(mapped(2L) == (1002L, 1002L))
    assert(mapped(3L) == (0L, 0L))
  }

  test("mappingStats reports the reference's mapped/unmapped rollup") {
    val concept = Vocab.loadConcept(spark, s"$vocabDir/CONCEPT.csv")
    val rel = Vocab.loadConceptRelationship(spark,
      s"$vocabDir/CONCEPT_RELATIONSHIP.csv")
    val table = Seq((1L, "44054006"), (2L, "99999"))
      .toDF("id", "condition_source_value")
      .withColumn("src", lit(0L)).withColumn("tgt", lit(0L))
    val mapped = Vocab.mapDomain(table, concept, rel,
      "condition_source_value", "src", "tgt", "SNOMED", "Condition")
    val stats = Vocab.mappingStats(mapped, "tgt").head()
    assert(stats.getAs[Long]("total") == 2)
    assert(stats.getAs[Long]("mapped") == 1)
    assert(stats.getAs[Long]("unmapped") == 1)
  }
}
