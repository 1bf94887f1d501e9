package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Literal demographic lookup tables (SURVEY.md §2.1 S9), values verbatim
  * from the reference (python/enhanced_synthea_to_omop.py:585-625;
  * sql/staging/synthea-omop-staging.sql:55-79). Broadcast at join sites. */
object Lookups {

  def gender(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("M", 8507L), ("F", 8532L), ("MALE", 8507L), ("FEMALE", 8532L),
      ("male", 8507L), ("female", 8532L), ("m", 8507L), ("f", 8532L)
    ).toDF("source_gender", "gender_concept_id")
  }

  def race(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("white", 8527L), ("black", 8516L), ("asian", 8515L),
      ("native", 8657L), ("other", 8522L),
      ("WHITE", 8527L), ("BLACK", 8516L), ("ASIAN", 8515L),
      ("NATIVE", 8657L), ("OTHER", 8522L)
    ).toDF("source_race", "race_concept_id")
  }

  def ethnicity(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("hispanic", 38003563L), ("nonhispanic", 38003564L),
      ("HISPANIC", 38003563L), ("NONHISPANIC", 38003564L)
    ).toDF("source_ethnicity", "ethnicity_concept_id")
  }
}
