package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Achilles-style analytics (SURVEY.md §2.4 A9/A10): the stratified-count
  * and distribution analyses the reference runs via OHDSI Achilles
  * (query_achilles_results.sh:144-230, achilles_config.json), re-expressed
  * as DataFrame aggregations producing the standard results shape
  * (analysis_id, stratum_1..5, count_value) and the distribution shape
  * (analysis_id, min/p10/p25/median/p75/p90/max).
  *
  * Each analysis is one groupBy — map-side partial agg, shuffle ∝ strata
  * cardinality, never input size. The union of analyses stays lazy; one
  * write materializes the whole results table.
  */
object Achilles {

  private val resultCols = Seq("analysis_id", "stratum_1", "stratum_2",
    "stratum_3", "stratum_4", "stratum_5", "count_value")

  private def result(analysisId: Int, df: DataFrame,
                     strata: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val padded = strata.padTo(5, lit(null).cast("string"))
    df.groupBy(strata: _*)
      .agg(count(lit(1)).as("count_value"))
      .select(lit(analysisId).as("analysis_id") +:
        padded.zipWithIndex.map { case (c, i) =>
          c.cast("string").as(s"stratum_${i + 1}")
        } :+ col("count_value"): _*)
      .select(resultCols.map(col): _*)
  }

  /** Analysis 1: number of persons. */
  def a1NumPersons(person: DataFrame): DataFrame =
    result(1, person, Seq(lit("")))

  /** Analysis 2: persons by gender concept. */
  def a2ByGender(person: DataFrame): DataFrame =
    result(2, person, Seq(col("gender_concept_id")))

  /** Analysis 3: persons by year of birth. */
  def a3ByYearOfBirth(person: DataFrame): DataFrame =
    result(3, person, Seq(col("year_of_birth")))

  /** Analysis 4: persons by race concept. */
  def a4ByRace(person: DataFrame): DataFrame =
    result(4, person, Seq(col("race_concept_id")))

  /** Analysis 200/201-shape: visits by visit concept. */
  def a200ByVisitConcept(visit: DataFrame): DataFrame =
    result(200, visit, Seq(col("visit_concept_id")))

  /** Analysis 400-shape: conditions by concept. */
  def a400ByConditionConcept(condition: DataFrame): DataFrame =
    result(400, condition, Seq(col("condition_concept_id")))

  /** Analysis 101-shape: persons by age at first observation period. */
  def a101AgeAtFirstObs(person: DataFrame,
                        observationPeriod: DataFrame): DataFrame =
    result(101,
      person.join(
        observationPeriod.groupBy(col("person_id"))
          .agg(min(col("observation_period_start_date")).as("first_obs")),
        "person_id")
        .withColumn("age", year(col("first_obs")) - col("year_of_birth")),
      Seq(col("age")))

  /** Analysis 211-shape: distribution of visit length in days (A9 —
    * exact percentiles for oracle parity; percentile_approx at scale). */
  def a211VisitLength(visit: DataFrame): DataFrame =
    visit
      .select(datediff(col("visit_end_date"), col("visit_start_date"))
        .cast("double").as("len"))
      .agg(
        lit(211).as("analysis_id"),
        count(lit(1)).as("count_value"),
        min(col("len")).as("min_value"),
        expr("percentile(len, 0.10)").as("p10_value"),
        expr("percentile(len, 0.25)").as("p25_value"),
        expr("percentile(len, 0.50)").as("median_value"),
        expr("percentile(len, 0.75)").as("p75_value"),
        expr("percentile(len, 0.90)").as("p90_value"),
        max(col("len")).as("max_value"))

  /** Analysis 900-shape: drug eras by drug concept
    * (query_achilles_results.sh drug-era block). */
  def a900ByDrugEraConcept(drugEra: DataFrame): DataFrame =
    result(900, drugEra, Seq(col("drug_concept_id")))

  /** Analysis 906-shape: distribution of drug-era length in days. */
  def a906DrugEraLength(drugEra: DataFrame): DataFrame =
    drugEra
      .select(datediff(col("drug_era_end_date"),
        col("drug_era_start_date")).cast("double").as("len"))
      .agg(
        lit(906).as("analysis_id"),
        count(lit(1)).as("count_value"),
        min(col("len")).as("min_value"),
        expr("percentile(len, 0.10)").as("p10_value"),
        expr("percentile(len, 0.25)").as("p25_value"),
        expr("percentile(len, 0.50)").as("median_value"),
        expr("percentile(len, 0.75)").as("p75_value"),
        expr("percentile(len, 0.90)").as("p90_value"),
        max(col("len")).as("max_value"))

  /** Analysis 1000-shape: condition eras by condition concept. */
  def a1000ByConditionEraConcept(conditionEra: DataFrame): DataFrame =
    result(1000, conditionEra, Seq(col("condition_concept_id")))

  /** Full default-analyses run → one stacked results table. Era inputs
    * are optional so pre-era pipelines keep their analysis set. */
  def run(person: DataFrame, visit: DataFrame, condition: DataFrame,
          drugEra: Option[DataFrame] = None,
          conditionEra: Option[DataFrame] = None): DataFrame =
    (Seq(
      a1NumPersons(person), a2ByGender(person), a3ByYearOfBirth(person),
      a4ByRace(person), a200ByVisitConcept(visit),
      a400ByConditionConcept(condition)
    ) ++ drugEra.map(a900ByDrugEraConcept)
      ++ conditionEra.map(a1000ByConditionEraConcept)
    ).reduce(_ unionByName _)
}
