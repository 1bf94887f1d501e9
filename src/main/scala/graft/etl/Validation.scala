package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-ETL validation suite (SURVEY.md §5) — the reference's real
  * correctness net (etl_pipeline/etl_validation.py), re-expressed as
  * DataFrame checks that return one (check_name, failed_count) row each,
  * stacked U2-style. A clean run returns all zeros. Each check is a
  * single aggregation/anti-join — no driver-side row iteration.
  */
object Validation {

  case class Check(name: String, failedCount: Long)

  /** Orphaned FKs: child rows whose parent key is missing
    * (etl_validation.py:236-246). */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): Long =
    child.select(col(childKey)).filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
      .count()

  /** Date sanity: end before start / future dates
    * (etl_validation.py:313-330). */
  def endBeforeStart(df: DataFrame, startCol: String, endCol: String): Long =
    df.filter(col(endCol) < col(startCol)).count()

  /** Domain check: gender concept ∈ {8507, 8532, 0}
    * (etl_validation.py:369-401). */
  def invalidGender(person: DataFrame): Long =
    person.filter(!col("gender_concept_id").isin(8507L, 8532L, 0L)).count()

  /** Mapping-rate stats: unmapped (=0) concept counts + pct per table
    * (A4; enhanced_synthea_to_omop.py:2418-2453). */
  def mappingRate(df: DataFrame, conceptCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("total"),
      sum(when(col(conceptCol) === 0, 1).otherwise(0)).as("unmapped"))
      .select(col("total"), col("unmapped"),
        round(lit(100.0) * col("unmapped") /
          nullif(col("total"), lit(0)), 2).as("unmapped_pct"))

  /** Era-derivation invariants: an era must be well-ordered, belong to a
    * known person, and contain at least one contributing row. */
  def eraChecks(prefix: String, era: DataFrame, person: DataFrame,
                startCol: String, endCol: String,
                countCol: String): Seq[Check] = Seq(
    Check(s"${prefix}_end_before_start",
      endBeforeStart(era, startCol, endCol)),
    Check(s"${prefix}_orphan_person",
      orphans(era, "person_id", person, "person_id")),
    Check(s"${prefix}_empty",
      era.filter(col(countCol) < 1).count()))

  /** Full report over a built OMOP set. */
  def report(spark: SparkSession, person: DataFrame, visit: DataFrame,
             condition: DataFrame, measurement: DataFrame,
             observation: DataFrame,
             drugEra: Option[DataFrame] = None,
             conditionEra: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    (drugEra.toSeq.flatMap(e => eraChecks("drug_era", e, person,
      "drug_era_start_date", "drug_era_end_date", "drug_exposure_count")) ++
      conditionEra.toSeq.flatMap(e => eraChecks("condition_era", e, person,
        "condition_era_start_date", "condition_era_end_date",
        "condition_occurrence_count")) ++
    Seq(
      Check("visit_orphan_person",
        orphans(visit, "person_id", person, "person_id")),
      Check("condition_orphan_person",
        orphans(condition, "person_id", person, "person_id")),
      Check("condition_orphan_visit",
        orphans(condition, "visit_occurrence_id", visit,
          "visit_occurrence_id")),
      Check("measurement_orphan_person",
        orphans(measurement, "person_id", person, "person_id")),
      Check("observation_orphan_person",
        orphans(observation, "person_id", person, "person_id")),
      Check("visit_end_before_start",
        endBeforeStart(visit, "visit_start_date", "visit_end_date")),
      Check("condition_end_before_start",
        endBeforeStart(condition, "condition_start_date",
          "condition_end_date")),
      Check("invalid_gender_concept", invalidGender(person)),
      Check("duplicate_person_ids",
        person.groupBy("person_id").count().filter(col("count") > 1).count())
    )).toDF("check_name", "failed_count")
  }
}
