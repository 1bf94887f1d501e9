package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.SafeCast._

/** Bronze→typed layer (SURVEY.md §2.2): regex-guarded casts of the
  * all-string Synthea tables, mirroring
  * sql/synthea_typing/synthea-typedtables-transformation.sql. Invalid
  * values become NULL (never errors) — the reference's universal
  * dirty-data contract. Pure per-row projections: no shuffle, fully
  * codegen'd, scan-speed at any scale.
  */
object Typing {

  /** patients (synthea-typedtables-transformation.sql:663-701). */
  def patients(raw: DataFrame): DataFrame =
    raw.select(
      safeUuid(col("Id")).as("id"),
      safeDate(col("BIRTHDATE")).as("birthdate"),
      safeDate(col("DEATHDATE")).as("deathdate"),
      enumCast(col("GENDER"), Seq("M", "F")).as("gender"),
      enumCast(col("RACE"),
        Seq("white", "black", "asian", "hawaiian", "native", "other"))
        .as("race"),
      enumCast(col("ETHNICITY"), Seq("hispanic", "nonhispanic"))
        .as("ethnicity"),
      enumCast(col("MARITAL"), Seq("M", "S", "D", "W")).as("marital"),
      col("GENDER").as("gender_source"),
      col("RACE").as("race_source"),
      col("ETHNICITY").as("ethnicity_source"))

  /** encounters (:103-160 of the typing SQL; cost columns NUMERIC). */
  def encounters(raw: DataFrame): DataFrame =
    raw.select(
      safeUuid(col("Id")).as("id"),
      safeTimestamp(col("START")).as("start_ts"),
      safeTimestamp(col("STOP")).as("stop_ts"),
      safeUuid(col("PATIENT")).as("patient"),
      lower(col("ENCOUNTERCLASS")).as("encounterclass"),
      col("CODE").as("code"),
      col("DESCRIPTION").as("description"),
      safeNumeric(col("BASE_ENCOUNTER_COST"), DecimalType(10, 2))
        .as("base_encounter_cost"),
      safeNumeric(col("TOTAL_CLAIM_COST"), DecimalType(10, 2))
        .as("total_claim_cost"),
      safeNumeric(col("PAYER_COVERAGE"), DecimalType(10, 2))
        .as("payer_coverage"))

  /** conditions (:297-324). */
  def conditions(raw: DataFrame): DataFrame =
    raw.select(
      safeDate(col("START")).as("start_date"),
      safeDate(col("STOP")).as("stop_date"),
      safeUuid(col("PATIENT")).as("patient"),
      safeUuid(col("ENCOUNTER")).as("encounter"),
      col("CODE").as("code"),
      col("DESCRIPTION").as("description"))

  /** medications (:483-518; cost columns NUMERIC, dispenses INT — they
    * feed the Drug block of transform_cost.sql:64-121). */
  def medications(raw: DataFrame): DataFrame =
    raw.select(
      safeTimestamp(col("START")).as("start_ts"),
      safeTimestamp(col("STOP")).as("stop_ts"),
      safeUuid(col("PATIENT")).as("patient"),
      safeUuid(col("ENCOUNTER")).as("encounter"),
      col("CODE").as("code"),
      col("DESCRIPTION").as("description"),
      safeNumeric(col("BASE_COST"), DecimalType(10, 2)).as("base_cost"),
      safeNumeric(col("PAYER_COVERAGE"), DecimalType(10, 2))
        .as("payer_coverage"),
      safeInt(col("DISPENSES")).as("dispenses"),
      safeNumeric(col("TOTALCOST"), DecimalType(10, 2)).as("total_cost"))

  /** procedures (:451-477; base_cost NUMERIC — feeds the Procedure block
    * of transform_cost.sql:123-180). */
  def procedures(raw: DataFrame): DataFrame =
    raw.select(
      safeTimestamp(col("START")).as("start_ts"),
      safeTimestamp(col("STOP")).as("stop_ts"),
      safeUuid(col("PATIENT")).as("patient"),
      safeUuid(col("ENCOUNTER")).as("encounter"),
      col("CODE").as("code"),
      col("DESCRIPTION").as("description"),
      safeNumeric(col("BASE_COST"), DecimalType(10, 2)).as("base_cost"))

  /** observations (:606-631): VALUE stays text; the measurement/observation
    * split types it downstream (M5). */
  def observations(raw: DataFrame): DataFrame =
    raw.select(
      safeTimestamp(col("DATE")).as("obs_ts"),
      safeUuid(col("PATIENT")).as("patient"),
      safeUuid(col("ENCOUNTER")).as("encounter"),
      col("CODE").as("code"),
      col("DESCRIPTION").as("description"),
      col("VALUE").as("value"),
      col("UNITS").as("units"))
}
