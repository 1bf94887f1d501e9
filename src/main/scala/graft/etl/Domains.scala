package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Dedup, DenseId, SafeCast, Sweep}

/** Silver→gold OMOP domain transforms (SURVEY.md §2.3–§2.7), re-expressed
  * as pure DataFrame functions. Each takes typed inputs + the id maps and
  * returns the OMOP table; idempotent re-runs use antiAppend against the
  * existing table (the reference's NOT IN guards). The id maps are the
  * only global coordination — everything else is broadcast-join + project.
  */
object Domains {

  /** person_map / visit_map: UUID → dense int (SURVEY §1.4, W2/M1;
    * enhanced_synthea_to_omop.py:770-777,935-944). */
  def buildIdMap(spark: SparkSession, existing: Option[DataFrame],
                 source: DataFrame, srcCol: String, idCol: String): DataFrame = {
    // explicit schema, not a reflection-derived Encoder: keeps the library
    // usable from REPL/embedded classloaders where runtime type reflection
    // for toDF breaks
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(srcCol,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType))))
    DenseId.extendIdMap(existing.getOrElse(empty),
      source.select(col(srcCol)).filter(col(srcCol).isNotNull),
      srcCol, idCol)
  }

  /** Closed-form dense-id bucket for the ETL's person-leading orderings:
    * person_id is [[buildIdMap]]'s dense 1..n output, so
    * floor((person_id−1)·P/n) is monotone along every (person_id, …)
    * ordering and balanced across persons — [[DenseId]] then skips its
    * bounds-sampling pass entirely (one narrow counts pass + the single
    * full-width pass). */
  private def personBucket(personCount: Option[Long],
                           in: DataFrame): Option[Column] =
    personCount.map { n =>
      val parts = math.min(1024,
        in.sparkSession.sessionState.conf.numShufflePartitions)
      DenseId.denseLeadingIdBucket(col("person_id"), n, parts)
    }

  /** omop.person (enhanced_synthea_to_omop.py:786-859): demographic
    * lookups joined case-insensitively (broadcast), unmapped → 0, dense
    * person_id via map, idempotent. */
  def person(spark: SparkSession, typedPatients: DataFrame,
             personMap: DataFrame,
             existing: Option[DataFrame] = None): DataFrame = {
    val g = broadcast(Lookups.gender(spark)
      .withColumn("k", lower(col("source_gender")))
      .select(col("k"), col("gender_concept_id"))
      .dropDuplicates("k"))
    val r = broadcast(Lookups.race(spark)
      .withColumn("k", lower(col("source_race")))
      .select(col("k"), col("race_concept_id"))
      .dropDuplicates("k"))
    val e = broadcast(Lookups.ethnicity(spark)
      .withColumn("k", lower(col("source_ethnicity")))
      .select(col("k"), col("ethnicity_concept_id"))
      .dropDuplicates("k"))
    val out = typedPatients
      .join(broadcast(personMap), col("id") === col("source_patient_id"))
      .join(g, lower(col("gender_source")) === g("k"), "left")
      .join(r, lower(col("race_source")) === r("k"), "left")
      .join(e, lower(col("ethnicity_source")) === e("k"), "left")
      .select(
        col("person_id"),
        coalesce(col("gender_concept_id"), lit(0L)).as("gender_concept_id"),
        year(col("birthdate")).as("year_of_birth"),
        month(col("birthdate")).as("month_of_birth"),
        dayofmonth(col("birthdate")).as("day_of_birth"),
        col("birthdate").cast("timestamp").as("birth_datetime"),
        coalesce(col("race_concept_id"), lit(0L)).as("race_concept_id"),
        coalesce(col("ethnicity_concept_id"), lit(0L))
          .as("ethnicity_concept_id"),
        col("id").as("person_source_value"),
        col("gender_source").as("gender_source_value"),
        col("race_source").as("race_source_value"),
        col("ethnicity_source").as("ethnicity_source_value"))
    // deterministic survivor for duplicated source patient rows —
    // ALWAYS, not only on the incremental path: buildIdMap assigns one
    // person_id per distinct source id, so two identical source rows
    // would otherwise both emit person rows sharing that person_id on a
    // first run (existing = None, as EtlRunner calls it), tripping the
    // pipeline's own duplicate_person_ids validation. Rerun output is
    // byte-stable regardless of partitioning.
    val tiebreak = Seq(col("birth_datetime").asc_nulls_last,
      col("gender_source_value").asc_nulls_last,
      col("race_source_value").asc_nulls_last,
      col("ethnicity_source_value").asc_nulls_last)
    val deduped = Dedup.firstRowPerGroup(out, Seq(col("person_id")), tiebreak)
    existing.fold(deduped)(ex =>
      Dedup.antiAppendDeterministic(deduped, ex, Seq("person_id"), tiebreak))
  }

  /** ENCOUNTERCLASS → visit concept (transform_visit_occurrence_v2.sql:
    * 29-40; the broader v2 set incl. home/virtual/hospice). */
  val visitConcept: org.apache.spark.sql.Column = {
    val c = lower(col("encounterclass"))
    when(c === "inpatient", 9201L)
      .when(c.isin("ambulatory", "wellness", "outpatient", "office"), 9202L)
      .when(c.isin("emergency", "urgentcare"), 9203L)
      .when(c === "home", 581476L)
      .when(c === "virtual", 42898160L)
      .when(c === "hospice", 42898160L)
      .otherwise(0L)
  }

  /** omop.visit_occurrence (enhanced_synthea_to_omop.py:968-1016). */
  def visitOccurrence(typedEncounters: DataFrame, personMap: DataFrame,
                      visitMap: DataFrame): DataFrame =
    typedEncounters
      .join(broadcast(visitMap), col("id") === col("source_visit_id"))
      .join(broadcast(personMap), col("patient") === col("source_patient_id"))
      .select(
        col("visit_occurrence_id"),
        col("person_id"),
        visitConcept.as("visit_concept_id"),
        col("start_ts").cast("date").as("visit_start_date"),
        col("start_ts").as("visit_start_datetime"),
        col("stop_ts").cast("date").as("visit_end_date"),
        col("stop_ts").as("visit_end_datetime"),
        lit(32817L).as("visit_type_concept_id"), // EHR
        col("id").as("visit_source_value"))

  /** Shared event-domain shape: person/visit resolution + within-batch
    * dedup on the reference's NOT EXISTS key (J1/J4;
    * enhanced_synthea_to_omop.py:1102-1127 for conditions).
    *
    * `tiebreak` makes the SURVIVOR deterministic: rows agreeing on the
    * dedup key can still differ in non-key columns (a re-recorded
    * diagnosis with a different stop date), and a plain dropDuplicates
    * would leave those columns to partition order — reruns would not be
    * byte-stable, against the pipeline's determinism contract (the same
    * fix deviceExposure applies explicitly). */
  private def eventDomain(typed: DataFrame, personMap: DataFrame,
                          visitMap: DataFrame, dedupKeys: Seq[String],
                          tiebreak: Seq[Column]): DataFrame =
    Dedup.firstRowPerGroup(
      typed
        .join(broadcast(personMap),
          col("patient") === col("source_patient_id"))
        .join(broadcast(visitMap),
          col("encounter") === col("source_visit_id"), "left"),
      dedupKeys.map(col), tiebreak)

  /** omop.condition_occurrence (:1102-1150). */
  def conditionOccurrence(typedConditions: DataFrame, personMap: DataFrame,
                          visitMap: DataFrame,
                          personCount: Option[Long] = None): DataFrame =
    DenseId.withDenseIdScalable(
      eventDomain(typedConditions, personMap, visitMap,
        Seq("person_id", "encounter", "code"),
        Seq(col("start_date").asc_nulls_last,
          col("stop_date").asc_nulls_last)),
      Seq(col("person_id"), col("encounter"), col("code")),
      "condition_occurrence_id",
      bucketBy = personBucket(personCount, typedConditions))
      .select(
        col("condition_occurrence_id"),
        col("person_id"),
        lit(0L).as("condition_concept_id"), // staged mapping fills (J9)
        col("start_date").as("condition_start_date"),
        coalesce(col("stop_date"), col("start_date"))
          .as("condition_end_date"),
        lit(32020L).as("condition_type_concept_id"),
        col("visit_occurrence_id"),
        col("code").as("condition_source_value"))

  /** omop.drug_exposure (:1230-1290): default 30-day end date (P7,
    * enhanced_synthea_to_omop.py:1236-1238). */
  def drugExposure(typedMedications: DataFrame, personMap: DataFrame,
                   visitMap: DataFrame,
                   personCount: Option[Long] = None): DataFrame =
    drugExposureAndCost(typedMedications, personMap, visitMap,
      personCount)._1

  /** drug_exposure + its omop.cost Drug rows (transform_cost.sql:64-121)
    * off one shared dense-id'd frame: the two projections are lazy
    * slivers of the same lineage (each consumer's action re-derives it —
    * cheap narrow scans now that the id assignment is pass-based rather
    * than checkpoint-materialized).
    *
    * The reference attaches costs by re-joining medications_raw to
    * drug_exposure on (person_id, visit_occurrence_id) only — a fan-out
    * when a visit carries several drugs (every med row matches every
    * exposure of the visit). We keep the 1:1 intent: one cost row per
    * surviving exposure row, using the survivor's cost columns. Cost rows
    * carry no cost_id here — [[cost]] assigns one dense sequence across
    * all three domains, mirroring the reference's shared staging.cost_seq. */
  def drugExposureAndCost(typedMedications: DataFrame, personMap: DataFrame,
                          visitMap: DataFrame,
                          personCount: Option[Long] = None)
      : (DataFrame, DataFrame) = {
    val based = DenseId.withDenseIdScalable(
      eventDomain(typedMedications, personMap, visitMap,
        Seq("person_id", "encounter", "code", "start_ts"),
        Seq(col("stop_ts").asc_nulls_last)),
      Seq(col("person_id"), col("encounter"), col("code"), col("start_ts")),
      "drug_exposure_id",
      bucketBy = personBucket(personCount, typedMedications))
    val exposure = based
      .select(
        col("drug_exposure_id"),
        col("person_id"),
        lit(0L).as("drug_concept_id"),
        col("start_ts").cast("date").as("drug_exposure_start_date"),
        coalesce(col("stop_ts").cast("date"),
          date_add(col("start_ts").cast("date"), 30))
          .as("drug_exposure_end_date"),
        lit(32817L).as("drug_type_concept_id"),
        col("visit_occurrence_id"),
        col("code").as("drug_source_value"))
    // transform_cost.sql:91-97: total_charge = TOTALCOST, total_cost =
    // BASE_COST, paid_by_patient = TOTALCOST − PAYER_COVERAGE (decimal)
    val drugCost = based
      .filter(col("base_cost").isNotNull || col("total_cost").isNotNull ||
        col("payer_coverage").isNotNull)
      .select(
        col("drug_exposure_id").as("cost_event_id"),
        lit("Drug").as("cost_domain_id"),
        col("total_cost").as("total_charge"),
        col("base_cost").as("total_cost"),
        col("payer_coverage").as("total_paid"),
        col("payer_coverage").as("paid_by_payer"),
        (col("total_cost") - col("payer_coverage")).as("paid_by_patient"))
    (exposure, drugCost)
  }

  /** omop.procedure_occurrence (:1358-1400). */
  def procedureOccurrence(typedProcedures: DataFrame, personMap: DataFrame,
                          visitMap: DataFrame): DataFrame =
    procedureOccurrenceAndCost(typedProcedures, personMap, visitMap)._1

  /** procedure_occurrence + its omop.cost Procedure rows
    * (transform_cost.sql:123-180: total_charge = total_cost = BASE_COST;
    * the paid-side columns are NULL by reference contract — Synthea
    * procedures carry no payer split). Same one-pass sharing as
    * [[drugExposureAndCost]]. */
  def procedureOccurrenceAndCost(typedProcedures: DataFrame,
                                 personMap: DataFrame, visitMap: DataFrame,
                                 personCount: Option[Long] = None)
      : (DataFrame, DataFrame) = {
    val based = DenseId.withDenseIdScalable(
      eventDomain(typedProcedures, personMap, visitMap,
        Seq("person_id", "encounter", "code", "start_ts"),
        Seq(col("stop_ts").asc_nulls_last)),
      Seq(col("person_id"), col("encounter"), col("code"), col("start_ts")),
      "procedure_occurrence_id",
      bucketBy = personBucket(personCount, typedProcedures))
    val occurrence = based
      .select(
        col("procedure_occurrence_id"),
        col("person_id"),
        lit(0L).as("procedure_concept_id"),
        col("start_ts").cast("date").as("procedure_date"),
        col("start_ts").as("procedure_datetime"),
        lit(32817L).as("procedure_type_concept_id"),
        col("visit_occurrence_id"),
        col("code").as("procedure_source_value"))
    val nullMoney = lit(null).cast(DecimalType(10, 2))
    val procCost = based
      .filter(col("base_cost").isNotNull)
      .select(
        col("procedure_occurrence_id").as("cost_event_id"),
        lit("Procedure").as("cost_domain_id"),
        col("base_cost").as("total_charge"),
        col("base_cost").as("total_cost"),
        nullMoney.as("total_paid"),
        nullMoney.as("paid_by_payer"),
        nullMoney.as("paid_by_patient"))
    (occurrence, procCost)
  }

  /** omop.device_exposure (synthea-omop-ETL.sql:242-296): typed devices →
    * person (inner) / visit (left) map joins, UDI carried as
    * unique_device_id, start/stop timestamps projected to date+datetime,
    * type 44818707 ("Device Recorded from EHR"), concept mapped by the
    * reference's case-insensitive code prefix rule (ILIKE 'DEVICE123%' →
    * 4263759, else 0 until staged vocabulary mapping fills it). Dedup
    * mirrors the NOT EXISTS key (person, start datetime, code). */
  def deviceExposure(typedDevices: DataFrame, personMap: DataFrame,
                     visitMap: DataFrame,
                     personCount: Option[Long] = None): DataFrame =
    DenseId.withDenseIdScalable(
      // deterministic survivor on the reference's NOT EXISTS key: rows
      // agreeing on (person, start, code) but differing in encounter or
      // stop (re-recorded device across same-instant encounters) must
      // not leave visit/end columns to partition order
      Dedup.firstRowPerGroup(
        typedDevices
          .join(broadcast(personMap),
            col("patient") === col("source_patient_id"))
          .join(broadcast(visitMap),
            col("encounter") === col("source_visit_id"), "left"),
        Seq(col("person_id"), col("start_time"), col("code")),
        Seq(col("encounter").asc_nulls_last,
          col("stop_time").asc_nulls_last)),
      Seq(col("person_id"), col("start_time"), col("code")),
      "device_exposure_id",
      bucketBy = personBucket(personCount, typedDevices))
      .select(
        col("device_exposure_id"),
        col("person_id"),
        when(lower(col("code")).like("device123%"), 4263759L)
          .otherwise(0L).as("device_concept_id"),
        col("start_time").cast("date").as("device_exposure_start_date"),
        col("start_time").as("device_exposure_start_datetime"),
        col("stop_time").cast("date").as("device_exposure_end_date"),
        col("stop_time").as("device_exposure_end_datetime"),
        lit(44818707L).as("device_type_concept_id"),
        col("udi").as("unique_device_id"),
        col("visit_occurrence_id"),
        col("code").as("device_source_value"))

  /** M5 measurement/observation split (transfer_non_numeric_to_observation
    * .sql:51-120): numeric-looking VALUE → measurement with
    * value_as_number; otherwise → observation with value_as_string. Two
    * filtered projections off one parent — no mutation, no second scan
    * after cache. */
  def measurementObservationSplit(typedObservations: DataFrame,
                                  personMap: DataFrame, visitMap: DataFrame,
                                  personCount: Option[Long] = None)
      : (DataFrame, DataFrame) = {
    val base = eventDomain(typedObservations, personMap, visitMap,
      Seq("person_id", "encounter", "code", "obs_ts", "value"),
      Seq(col("units").asc_nulls_last))
    val pb = personBucket(personCount, typedObservations)
    val isNum = SafeCast.isNumericString(col("value"))
    val meas = DenseId.withDenseIdScalable(
      base.filter(col("value").isNotNull && isNum),
      Seq(col("person_id"), col("encounter"), col("code"), col("obs_ts")),
      "measurement_id", bucketBy = pb)
      .select(
        col("measurement_id"),
        col("person_id"),
        lit(0L).as("measurement_concept_id"),
        col("obs_ts").cast("date").as("measurement_date"),
        col("obs_ts").as("measurement_datetime"),
        lit(32817L).as("measurement_type_concept_id"),
        col("value").cast("double").as("value_as_number"),
        substring(col("units"), 1, 50).as("unit_source_value"),
        col("visit_occurrence_id"),
        col("code").as("measurement_source_value"),
        substring(col("value"), 1, 50).as("value_source_value"))
    val obs = DenseId.withDenseIdScalable(
      base.filter(col("value").isNull || !isNum),
      Seq(col("person_id"), col("encounter"), col("code"), col("obs_ts")),
      "observation_id", bucketBy = pb)
      .select(
        col("observation_id"),
        col("person_id"),
        lit(0L).as("observation_concept_id"),
        col("obs_ts").cast("date").as("observation_date"),
        col("obs_ts").as("observation_datetime"),
        lit(32817L).as("observation_type_concept_id"),
        substring(col("value"), 1, 60).as("value_as_string"),
        col("visit_occurrence_id"),
        col("code").as("observation_source_value"))
    (meas, obs)
  }

  /** omop.drug_era (OMOPCDM_postgresql_5.4_ddl.sql:347-354): exposures to
    * the same (person, drug concept) whose gaps are within the standard
    * 30-day persistence window merge into one era. The reference ships the
    * DDL but never populates it; the OHDSI-standard derivation is
    * gaps-and-islands, here [[graft.ops.Intervals]] — one shuffle on the
    * (person, concept) key, both windows and the covered-day sub-islands
    * reuse its partitioning.
    *
    * gap_days = datediff(era span) − Σ datediff of the maximal
    * continuously-covered sub-islands (un-exposed days inside the era). */
  def drugEra(drugExposure: DataFrame,
              personCount: Option[Long] = None): DataFrame = {
    val keys = Seq(col("person_id"), col("drug_concept_id"))
    val persist30 = expr("INTERVAL 30 DAYS")
    val tagged = graft.ops.Intervals.assignIslands(
      drugExposure.select(col("person_id"), col("drug_concept_id"),
        col("drug_exposure_start_date").as("s"),
        col("drug_exposure_end_date").as("e")),
      keys, col("s"), col("e"), persist30, outCol = "__era")
    // covered sub-islands (gap 0) inside each era, same partitioning
    val sub = graft.ops.Intervals.assignIslands(
      tagged, keys :+ col("__era"), col("s"), col("e"),
      expr("INTERVAL 0 SECONDS"), outCol = "__sub")
    val eras = sub
      .groupBy(keys ++ Seq(col("__era"), col("__sub")): _*)
      .agg(min(col("s")).as("cs"), max(col("e")).as("ce"),
        count(lit(1)).as("n"))
      .groupBy(keys :+ col("__era"): _*)
      .agg(min(col("cs")).as("drug_era_start_date"),
        max(col("ce")).as("drug_era_end_date"),
        sum(col("n")).cast("int").as("drug_exposure_count"),
        sum(datediff(col("ce"), col("cs"))).as("covered_days"))
      .withColumn("gap_days",
        (datediff(col("drug_era_end_date"), col("drug_era_start_date"))
          - col("covered_days")).cast("int")) // DDL: integer (:353-354)
      .drop("__era", "covered_days")
    DenseId.withDenseIdScalable(eras,
      Seq(col("person_id"), col("drug_concept_id"),
        col("drug_era_start_date")), "drug_era_id",
      bucketBy = personBucket(personCount, drugExposure))
      .select(col("drug_era_id"), col("person_id"),
        col("drug_concept_id"), col("drug_era_start_date"),
        col("drug_era_end_date"), col("drug_exposure_count"),
        col("gap_days"))
  }

  /** omop.condition_era (OMOPCDM_postgresql_5.4_ddl.sql:365-371): same
    * 30-day persistence merge keyed on (person, condition concept). */
  def conditionEra(conditionOccurrence: DataFrame,
                   personCount: Option[Long] = None): DataFrame = {
    val eras = graft.ops.Intervals.mergeIntervals(
      conditionOccurrence.select(col("person_id"),
        col("condition_concept_id"),
        col("condition_start_date").as("s"),
        col("condition_end_date").as("e")),
      Seq(col("person_id"), col("condition_concept_id")),
      col("s"), col("e"), expr("INTERVAL 30 DAYS"))
      .select(col("person_id"), col("condition_concept_id"),
        col("era_start").as("condition_era_start_date"),
        col("era_end").as("condition_era_end_date"),
        col("n_merged").cast("int").as("condition_occurrence_count"))
    DenseId.withDenseIdScalable(eras,
      Seq(col("person_id"), col("condition_concept_id"),
        col("condition_era_start_date")), "condition_era_id",
      bucketBy = personBucket(personCount, conditionOccurrence))
      .select(col("condition_era_id"), col("person_id"),
        col("condition_concept_id"), col("condition_era_start_date"),
        col("condition_era_end_date"), col("condition_occurrence_count"))
  }

  /** omop.observation_period (U1+A2; create_observation_period_v2.sql:
    * 10-55): min/max event date per person over the unioned domains. */
  def observationPeriod(sweepInputs: Seq[DataFrame],
                        personCount: Option[Long] = None): DataFrame = {
    val spans = sweepInputs.map(_.select(
      col("person_id"),
      col("start_date").cast("date").as("start_date"),
      col("end_date").cast("date").as("end_date")))
    DenseId.withDenseIdScalable(
      Sweep.spanPerKey(Sweep.unionSweep(spans), "person_id",
        "start_date", "end_date"),
      Seq(col("person_id")), "observation_period_id",
      bucketBy = personBucket(personCount, sweepInputs.head))
      .select(
        col("observation_period_id"),
        col("person_id"),
        col("period_start").as("observation_period_start_date"),
        col("period_end").as("observation_period_end_date"),
        lit(32817L).as("period_type_concept_id"))
  }

  /** Immunizations → omop.drug_exposure (synthea-omop-ETL.sql:460-501):
    * same-day exposure, type 38000177, dedup on (person, datetime, code). */
  def immunizationDrugExposure(typedImmunizations: DataFrame,
                               personMap: DataFrame,
                               visitMap: DataFrame,
                               personCount: Option[Long] = None): DataFrame =
    DenseId.withDenseIdScalable(
      typedImmunizations
        .join(broadcast(personMap),
          col("patient") === col("source_patient_id"))
        .join(broadcast(visitMap),
          col("encounter") === col("source_visit_id"), "left")
        .dropDuplicates("person_id", "date_time", "code"),
      Seq(col("person_id"), col("date_time"), col("code")),
      "drug_exposure_id",
      bucketBy = personBucket(personCount, typedImmunizations))
      .select(
        col("drug_exposure_id"),
        col("person_id"),
        lit(0L).as("drug_concept_id"),
        col("date_time").cast("date").as("drug_exposure_start_date"),
        col("date_time").as("drug_exposure_start_datetime"),
        col("date_time").cast("date").as("drug_exposure_end_date"),
        col("date_time").as("drug_exposure_end_datetime"),
        lit(38000177L).as("drug_type_concept_id"), // Prescription written
        col("visit_occurrence_id"),
        col("code").as("drug_source_value"))

  /** omop.cost Visit rows (transform_cost.sql:30-61): decimal money math —
    * paid_by_patient = total_claim − payer_coverage computed in
    * DecimalType, so no float drift (SURVEY §7.4 risk 4). Id-less rows;
    * [[cost]] assigns the shared dense sequence. */
  def visitCost(typedEncounters: DataFrame, visitMap: DataFrame): DataFrame =
    typedEncounters
      .filter(col("base_encounter_cost").isNotNull ||
        col("total_claim_cost").isNotNull ||
        col("payer_coverage").isNotNull)
      .join(broadcast(visitMap), col("id") === col("source_visit_id"))
      .select(
        col("visit_occurrence_id").as("cost_event_id"),
        lit("Visit").as("cost_domain_id"),
        col("total_claim_cost").as("total_charge"),
        col("base_encounter_cost").as("total_cost"),
        col("payer_coverage").as("total_paid"),
        col("payer_coverage").as("paid_by_payer"),
        (col("total_claim_cost") - col("payer_coverage"))
          .as("paid_by_patient"))

  /** omop.cost: the three domain strata (Visit / Drug / Procedure —
    * transform_cost.sql's three INSERT blocks) under ONE dense cost_id,
    * mirroring the reference's shared staging.cost_seq. Ordered by
    * (domain, event id) so ids are deterministic across reruns; constant
    * type/currency concepts (5031 "Calculated", 44818668 USD,
    * transform_cost.sql:36-37) applied once here. unionByName with
    * explicit decimal widening: the subtraction branches carry
    * DecimalType(11,2) while Procedure's NULLs are (10,2). */
  def cost(visitRows: DataFrame, drugRows: DataFrame,
           procedureRows: DataFrame): DataFrame = {
    val widened = Seq(visitRows, drugRows, procedureRows).map { df =>
      df.withColumn("paid_by_patient",
        col("paid_by_patient").cast(DecimalType(11, 2)))
    }
    DenseId.withDenseIdScalable(
      widened.reduce(_ unionByName _),
      Seq(col("cost_domain_id"), col("cost_event_id")), "cost_id")
      .select(
        col("cost_id"),
        col("cost_event_id"),
        col("cost_domain_id"),
        lit(5031L).as("cost_type_concept_id"),     // Calculated
        lit(44818668L).as("currency_concept_id"),  // USD
        col("total_charge"),
        col("total_cost"),
        col("total_paid"),
        col("paid_by_payer"),
        col("paid_by_patient"))
  }

  /** omop.payer_plan_period (synthea-omop-ETL.sql:540-560): one row per
    * person-year, end = start + 1 year − 1 day (P7). */
  def payerPlanPeriod(personYears: DataFrame,
                      personCount: Option[Long] = None): DataFrame =
    DenseId.withDenseIdScalable(
      personYears,
      Seq(col("person_id"), col("year_date")), "payer_plan_period_id",
      bucketBy = personBucket(personCount, personYears))
      .select(
        col("payer_plan_period_id"),
        col("person_id"),
        col("year_date").cast("date").as("payer_plan_period_start_date"),
        date_sub(add_months(col("year_date").cast("date"), 12), 1)
          .as("payer_plan_period_end_date"),
        lit(0L).as("payer_concept_id"),
        col("payer_id").as("payer_source_value"),
        lit(0L).as("plan_concept_id"))

  /** omop.death (transform_death.sql:27): patients with DEATHDATE. */
  def death(typedPatients: DataFrame, personMap: DataFrame): DataFrame =
    typedPatients
      .filter(col("deathdate").isNotNull)
      .join(broadcast(personMap), col("id") === col("source_patient_id"))
      .select(
        col("person_id"),
        col("deathdate").as("death_date"),
        lit(32817L).as("death_type_concept_id"))
}
