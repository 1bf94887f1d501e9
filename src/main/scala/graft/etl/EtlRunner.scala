package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI entry: run the full Synthea→OMOP pipeline over a directory of
  * Synthea CSVs and write OMOP parquet tables + a validation report.
  *
  *   runMain graft.etl.EtlRunner <syntheaDir> <outDir>
  *
  * Mirrors the reference's step DAG (etl_pipeline/etl_main.py:44-96):
  * patients → encounters → {conditions, medications, procedures,
  * observations} → observation_period → validation — but as one lazy
  * lineage per output with shared id maps; each write is the only action
  * per step, so Spark schedules the independent domains concurrently
  * where cores allow.
  */
object EtlRunner {

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir) = args.take(2)
    val vocabDir = args.lift(2)
    val spark = graft.core.Sessions.local()
    try {
      val report = run(spark, inDir, outDir, vocabDir)
      report.show(50, truncate = false)
    } finally spark.stop()
  }

  /** The reference's required input set
    * (python/enhanced_synthea_to_omop.py:101-108). */
  val RequiredFiles: Seq[String] = Seq("patients", "encounters", "conditions",
    "observations", "procedures", "medications")

  /** Path existence via the path's own Hadoop FileSystem — java.nio only
    * sees the driver-local filesystem, so hdfs://-s3a:// inputs would
    * spuriously fail the required check and silently skip every optional
    * source. */
  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def run(spark: SparkSession, inDir: String, outDir: String,
          vocabDir: Option[String] = None): DataFrame = {
    def in(n: String) = s"$inDir/$n.csv"
    val missing = RequiredFiles.filterNot(n => pathExists(spark, in(n)))
    require(missing.isEmpty,
      s"missing required Synthea CSVs in $inDir: " +
        missing.map(_ + ".csv").mkString(", "))
    // ETL reads split at 32 MB, not the 128 MB default: snappy parquet
    // packs ~4-6x the ROWS of the same bytes of CSV text into one scan
    // partition, and the window-heavy dense-id/dedup tier holds whole
    // sorted partitions on the heap per task — 32 MB restores the
    // CSV-era rows-per-task density now that the typed layer re-reads
    // parquet; more, smaller tasks is the right trade everywhere in
    // this pipeline. The conf is session-global, so the prior value is
    // restored on every exit path — a caller sharing the session
    // (specs, library embedding) must not silently inherit 4x more scan
    // partitions for all subsequent reads.
    val mpbKey = "spark.sql.files.maxPartitionBytes"
    val mpbPrior = spark.conf.getOption(mpbKey)
    spark.conf.set(mpbKey, "33554432")
    try runInner(spark, inDir, outDir, vocabDir)
    finally mpbPrior match {
      case Some(v) => spark.conf.set(mpbKey, v)
      case None => spark.conf.unset(mpbKey)
    }
  }

  private def runInner(spark: SparkSession, inDir: String, outDir: String,
                       vocabDir: Option[String]): DataFrame = {
    def in(n: String) = s"$inDir/$n.csv"
    // Per-step wall clock on stderr: each write is the single action of
    // its step, so the elapsed time IS that step's lazy lineage + write —
    // the per-table breakdown an operator needs to see where a scale run
    // spends its wall without re-instrumenting.
    val runStart = System.nanoTime()
    def save(df: DataFrame, n: String): DataFrame = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$outDir/$n")
      val t1 = System.nanoTime()
      Console.err.println(f"[etl-step] $n%-34s ${(t1 - t0) / 1e9}%8.1f s  (at ${(t1 - runStart) / 1e9}%7.1f s)")
      spark.read.parquet(s"$outDir/$n")
    }

    // bronze → typed (repair pass only where malformed rows can occur:
    // free-text description columns). Typed tables materialize ONCE as
    // parquet at this boundary: downstream consumers share each frame —
    // patients feeds the person map + person + death, encounters the
    // visit map + visit + visit cost, medications/procedures their
    // domain AND cost rows, observations both split halves — and a lazy
    // typing lineage re-reads (and re-repairs) the same CSV text for
    // every consumer: 126.7 GB of input for ~27 GB of CSV at the
    // 101.66M-row scale run. After the cut each re-read is a
    // column-pruned parquet scan of the typed sliver it needs. `_typed`
    // is infrastructure, not a gold table (underscore-prefixed, skipped
    // by inventory sweeps) — the same staged-boundary role the
    // reference's staging schema plays (sql/staging).
    def typed(df: DataFrame, n: String): DataFrame = save(df, s"_typed/$n")
    val tPat = typed(
      Typing.patients(Ingest.readAllString(spark, in("patients"))),
      "patients")
    val tEnc = typed(
      Typing.encounters(Ingest.readRepaired(spark, in("encounters"))),
      "encounters")
    val tCon = typed(
      Typing.conditions(Ingest.readRepaired(spark, in("conditions"))),
      "conditions")
    val tMed = typed(
      Typing.medications(Ingest.readRepaired(spark, in("medications"))),
      "medications")
    val tPro = typed(
      Typing.procedures(Ingest.readRepaired(spark, in("procedures"))),
      "procedures")
    val tObs = typed(
      Typing.observations(Ingest.readRepaired(spark, in("observations"))),
      "observations")

    // id maps (the only global coordination)
    val personMap = save(Domains.buildIdMap(spark, None,
      tPat.filter(col("id").isNotNull), "id", "person_id")
      .withColumnRenamed("id", "source_patient_id"), "person_map")
    val visitMap = save(Domains.buildIdMap(spark, None, tEnc, "id",
      "visit_occurrence_id")
      .withColumnRenamed("id", "source_visit_id"), "visit_map")

    // gold domains. nPersons feeds the closed-form person-leading dense-id
    // bucket (Domains.personBucket): person ids are dense 1..n, so every
    // person-ordered id assignment skips DenseId's bounds-sampling pass —
    // the count on the freshly written map parquet is a sub-second
    // metadata-shaped job, paid once for the whole run.
    val nPersons = Some(personMap.count())
    val person = save(Domains.person(spark, tPat, personMap), "person")
    val visit = save(
      Domains.visitOccurrence(tEnc, personMap, visitMap), "visit_occurrence")

    // vocabulary concept mapping (stage-3 chain) when a vocab dir is given
    val vocab = vocabDir.map { vd =>
      (Vocab.loadConcept(spark, s"$vd/CONCEPT.csv"),
        Vocab.loadConceptRelationship(spark, s"$vd/CONCEPT_RELATIONSHIP.csv"))
    }
    // optional hierarchy/synonym tables ship with full OMOP vocab drops
    // (enhanced_vocabulary_loader.py:492,564); persisted for rollup queries
    for (vd <- vocabDir) {
      if (pathExists(spark, s"$vd/CONCEPT_ANCESTOR.csv"))
        save(Vocab.loadConceptAncestor(spark, s"$vd/CONCEPT_ANCESTOR.csv"),
          "concept_ancestor")
      if (pathExists(spark, s"$vd/CONCEPT_SYNONYM.csv"))
        save(Vocab.loadConceptSynonym(spark, s"$vd/CONCEPT_SYNONYM.csv"),
          "concept_synonym")
    }
    def mapConcepts(df: DataFrame, srcValue: String, srcConcept: String,
                    tgtConcept: String, vocabulary: String,
                    domain: String): DataFrame =
      vocab.fold(df) { case (c, r) =>
        Vocab.mapDomain(df.withColumn(srcConcept, lit(0L)), c, r,
          srcValue, srcConcept, tgtConcept, vocabulary, domain)
      }

    // concept mapping covers the reference's full five-domain sweep
    // (enhanced_synthea_to_omop.py:2300-2400: condition/SNOMED,
    // drug/RxNorm, procedure/SNOMED, measurement/LOINC,
    // observation/LOINC) — mapping only conditions would leave every
    // drug_concept_id at 0, collapsing all of a person's drugs into ONE
    // merged drug_era and stratifying Achilles under concept 0
    val cond = save(mapConcepts(
      Domains.conditionOccurrence(tCon, personMap, visitMap, nPersons),
      "condition_source_value", "condition_source_concept_id",
      "condition_concept_id", "SNOMED", "Condition"),
      "condition_occurrence")
    val (drugRaw, drugCostRows) =
      Domains.drugExposureAndCost(tMed, personMap, visitMap, nPersons)
    val drug = save(mapConcepts(drugRaw,
      "drug_source_value", "drug_source_concept_id",
      "drug_concept_id", "RxNorm", "Drug"),
      "drug_exposure")
    val (procRaw, procCostRows) =
      Domains.procedureOccurrenceAndCost(tPro, personMap, visitMap, nPersons)
    val proc = save(mapConcepts(procRaw,
      "procedure_source_value", "procedure_source_concept_id",
      "procedure_concept_id", "SNOMED", "Procedure"),
      "procedure_occurrence")
    // OHDSI-standard era derivations (30-day persistence window) —
    // AFTER mapping, so eras merge per standard concept, not per source 0
    val drugEra = save(Domains.drugEra(drug, nPersons), "drug_era")
    val condEra = save(Domains.conditionEra(cond, nPersons), "condition_era")
    val (meas, obs) =
      Domains.measurementObservationSplit(tObs, personMap, visitMap, nPersons)
    val measT = save(mapConcepts(meas,
      "measurement_source_value", "measurement_source_concept_id",
      "measurement_concept_id", "LOINC", "Measurement"), "measurement")
    val obsT = save(mapConcepts(obs,
      "observation_source_value", "observation_source_concept_id",
      "observation_concept_id", "LOINC", "Observation"), "observation")
    save(Domains.death(tPat, personMap), "death")
    // cost: all three reference strata (Visit/Drug/Procedure,
    // transform_cost.sql's three INSERT blocks) under one dense cost_id
    save(Domains.cost(Domains.visitCost(tEnc, visitMap),
      drugCostRows, procCostRows), "cost")
    // optional source: immunizations → drug_exposure rows
    val immDrug =
      if (pathExists(spark, in("immunizations"))) {
        val tImm = TypedTables.typedTable(
          Ingest.readRepaired(spark, in("immunizations")), "immunizations")
        Some(save(Domains.immunizationDrugExposure(tImm, personMap, visitMap,
          nPersons),
          "drug_exposure_immunizations"))
      } else None
    // optional source: patient_expenses → payer_plan_period
    // (synthea-omop-ETL.sql:530-565: one row per person-year of coverage)
    if (pathExists(spark, in("patient_expenses"))) {
      val tExp = TypedTables.typedTable(
        Ingest.readRepaired(spark, in("patient_expenses")), "patient_expenses")
      val personYears = graft.ops.Dedup.firstRowPerGroup(
        tExp
          .join(broadcast(personMap),
            col("patient_id") === col("source_patient_id"))
          .select(col("person_id"),
            make_date(col("year"), lit(1), lit(1)).as("year_date"),
            col("payer_id"))
          .filter(col("year_date").isNotNull),
        // the reference's NOT EXISTS key (person, period start); payer
        // tiebreak makes the survivor deterministic when one person-year
        // carries two payers (mid-year switch) — reruns stay byte-stable
        Seq(col("person_id"), col("year_date")),
        Seq(col("payer_id").asc_nulls_last))
      save(Domains.payerPlanPeriod(personYears, nPersons), "payer_plan_period")
    }
    // optional source: devices → device_exposure (synthea-omop-ETL.sql:242)
    if (pathExists(spark, in("devices"))) {
      val tDev = TypedTables.typedTable(
        Ingest.readRepaired(spark, in("devices")), "devices")
      save(Domains.deviceExposure(tDev, personMap, visitMap, nPersons),
        "device_exposure")
    }
    // optional source: allergies feed the observation-period sweep
    // (etl_pipeline/etl_observation_periods.py:81-145 includes both)
    val allergySpans =
      if (pathExists(spark, in("allergies"))) {
        val tAll = TypedTables.typedTable(
          Ingest.readRepaired(spark, in("allergies")), "allergies")
        Some(tAll
          .join(broadcast(personMap),
            col("patient") === col("source_patient_id"))
          .select(col("person_id"),
            col("start_time").cast("date").as("start_date"),
            coalesce(col("stop_time"), col("start_time")).cast("date")
              .as("end_date")))
      } else None
    save(graft.analyze.Achilles.run(person, visit, cond,
      Some(drugEra), Some(condEra), procedure = Some(proc),
      drugExposure = Some(drug), observation = Some(obsT),
      measurement = Some(measT)), "achilles_results")
    val obsPeriod = Domains.observationPeriod(personCount = nPersons,
      sweepInputs = Seq(
      visit.select(col("person_id"), col("visit_start_date").as("start_date"),
        col("visit_end_date").as("end_date")),
      cond.select(col("person_id"),
        col("condition_start_date").as("start_date"),
        col("condition_end_date").as("end_date")),
      drug.select(col("person_id"),
        col("drug_exposure_start_date").as("start_date"),
        col("drug_exposure_end_date").as("end_date")),
      proc.select(col("person_id"), col("procedure_date").as("start_date"),
        col("procedure_date").as("end_date")),
      measT.select(col("person_id"), col("measurement_date").as("start_date"),
        col("measurement_date").as("end_date")),
      obsT.select(col("person_id"), col("observation_date").as("start_date"),
        col("observation_date").as("end_date"))) ++
      immDrug.map(d => d.select(col("person_id"),
        col("drug_exposure_start_date").as("start_date"),
        col("drug_exposure_end_date").as("end_date"))).toSeq ++
      allergySpans.toSeq)
    // save returns the written table read back, so the dist analyses scan
    // the period parquet rather than recomputing the multi-domain span
    // sweep (the widest union in the run)
    val obsPeriodSaved = save(obsPeriod, "observation_period")
    save(graft.analyze.Achilles.runDist(visit, Some(drugEra),
      person = Some(person), observationPeriod = Some(obsPeriodSaved)),
      "achilles_results_dist")

    val report = Validation.report(spark, person, visit, cond, measT, obsT,
      Some(drugEra), Some(condEra))
    val tv = System.nanoTime()
    report.coalesce(1).write.mode("overwrite").json(s"$outDir/validation")
    Console.err.println(f"[etl-step] ${"validation"}%-34s ${(System.nanoTime() - tv) / 1e9}%8.1f s  (at ${(System.nanoTime() - runStart) / 1e9}%7.1f s)")
    // return the WRITTEN report, not the lazy plan: the validation union
    // scans every gold table, and a caller that collects the returned
    // frame would silently re-execute the whole suite a second time
    // (measured: ~2x the entire validation cost at the 101.66M-row run)
    spark.read.schema("check_name STRING, failed_count LONG")
      .json(s"$outDir/validation")
  }
}
