package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dirty-Synthea corpus generator — makes the end-to-end
  * ETL run reproducible at any scale:
  *
  *   runMain graft.tools.SyntheaGen <outCsvDir> [nPatients]
  *
  * Emits the 8 Synthea CSVs (headered, all-string, UPPERCASE columns)
  * with injected dirt the pipeline must absorb, not crash on:
  *   - guard-passing invalid dates ("1985-99-99" birthdates — the ANSI
  *     try_cast class), out-of-domain enums, non-numeric VALUEs,
  *     end-before-start encounters (surfaced by Validation, not dropped).
  * ~43 rows per patient (25k patients ≈ 1.07M rows). All values derive
  * from hash-mixing of ids — same args, same corpus, any partitioning. */
object SyntheaGen {

  /** 36-char UUID-shaped id (must pass the typing layer's
    * ^[0-9a-fA-F-]{36}$ guard); `tag` distinguishes entity kinds. */
  def uuid(tag: String, id: org.apache.spark.sql.Column) =
    format_string("%08x-0000-0000-" + tag + "-%012x", id, id)

  def gen(spark: SparkSession, outDir: String, nPatients: Int): Unit = {
    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").option("header", true)
        .csv(s"$outDir/$name")

    val pats = spark.range(nPatients).select(col("id").as("pid"))
    val patients = pats.select(
      uuid("00aa", col("pid")).as("Id"),
      // every 997th birthdate is a guard-passing invalid calendar date:
      // the typing layer must null it, never throw
      when(col("pid") % 997 === 0, lit("1985-99-99"))
        .otherwise(date_format(
          date_add(lit("1950-01-01").cast("date"),
            (pmod(hash(col("pid"), lit(1)), lit(18000))).cast("int")),
          "yyyy-MM-dd")).as("BIRTHDATE"),
      when(col("pid") % 19 === 0,
        date_format(date_add(lit("2018-01-01").cast("date"),
          (pmod(hash(col("pid"), lit(2)), lit(1000))).cast("int")),
          "yyyy-MM-dd")).otherwise(lit("")).as("DEATHDATE"),
      // every 101st gender is out-of-domain → enum-cast nulls it
      when(col("pid") % 101 === 0, lit("X"))
        .otherwise(when(col("pid") % 2 === 0, "M").otherwise("F"))
        .as("GENDER"),
      element_at(array(lit("white"), lit("black"), lit("asian"),
        lit("other")), (pmod(hash(col("pid"), lit(3)), lit(4)) + 1)
        .cast("int")).as("RACE"),
      when(col("pid") % 7 === 0, "hispanic").otherwise("nonhispanic")
        .as("ETHNICITY"),
      when(col("pid") % 3 === 0, "M").otherwise("S").as("MARITAL"))
    save(patients, "patients.csv")

    val encs = pats.select(col("pid"),
        explode(sequence(lit(0), lit(2))).as("ei"))
      .withColumn("eid", col("pid") * 3 + col("ei"))
      .withColumn("start_ts",
        to_timestamp(lit("2015-01-01 08:00:00")) +
          make_dt_interval(pmod(hash(col("eid"), lit(4)), lit(2000))
            .cast("int"), lit(0), lit(0), lit(0)))
    val encounters = encs.select(
      uuid("00ec", col("eid")).as("Id"),
      date_format(col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("START"),
      // every 499th encounter ends two DAYS before it starts — the
      // validation report must surface it (date-level check)
      date_format(when(col("eid") % 499 === 0,
          col("start_ts") - make_dt_interval(lit(2), lit(0), lit(0), lit(0)))
        .otherwise(
          col("start_ts") + make_dt_interval(lit(0), lit(1), lit(0), lit(0))),
        "yyyy-MM-dd'T'HH:mm:ss'Z'").as("STOP"),
      uuid("00aa", col("pid")).as("PATIENT"),
      element_at(array(lit("ambulatory"), lit("inpatient"),
        lit("emergency"), lit("wellness")),
        (pmod(hash(col("eid"), lit(5)), lit(4)) + 1).cast("int"))
        .as("ENCOUNTERCLASS"),
      lit("185349003").as("CODE"), lit("Visit").as("DESCRIPTION"),
      format_string("%.2f", (pmod(hash(col("eid"), lit(6)), lit(20000))
        .cast("double") / 100)).as("BASE_ENCOUNTER_COST"),
      format_string("%.2f", (pmod(hash(col("eid"), lit(7)), lit(30000))
        .cast("double") / 100)).as("TOTAL_CLAIM_COST"),
      format_string("%.2f", (pmod(hash(col("eid"), lit(8)), lit(10000))
        .cast("double") / 100)).as("PAYER_COVERAGE"))
    save(encounters, "encounters.csv")

    def eventTable(codes: Seq[String], withStop: Boolean,
                   extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
      encs.select(Seq(
        date_format(col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("START"),
        (if (withStop)
          when(col("eid") % 3 === 0, lit(""))
            .otherwise(date_format(col("start_ts") +
              make_dt_interval(pmod(hash(col("eid"), lit(9)), lit(60))
                .cast("int"), lit(0), lit(0), lit(0)),
              "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        else lit("")).as("STOP"),
        uuid("00aa", col("pid")).as("PATIENT"),
        uuid("00ec", col("eid")).as("ENCOUNTER"),
        element_at(array(codes.map(lit): _*),
          (pmod(hash(col("eid"), lit(10)), lit(codes.size)) + 1)
            .cast("int")).as("CODE"),
        lit("gen").as("DESCRIPTION")) ++ extra: _*)
    save(eventTable(Seq("44054006", "38341003", "195967001", "10509002"),
      withStop = true), "conditions.csv")
    // medication cost columns (transform_cost.sql Drug block): every 13th
    // row carries no cost info (no cost row emitted); every 1013th
    // BASE_COST is non-numeric junk the safe cast must null, not crash on
    def money(seed: Int, modCents: Int) =
      format_string("%.2f", (pmod(hash(col("eid"), lit(seed)), lit(modCents))
        .cast("double") / 100))
    save(eventTable(Seq("313782", "834061", "308136", "429503"),
      withStop = true, extra = Seq(
        when(col("eid") % 13 === 0, lit(""))
          .when(col("eid") % 1013 === 0, lit("n/a"))
          .otherwise(money(31, 50000)).as("BASE_COST"),
        when(col("eid") % 13 === 0, lit(""))
          .otherwise(money(32, 20000)).as("PAYER_COVERAGE"),
        when(col("eid") % 13 === 0, lit(""))
          .otherwise((pmod(hash(col("eid"), lit(33)), lit(12)) + 1)
            .cast("string")).as("DISPENSES"),
        when(col("eid") % 13 === 0, lit(""))
          .otherwise(money(34, 80000)).as("TOTALCOST"))),
      "medications.csv")
    save(eventTable(Seq("232717009", "80146002", "274031008"),
      withStop = false, extra = Seq(
        when(col("eid") % 17 === 0, lit(""))
          .otherwise(money(35, 90000)).as("BASE_COST"))),
      "procedures.csv")

    val obs = encs.select(col("pid"), col("eid"), col("start_ts"),
        explode(sequence(lit(0), lit(9))).as("oi"))
      .withColumn("oid", col("eid") * 10 + col("oi"))
    val observations = obs.select(
      date_format(col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("DATE"),
      uuid("00aa", col("pid")).as("PATIENT"),
      uuid("00ec", col("eid")).as("ENCOUNTER"),
      element_at(array(lit("8302-2"), lit("29463-7"), lit("8867-4"),
        lit("72514-3")), (pmod(hash(col("oid"), lit(11)), lit(4)) + 1)
        .cast("int")).as("CODE"),
      lit("gen").as("DESCRIPTION"),
      // every 11th VALUE is non-numeric → routes to observation, not
      // measurement (M5 split); every 1009th is junk text
      when(col("oid") % 1009 === 0, lit("N/A#"))
        .when(col("oid") % 11 === 0, lit("positive"))
        .otherwise(format_string("%.1f",
          pmod(hash(col("oid"), lit(12)), lit(2000)).cast("double") / 10))
        .as("VALUE"),
      lit("units").as("UNITS"))
    save(observations, "observations.csv")

    save(encs.filter(col("ei") === 0).select(
      date_format(col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("DATE"),
      uuid("00aa", col("pid")).as("PATIENT"),
      uuid("00ec", col("eid")).as("ENCOUNTER"),
      lit("140").as("CODE"), lit("Flu").as("DESCRIPTION"),
      lit("140.52").as("BASE_COST")), "immunizations.csv")

    // patient_expenses: two coverage years per patient; every 9th patient's
    // 2015 row is emitted twice — the person-year dedup key must collapse it
    val expBase = pats.select(col("pid"),
        explode(sequence(lit(2015), lit(2016))).as("yr"))
      .select(
        uuid("00aa", col("pid")).as("PATIENT_ID"),
        col("yr").cast("string").as("YEAR"),
        uuid("00bb", pmod(hash(col("pid"), lit(21)), lit(5))).as("PAYER_ID"),
        format_string("%.2f", (pmod(hash(col("pid"), lit(22)), lit(500000))
          .cast("double") / 100)).as("HEALTHCARE_EXPENSES"),
        format_string("%.2f", (pmod(hash(col("pid"), lit(23)), lit(100000))
          .cast("double") / 100)).as("INSURANCE_COSTS"),
        format_string("%.2f", (pmod(hash(col("pid"), lit(24)), lit(400000))
          .cast("double") / 100)).as("COVERED_COSTS"),
        col("pid"), col("yr"))
    save(expBase.union(
        expBase.filter(col("pid") % 9 === 0 && col("yr") === 2015))
      .drop("pid", "yr"), "patient_expenses.csv")

    // devices: every 4th patient's first encounter; every 7th device row
    // is emitted twice (union below) — the NOT EXISTS dedup key
    // (person, start, code) must collapse it to one device_exposure row
    val devBase = encs.filter(col("ei") === 2 && col("pid") % 4 === 0).select(
      date_format(col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("START"),
      when(col("eid") % 3 === 0, lit(""))
        .otherwise(date_format(col("start_ts") +
          make_dt_interval(lit(30), lit(0), lit(0), lit(0)),
          "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("STOP"),
      uuid("00aa", col("pid")).as("PATIENT"),
      uuid("00ec", col("eid")).as("ENCOUNTER"),
      when(col("pid") % 8 === 0, lit("DEVICE123-A"))
        .otherwise(lit("706689003")).as("CODE"),
      lit("Device").as("DESCRIPTION"),
      format_string("(01)0%013d(11)141231(17)150707(10)T%d(21)%d",
        col("eid"), col("eid"), col("pid")).as("UDI"),
      col("pid"))
    save(devBase.union(devBase.filter(col("pid") % 7 === 0)).drop("pid"),
      "devices.csv")

    save(encs.filter(col("ei") === 1 && col("pid") % 5 === 0).select(
      date_format(col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("START"),
      lit("").as("STOP"),
      uuid("00aa", col("pid")).as("PATIENT"),
      uuid("00ec", col("eid")).as("ENCOUNTER"),
      lit("419474003").as("CODE"), lit("SNOMED").as("SYSTEM"),
      lit("Peanut").as("DESCRIPTION"), lit("allergy").as("TYPE"),
      lit("food").as("CATEGORY"),
      lit("271807003").as("REACTION1"), lit("Rash").as("DESCRIPTION1"),
      lit("MILD").as("SEVERITY1"), lit("").as("REACTION2"),
      lit("").as("DESCRIPTION2"), lit("").as("SEVERITY2")),
      "allergies.csv")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SyntheaGen <outCsvDir> [nPatients]")
    val n = args.lift(1).map(_.toInt).getOrElse(25000)
    val spark = graft.core.Sessions.local()
    val t0 = System.nanoTime()
    gen(spark, args(0), n)
    println(f"""{"synthea_gen": {"patients": $n, "sec": ${(System.nanoTime() - t0) / 1e9}%.1f}}""")
    spark.stop()
  }
}
