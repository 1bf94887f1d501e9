package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TypedTablesSpec extends SparkSpecBase {
  import spark.implicits._

  test("all 19 reference tables have specs") {
    assert(TypedTables.specs.keySet == Set(
      "allergies", "careplans", "claims", "claims_transactions",
      "conditions", "devices", "encounters", "imaging_studies",
      "immunizations", "medications", "observations", "organizations",
      "patient_expenses", "patients", "payer_transitions", "payers",
      "procedures", "providers", "supplies"))
  }

  test("allergies: enum guards and severity domains") {
    val raw = Seq(
      ("2020-01-01T00:00:00Z", "11111111-1111-1111-1111-111111111111",
        "allergy", "food", "MILD"),
      ("bad-date", "nope", "bogus", "food", "EXTREME")
    ).toDF("START", "PATIENT", "TYPE", "CATEGORY", "SEVERITY1")
      .withColumn("STOP", lit(null).cast("string"))
      .withColumn("ENCOUNTER", lit(null).cast("string"))
      .withColumn("CODE", lit("c")).withColumn("SYSTEM", lit("s"))
      .withColumn("DESCRIPTION", lit("d"))
      .withColumn("REACTION1", lit(null).cast("string"))
      .withColumn("DESCRIPTION1", lit(null).cast("string"))
      .withColumn("REACTION2", lit(null).cast("string"))
      .withColumn("DESCRIPTION2", lit(null).cast("string"))
      .withColumn("SEVERITY2", lit(null).cast("string"))
    val t = TypedTables.typedTable(raw, "allergies").collect()
    val good = t.find(_.getAs[String]("allergy_type") == "allergy").get
    assert(good.getAs[String]("severity1") == "MILD")
    val bad = t.find(_.getAs[String]("allergy_type") == null).get
    assert(bad.getAs[java.sql.Timestamp]("start_time") == null)
    assert(bad.getAs[String]("patient") == null)
    assert(bad.getAs[String]("severity1") == null) // EXTREME not in domain
  }

  test("medications: int dispenses guard, decimal costs") {
    val raw = Seq(("3", "12.50"), ("3.5", "x"))
      .toDF("DISPENSES", "TOTALCOST")
      .withColumn("START", lit("2020-01-01")).withColumn("STOP", lit(null).cast("string"))
      .withColumn("PATIENT", lit(null).cast("string"))
      .withColumn("PAYER", lit(null).cast("string"))
      .withColumn("ENCOUNTER", lit(null).cast("string"))
      .withColumn("CODE", lit("c")).withColumn("DESCRIPTION", lit("d"))
      .withColumn("BASE_COST", lit("1.00"))
      .withColumn("PAYER_COVERAGE", lit("0.50"))
      .withColumn("REASONCODE", lit(null).cast("string"))
      .withColumn("REASONDESCRIPTION", lit(null).cast("string"))
    val t = TypedTables.typedTable(raw, "medications")
    assert(t.filter(col("dispenses").isNotNull).count() == 1) // "3.5" → null
    assert(t.filter(col("total_cost").isNotNull).count() == 1) // "x" → null
  }

  test("claims spec covers all 31 reference columns") {
    assert(TypedTables.specs("claims").length == 31)
    assert(TypedTables.specs("claims_transactions").length == 33)
    assert(TypedTables.specs("patients").length == 28)
  }
}
