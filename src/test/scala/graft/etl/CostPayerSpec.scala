package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpecBase

class CostPayerSpec extends SparkSpecBase {
  import spark.implicits._

  test("visitCost: decimal money math, paid_by_patient exact") {
    val enc = Seq(
      ("e1", "100.10", "250.25", "200.00"),
      ("e2", null, null, null) // filtered: no cost info
    ).toDF("id", "BASE", "TOTAL", "COVER")
      .select(col("id"),
        col("BASE").cast(DecimalType(10, 2)).as("base_encounter_cost"),
        col("TOTAL").cast(DecimalType(10, 2)).as("total_claim_cost"),
        col("COVER").cast(DecimalType(10, 2)).as("payer_coverage"))
    val vm = Seq(("e1", 10L), ("e2", 20L))
      .toDF("source_visit_id", "visit_occurrence_id")
    val cost = Domains.visitCost(enc, vm)
    assert(cost.count() == 1)
    val r = cost.head()
    assert(r.getAs[java.math.BigDecimal]("paid_by_patient")
      .compareTo(new java.math.BigDecimal("50.25")) == 0)
    assert(r.getAs[Long]("cost_type_concept_id") == 5031L)
    assert(r.getAs[Long]("currency_concept_id") == 44818668L)
  }

  test("payerPlanPeriod: end date is start + 1 year - 1 day") {
    val py = Seq((1L, "2020-01-01", "p9"), (1L, "2020-02-29", "p9"))
      .toDF("person_id", "year_date", "payer_id")
    val ppp = Domains.payerPlanPeriod(py).orderBy("payer_plan_period_id")
      .collect()
    assert(ppp(0).getAs[java.sql.Date]("payer_plan_period_end_date")
      .toString == "2020-12-31")
    // leap-day start: add_months clamps to Feb 28 next year, minus 1 day
    assert(ppp(1).getAs[java.sql.Date]("payer_plan_period_end_date")
      .toString == "2021-02-27")
  }
}
