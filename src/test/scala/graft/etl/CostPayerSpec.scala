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
    assert(r.getAs[String]("cost_domain_id") == "Visit")
  }

  test("cost: three domain strata share one dense deterministic id") {
    def rows(domain: String, ids: Seq[Long]) =
      ids.map(i => (i, domain, "10.00", "8.00", "6.00", "6.00", "4.00"))
        .toDF("cost_event_id", "cost_domain_id", "tc", "tcost", "tp",
          "pbp", "pbpat")
        .select(col("cost_event_id"), col("cost_domain_id"),
          col("tc").cast(DecimalType(10, 2)).as("total_charge"),
          col("tcost").cast(DecimalType(10, 2)).as("total_cost"),
          col("tp").cast(DecimalType(10, 2)).as("total_paid"),
          col("pbp").cast(DecimalType(10, 2)).as("paid_by_payer"),
          col("pbpat").cast(DecimalType(11, 2)).as("paid_by_patient"))
    val out = Domains.cost(rows("Visit", Seq(7L, 3L)),
      rows("Drug", Seq(5L)), rows("Procedure", Seq(9L)))
    // ids are 1..4, ordered by (domain, event id): Drug-5, Procedure-9,
    // Visit-3, Visit-7 — deterministic across reruns and partitionings
    val got = out.orderBy("cost_id")
      .select("cost_id", "cost_domain_id", "cost_event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "Drug", 5L), (2L, "Procedure", 9L),
      (3L, "Visit", 3L), (4L, "Visit", 7L)))
    assert(out.head().getAs[Long]("cost_type_concept_id") == 5031L)
    assert(out.head().getAs[Long]("currency_concept_id") == 44818668L)
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
