package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** [[graft.ops.Linkage.fellegiSunter]] — probabilistic linkage scores. */
class LinkageSpec extends SparkSpecBase {

  private def fields = Seq(
    Linkage.Field("name", col("name_eq"), m = 0.9, u = 0.1),
    Linkage.Field("zip", col("zip_eq"), m = 0.8, u = 0.2))

  test("weights are the literal log2 odds; decisions follow thresholds") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (1L, 2L, true, true),    // both agree → strong match
      (3L, 4L, true, false),   // mixed
      (5L, 6L, false, false))  // both disagree → non-match
      .toDF("id_a", "id_b", "name_eq", "zip_eq")
    val wName = math.log(0.9 / 0.1) / math.log(2.0)  // ≈ 3.169925
    val wZip = math.log(0.8 / 0.2) / math.log(2.0)   // = 2.0
    val out = Linkage.fellegiSunter(pairs, fields, upper = 3.0,
        lower = 0.0)
      .collect().map(r => r.getAs[Long]("id_a") ->
        (r.getAs[Double]("match_weight"), r.getAs[String]("decision")))
      .toMap
    assert(math.abs(out(1L)._1 - (wName + wZip)) < 1e-5)
    assert(out(1L)._2 === "match")
    assert(out(5L)._2 === "non_match")
    // mixed: 3.169925 + log2(0.2/0.8) = 3.169925 − 2 ≈ 1.17 → possible
    assert(out(3L)._2 === "possible")
  }

  test("null agreement scores as disagreement, never as a match boost") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L, Option.empty[Boolean], Option(true)))
      .toDF("id_a", "id_b", "name_eq", "zip_eq")
    val r = Linkage.fellegiSunter(pairs, fields, 3.0, 0.0).collect().head
    // w_name must be the disagreement weight (negative)
    assert(r.getAs[Double]("w_name") < 0)
    assert(r.getAs[Double]("w_zip") === 2.0)
  }

  test("field preconditions reject degenerate m/u") {
    intercept[IllegalArgumentException] {
      Linkage.Field("bad", col("x"), m = 0.2, u = 0.5)
    }
  }
}
