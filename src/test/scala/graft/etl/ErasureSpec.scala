package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class ErasureSpec extends SparkSpecBase {
  import spark.implicits._

  private def buildWarehouse(): String = {
    val dir = Files.createTempDirectory("graft_erasure").toString
    Seq((1L, "1980"), (2L, "1990"), (3L, "2000"))
      .toDF("person_id", "birth").write.parquet(s"$dir/person")
    Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("visit_occurrence_id", "person_id")
      .write.parquet(s"$dir/visit_occurrence")
    Seq(("u1", 1L), ("u2", 2L), ("u3", 3L))
      .toDF("source_patient_id", "person_id")
      .write.parquet(s"$dir/person_map")
    // no person_id column: must be untouched
    Seq((100L, "Aspirin")).toDF("concept_id", "concept_name")
      .write.parquet(s"$dir/concept")
    dir
  }

  test("erasePersons removes the subject from every person-keyed table") {
    val dir = buildWarehouse()
    val report = Erasure.erasePersons(spark, dir, Seq(1L))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(report == Map(
      "person" -> ((3L, 1L)),
      "person_map" -> ((3L, 1L)),
      "visit_occurrence" -> ((4L, 2L))), report.toString)
    // subject gone everywhere, others intact
    assert(spark.read.parquet(s"$dir/person")
      .filter($"person_id" === 1L).count() == 0)
    assert(spark.read.parquet(s"$dir/visit_occurrence").count() == 2)
    assert(spark.read.parquet(s"$dir/person_map").count() == 2)
    assert(spark.read.parquet(s"$dir/concept").count() == 1)
    // idempotent: a second request for the same subject removes nothing
    val again = Erasure.erasePersons(spark, dir, Seq(1L))
      .agg(sum("rows_removed")).head().getLong(0)
    assert(again == 0L)
  }

  test("erasePersons with a subject frame handles multiple ids") {
    val dir = buildWarehouse()
    Erasure.erasePersons(spark, dir, Seq(1L, 3L).toDF("person_id"))
    assert(spark.read.parquet(s"$dir/person").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    assert(spark.read.parquet(s"$dir/visit_occurrence").count() == 1)
  }
}
