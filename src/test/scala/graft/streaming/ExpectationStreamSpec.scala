package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase
import graft.etl.Expectations

/** The streaming data-contract gate: [[Expectations.rowFlags]] is pure
  * Column expressions, so quarantine routing runs unchanged on a
  * micro-batch stream and splits rows exactly as the batch tier would —
  * regardless of where micro-batch boundaries fall. */
class ExpectationStreamSpec extends SparkSpecBase {

  private val checks = Seq(
    Expectations.notNull("k"),
    Expectations.inRange("price", 0.0, 100.0),
    Expectations.accepted("status", Seq("O", "F")))

  private def flags(df: org.apache.spark.sql.DataFrame) =
    Expectations.rowFlags(df, checks)

  test("streamed quarantine split is bit-identical to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (Option(1L), 50.0, "O"),   // clean
      (Option.empty[Long], 50.0, "O"), // null key
      (Option(3L), 999.0, "F"),  // range
      (Option(4L), 10.0, "X"),   // domain
      (Option(5L), 99.0, "F"))   // clean
    val mem = MemoryStream[(Option[Long], Double, String)]
    val q = flags(mem.toDF.toDF("k", "price", "status"))
      .writeStream.format("memory").queryName("exp_sink")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("exp_sink")
      val batch = flags(rows.toDF("k", "price", "status"))
      assert(streamed.count() == 5)
      assert(streamed.except(batch).count() == 0)
      assert(batch.except(streamed).count() == 0)
      // the split itself: 2 clean, 3 quarantined with correct reasons
      val quarantined = streamed.filter(col("quarantine"))
      assert(quarantined.count() == 3)
      assert(streamed.filter(!col("quarantine")).count() == 2)
      val reasons = quarantined
        .select(col("k"), col("viol_not_null_k"),
          col("viol_in_range_price"), col("viol_accepted_values_status"))
        .collect()
        .map(r => (Option(r.get(0)), r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3))).toSet
      assert(reasons == Set(
        (None, true, false, false),
        (Some(3L), false, true, false),
        (Some(4L), false, false, true)))
    } finally q.stop()
  }
}
