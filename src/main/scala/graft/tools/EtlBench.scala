package graft.tools

import org.apache.spark.sql.functions._

import graft.etl.Domains

/** ETL throughput benchmark against the reference's headline number: its
  * optimized set-based measurement→observation transfer sustains ~10k
  * records/s single-node (docs/ETL_SUMMARY.md:57-60). This synthesizes N
  * observation-shaped rows (mixed numeric/text values), runs the same
  * split + id assignment + parquet write, and prints rows/s.
  *
  *   runMain graft.tools.EtlBench [nRows]
  */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.core.Sessions.local()
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("etl_bench").toString
    // synthetic typed-observations shape: 10% non-numeric values
    val obs = spark.range(n).select(
      concat(lit("p"), (col("id") % 50000).cast("string")).as("patient"),
      concat(lit("e"), (col("id") % 200000).cast("string")).as("encounter"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L)
        .as("obs_ts"),
      concat(lit("code"), (col("id") % 500).cast("string")).as("code"),
      lit("desc").as("description"),
      when(col("id") % 10 === 0, lit("Never smoker"))
        .otherwise(((col("id") % 2000).cast("double") / 10).cast("string"))
        .as("value"),
      lit("unit").as("units"))

    val personMap = spark.range(50000).select(
      concat(lit("p"), col("id").cast("string")).as("source_patient_id"),
      (col("id") + 1).as("person_id"))
    val visitMap = spark.range(200000).select(
      concat(lit("e"), col("id").cast("string")).as("source_visit_id"),
      (col("id") + 1).as("visit_occurrence_id"))

    // warmup (plan + codegen)
    obs.limit(1000).count()

    val t0 = System.nanoTime()
    val (meas, o) = Domains.measurementObservationSplit(obs, personMap, visitMap)
    meas.write.mode("overwrite").parquet(s"$out/measurement")
    o.write.mode("overwrite").parquet(s"$out/observation")
    val secs = (System.nanoTime() - t0) / 1e9
    val mc = spark.read.parquet(s"$out/measurement").count()
    val oc = spark.read.parquet(s"$out/observation").count()
    println(f"""{"etl_bench": {"rows": $n, "secs": $secs%.2f, "rows_per_sec": ${(n / secs).toLong}, "measurement": $mc, "observation": $oc}}""")
    spark.stop()
  }
}
