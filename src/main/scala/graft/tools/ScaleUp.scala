package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replicates the driver's sf0.1 tables `factor`× into a new sf directory,
  * for the order-of-magnitude bench datapoint (SURVEY §8) — every cascade
  * constant (band width, chunk size, hash count) deserves one 10× check
  * before anyone extrapolates it to 100 TB.
  *
  *   runMain graft.tools.ScaleUp [srcDir] [outDir] [factor]
  *
  * Scaling must not distort WORKLOAD SHAPE, only size:
  *   - every key column gets a per-replica offset (stride = max+1), so
  *     joins stay 1:N exactly as at sf0.1 and per-user/per-order group
  *     sizes are unchanged — only group COUNTS grow;
  *   - dims (nation/region) are NOT replicated — broadcast-ability is a
  *     property of the dim, which is the posture all plans assume;
  *   - document text in replica r>0 gets every 5th word tagged with the
  *     replica id: a changed word kills the 3 shingles that span it, so
  *     cross-replica 3-gram Jaccard lands ≈ 0.25 < the 0.3 near-dup
  *     threshold — the dup RATE stays constant as the corpus grows (a
  *     naive copy would give every doc 9 exact twins and explode the
  *     LSH candidate volume 10×, which no real corpus does);
  *   - embeddings in replica r get a circular shift by r positions — a
  *     permutation is orthogonal, so within-replica inner products (and
  *     the whole cluster structure IVF/k-means sees) are preserved
  *     EXACTLY while cross-replica cosine drops to the random baseline.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    def src(n: String): DataFrame = Tables.load(spark, srcDir, n)
    def write(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L
    /** Cross-join with the replica range; offset listed key columns. */
    def rep(df: DataFrame, offsets: (String, Long)*): DataFrame = {
      val withR = df.crossJoin(
        spark.range(factor).select(col("id").as("__r")))
      offsets.foldLeft(withR) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("__r") * s)
      }
    }

    // dims pass through — broadcast-ability must not change with sf
    write(src("region"), "region")
    write(src("nation"), "nation")

    val custS = stride(src("customer"), "c_custkey")
    val suppS = stride(src("supplier"), "s_suppkey")
    val partS = stride(src("part"), "p_partkey")
    val ordS = stride(src("orders"), "o_orderkey")
    write(rep(src("customer"), "c_custkey" -> custS).drop("__r"), "customer")
    write(rep(src("supplier"), "s_suppkey" -> suppS).drop("__r"), "supplier")
    write(rep(src("part"), "p_partkey" -> partS).drop("__r"), "part")
    write(rep(src("orders"), "o_orderkey" -> ordS, "o_custkey" -> custS)
      .drop("__r"), "orders")
    write(rep(src("lineitem"), "l_orderkey" -> ordS, "l_partkey" -> partS,
      "l_suppkey" -> suppS).drop("__r"), "lineitem")

    val ev = Tables.events(spark, srcDir) // ts normalized to TimestampType
    write(rep(ev, "event_id" -> stride(ev, "event_id"),
      "user_id" -> stride(ev, "user_id")).drop("__r"), "events")

    val docs = src("documents")
    val scaledDocs = rep(docs, "doc_id" -> stride(docs, "doc_id"))
      .withColumn("text", when(col("__r") === 0, col("text")).otherwise(
        array_join(zip_with(
          split(col("text"), " "),
          sequence(lit(0), size(split(col("text"), " ")) - 1),
          (w, i) => when(i % 5 === 4,
            concat(w, lit("r"), col("__r"))).otherwise(w)), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__r")
    write(scaledDocs, "documents")

    val emb = src("embeddings")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    // rotate by __r mod dim: factors above the dimensionality (the 100×
    // run) would otherwise drive the first slice length negative
    write(rep(emb, "vec_id" -> stride(emb, "vec_id"))
      .withColumn("__shift", pmod(col("__r"), lit(dim)))
      .withColumn("embedding", concat(
        slice(col("embedding"), col("__shift") + 1, lit(dim) - col("__shift")),
        slice(col("embedding"), lit(1), col("__shift"))))
      .drop("__r", "__shift"), "embeddings")

    for (n <- Tables.names)
      println(s"[scaleup] $n: " +
        s"${spark.read.parquet(s"$outDir/$n.parquet").count()} rows")
    spark.stop()
  }
}
