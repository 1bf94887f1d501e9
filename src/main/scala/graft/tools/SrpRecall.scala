package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Recall profiler for the SRP near-dup tier: plants one deterministic
  * near-twin per corpus vector (70/30 blend with the dimension-reversed
  * self — planted cosine lands ≈ 0.75–0.95, the regime where bucketing
  * recall is the question), then measures what fraction of planted pairs
  * the single-table operator vs the banded operator actually emits, with
  * wall time — so the banded tier's recall claim is a measured number
  * per scale, not a formula (SURVEY §8.19/§8.20). Prints the auto-sized
  * planes and band count so the n^ρ cost law is on the record next to
  * the recall it buys.
  *
  *   runMain graft.tools.SrpRecall dir1 [dir2 ...]
  *
  * An argument of the form `synth:N` measures over N deterministic
  * synthetic base vectors (dim 64, hash-derived near-uniform entries —
  * isotropic like the testdata) instead of a parquet dir: the parquet
  * corpora stop at 200k rows, and the contract's whole point is the
  * n → 10⁹ regime, so the law gets checked beyond what the driver ships.
  */
object SrpRecall {
  private def synthBase(spark: org.apache.spark.sql.SparkSession,
                        n: Long): org.apache.spark.sql.DataFrame = {
    val dim = 64
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L)
          .cast("double") / 1000.0).cast("float")).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val minCos = 0.5
    args.foreach { dir =>
      val base = (if (dir.startsWith("synth:"))
          synthBase(spark, dir.stripPrefix("synth:").toLong)
        else graft.core.Tables.embeddings(spark, dir))
        .select(col("vec_id"), col("embedding"))
      val offset = 1000000000000L
      val planted = base.select((col("vec_id") + offset).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (a, b) => a * lit(0.7f) + b * lit(0.3f)).as("embedding"))
      val corpus = base.unionByName(planted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val planes = VectorOps.autoPlaneCount(n)
      val bands = VectorOps.srpBandCountForPlanes(planes)
      // denominator: planted pairs whose TRUE cosine clears the verify
      // threshold (bucketing recall is measured against pairs the exact
      // verify would keep)
      val truePairs = base.join(
          planted.select((col("vec_id") - offset).as("vec_id"),
            col("embedding").as("__e2")), "vec_id")
        .filter(VectorOps.cosine(col("embedding"), col("__e2")) >= minCos)
        .count()
      if (truePairs == 0) {
        // a degenerate corpus has no recall to measure; emitting 0/0
        // would print NaN into the JSON line (ADVICE r9)
        System.err.println(s"SrpRecall: $dir has no planted pair above " +
          s"cosine $minCos — skipping")
      } else {
        def plantedFound(df: org.apache.spark.sql.DataFrame): Long =
          df.filter(col("vec_b") - col("vec_a") === offset).count()
        def timed(f: => Long): (Long, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val (s1, t1) = timed(plantedFound(
          VectorOps.srpNearDupPairsAuto(corpus, minCos, knownN = Some(n))))
        val (sb, tb) = timed(plantedFound(
          VectorOps.srpBandedNearDupPairsAuto(corpus, minCos,
            knownN = Some(n))))
        def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(v))
        println(s"""{"srp_recall":{"dir":"$dir","n":$n,""" +
          s""""planes":$planes,"bands":$bands,""" +
          s""""planted":$truePairs,"single_found":$s1,""" +
          s""""single_recall":${d3(s1.toDouble / truePairs)},""" +
          s""""banded_found":$sb,""" +
          s""""banded_recall":${d3(sb.toDouble / truePairs)},""" +
          s""""single_secs":${d3(t1)},"banded_secs":${d3(tb)}}}""")
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
