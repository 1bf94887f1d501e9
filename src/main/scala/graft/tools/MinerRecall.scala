package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** MINED-PAIR recall profiler for the cross-label pair miners
  * (r10 verdict #1): plants one deterministic CROSS-LABEL near-twin per
  * base vector (70/30 blend with the dimension-reversed self, label
  * flipped 0→1 — the twin is each other's best cross-label partner by a
  * wide margin, so a planted pair is mined iff its candidate survives
  * bucketing), then measures what fraction of planted pairs
  * [[VectorOps.mutualNeighborsAuto]] actually EMITS — end-to-end through
  * the rank-1 windows and the mutuality filter, not just the candidate
  * join — under (a) the banded flat-recall candidate tier the Auto APIs
  * now ride and (b) the pre-port single-table shape (bands = 1 at the
  * same [[VectorOps.autoPlaneCount]] planes — band 0 IS the old
  * signature), with wall time for the declared n^ρ cost multiplier.
  *
  *   runMain graft.tools.MinerRecall synth:2000 synth:20000 synth:200000
  *
  * `synth:N` builds N deterministic base vectors (dim 64, hash-derived
  * near-uniform — [[SrpRecall]]'s construction) so the law is checked at
  * corpus sizes beyond the shipped parquet; a plain argument reads
  * `<dir>/embeddings.parquet`. Total corpus is 2N (base + twins). */
object MinerRecall {
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
    args.foreach { dir =>
      val base = (if (dir.startsWith("synth:"))
          synthBase(spark, dir.stripPrefix("synth:").toLong)
        else graft.core.Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding")))
        .withColumn("label", lit(0))
      val offset = 1000000000000L
      val planted = base.select((col("vec_id") + offset).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (a, b) => a * lit(0.7f) + b * lit(0.3f)).as("embedding"),
        lit(1).as("label"))
      val corpus = base.unionByName(planted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val planes = VectorOps.autoPlaneCount(n)
      val bands = VectorOps.srpBandCountForPlanes(planes)
      val plantedPairs = n / 2
      def minedPlanted(df: org.apache.spark.sql.DataFrame): Long =
        df.filter(col("vec_b") - col("vec_a") === offset).count()
      def timed(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // (a) the Auto API as shipped — banded candidates
      val (mb, tb) = timed(minedPlanted(
        VectorOps.mutualNeighborsAuto(corpus, knownN = Some(n))))
      // (b) the pre-port shape: one band of the same auto-sized planes
      val (m1, t1) = timed(minedPlanted(
        VectorOps.mutualNeighbors(corpus, 1, planes)))
      def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(v))
      println(s"""{"miner_recall":{"dir":"$dir","n":$n,""" +
        s""""planes":$planes,"bands":$bands,"planted":$plantedPairs,""" +
        s""""banded_mined":$mb,""" +
        s""""banded_recall":${d3(mb.toDouble / plantedPairs)},""" +
        s""""single_mined":$m1,""" +
        s""""single_recall":${d3(m1.toDouble / plantedPairs)},""" +
        s""""banded_secs":${d3(tb)},"single_secs":${d3(t1)}}}""")
      corpus.unpersist()
    }
    spark.stop()
  }
}
