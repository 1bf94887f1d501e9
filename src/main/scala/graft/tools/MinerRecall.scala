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
  *   runMain graft.tools.MinerRecall synth:2000000:sample32
  *
  * `synth:N` builds N deterministic base vectors (dim 64, hash-derived
  * near-uniform — [[SrpRecall]]'s construction) so the law is checked at
  * corpus sizes beyond the shipped parquet; a plain argument reads
  * `<dir>/embeddings.parquet`. Total corpus is 2N (base + twins).
  *
  * `:sampleK` suffix (r12 verdict #6): measure recall on a deterministic
  * 1/K hash-sample of planted pairs via
  * [[VectorOps.bestCrossLabelPartners]] instead of running the full
  * miner — the contract is per-pair bucket-collision probability, so a
  * pair sample estimates full-run recall unbiasedly (reported with a
  * 95% binomial CI). A pair (v, t) is mined iff best(v) = t AND
  * best(t) = v, and each best() needs only that vector's own candidate
  * sliver — |sample|·bands·bucket work, NOT the full candidate mass
  * whose pair-dedup sort exhausted this box's ~80 GB temp at n ≥ 2M
  * (the measured 57–85 GB SPILL_OUT_OF_MEMORY aborts; a few hundred GB
  * of routine shuffle on a real cluster). */
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
    args.foreach { arg =>
      val (dir, sampleK) = arg.split(":sample") match {
        case Array(d, k) => (d, Some(k.toInt))
        case _ => (arg, None)
      }
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
      def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(v))
      sampleK match {
        case None =>
          // (a) the Auto API as shipped — banded candidates
          val (mb, tb) = timed(minedPlanted(
            VectorOps.mutualNeighborsAuto(corpus, knownN = Some(n))))
          // (b) the pre-port shape: one band of the same auto-sized planes
          val (m1, t1) = timed(minedPlanted(
            VectorOps.mutualNeighbors(corpus, 1, planes)))
          println(s"""{"miner_recall":{"dir":"$dir","n":$n,""" +
            s""""planes":$planes,"bands":$bands,"planted":$plantedPairs,""" +
            s""""banded_mined":$mb,""" +
            s""""banded_recall":${d3(mb.toDouble / plantedPairs)},""" +
            s""""single_mined":$m1,""" +
            s""""single_recall":${d3(m1.toDouble / plantedPairs)},""" +
            s""""banded_secs":${d3(tb)},"single_secs":${d3(t1)}}}""")
        case Some(k) =>
          // sampled: pick a deterministic 1/k hash-sample of planted
          // BASE ids, measure the miner's per-pair indicator exactly —
          // best(v) = twin AND best(twin) = v — over candidate slivers
          val sampleBase = base
            .filter(pmod(xxhash64(col("vec_id"), lit("mrs#r13")),
              lit(k.toLong)) === 0)
            .select(col("vec_id"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val s = sampleBase.count()
          val srcIds = sampleBase
            .unionByName(sampleBase.select(
              (col("vec_id") + offset).as("vec_id")))
          def sampledMined(bnds: Int): Long =
            VectorOps.bestCrossLabelPartners(corpus, srcIds, bnds, planes)
              .groupBy(least(col("src"), col("best_dst")).as("a"),
                greatest(col("src"), col("best_dst")).as("b"))
              .agg(count(lit(1)).as("__n"))
              .filter(col("__n") === 2 && col("b") - col("a") === offset)
              .count()
          val (mb, tb) = timed(sampledMined(bands))
          val (m1, t1) = timed(sampledMined(1))
          val rb = mb.toDouble / s
          val r1 = m1.toDouble / s
          def ci(r: Double) = 1.96 * math.sqrt(r * (1 - r) / s)
          println(s"""{"miner_recall_sampled":{"dir":"$arg","n":$n,""" +
            s""""planes":$planes,"bands":$bands,"planted":$plantedPairs,""" +
            s""""sampled_pairs":$s,""" +
            s""""banded_mined":$mb,"banded_recall":${d3(rb)},""" +
            s""""banded_ci95":${d3(ci(rb))},""" +
            s""""single_mined":$m1,"single_recall":${d3(r1)},""" +
            s""""single_ci95":${d3(ci(r1))},""" +
            s""""banded_secs":${d3(tb)},"single_secs":${d3(t1)}}}""")
          sampleBase.unpersist()
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
