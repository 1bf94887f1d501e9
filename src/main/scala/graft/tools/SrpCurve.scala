package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Emission-probability curve of the banded SRP tier BELOW the design
  * cosine (r10 verdict #4): the recall contract covers pairs at centered
  * cosine ≥ designCos (0.92 default); dedup users routinely verify at
  * minCos 0.5–0.8, where per-pair emission probability is UNCONTRACTED
  * and falls with cosine — this tool measures that curve instead of
  * leaving it implied. Plants one near-twin per base vector with a
  * per-id blend weight spread over [0.45, 0.95], so planted TRUE cosines
  * cover ≈ [0.55, 0.998]; bins planted pairs by exact cosine (0.05
  * steps) and reports the fraction of each bin the auto-sized banded
  * operator emits, next to the theoretical 1 − (1 − q^p)^b with
  * q = 1 − acos(binMid)/π.
  *
  *   runMain graft.tools.SrpCurve synth:2000 synth:20000 synth:200000
  *
  * Also prints the b(designCos) cost table — the band count the law
  * would charge to EXTEND the contract down to each cosine — so the
  * "cover 0.5 too" price is a number, not a shrug. */
object SrpCurve {
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
    def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    args.foreach { dir =>
      val base = (if (dir.startsWith("synth:"))
          synthBase(spark, dir.stripPrefix("synth:").toLong)
        else graft.core.Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding")))
      val offset = 1000000000000L
      // per-id blend weight in [0.45, 0.95] — planted cosine spans the
      // whole verify-relevant range instead of one band
      val w = (pmod(xxhash64(col("vec_id"), lit(13)), lit(101L))
        .cast("double") / 100.0 * 0.5 + 0.45)
      val planted = base.select((col("vec_id") + offset).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (a, b) => (a * w + b * (lit(1.0) - w)).cast("float"))
          .as("embedding"))
      val corpus = base.unionByName(planted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val planes = VectorOps.autoPlaneCount(n)
      val bands = VectorOps.srpBandCountForPlanes(planes)
      // true planted pairs with their exact ORIGINAL-vector cosine
      val truth = base.join(
          planted.select((col("vec_id") - offset).as("vec_id"),
            col("embedding").as("__e2")), "vec_id")
        .select(col("vec_id"),
          VectorOps.cosine(col("embedding"), col("__e2")).as("tc"))
        .filter(col("tc") >= minCos)
        .withColumn("bin", floor(col("tc") / 0.05) * 0.05)
      val found = VectorOps
        .srpBandedNearDupPairsAuto(corpus, minCos, knownN = Some(n))
        .filter(col("vec_b") - col("vec_a") === offset)
        .select(col("vec_a").as("vec_id"), lit(1).as("hit"))
      val byBin = truth.join(found, Seq("vec_id"), "left")
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("planted"),
          count(col("hit")).as("emitted"))
        .orderBy(col("bin"))
        .collect()
      val q = (c: Double) => 1.0 - StrictMath.acos(c) / math.Pi
      val bins = byBin.map { r =>
        val bin = r.getDouble(0)
        val p = r.getLong(1)
        val e = r.getLong(2)
        val theo = 1.0 -
          StrictMath.pow(1.0 - StrictMath.pow(q(bin + 0.025), planes), bands)
        s"""{"bin":${d3(bin)},"planted":$p,"emitted":$e,""" +
          s""""recall":${d3(e.toDouble / p)},"theory":${d3(theo)}}"""
      }.mkString("[", ",", "]")
      println(s"""{"srp_curve":{"dir":"$dir","n":$n,"planes":$planes,""" +
        s""""bands":$bands,"bins":$bins}}""")
      corpus.unpersist()
    }
    // the cost table: what the law would charge to move the CONTRACT
    // down to each design cosine (planes from each corpus size above)
    val costs = Seq(2000L, 20000L, 200000L, 2000000L).map { nn =>
      val p = VectorOps.autoPlaneCount(2 * nn)
      val row = (50 to 95 by 5).map { c =>
        val dc = c / 100.0
        s""""${d3(dc)}":${VectorOps.srpBandCountForPlanes(p, dc)}"""
      }.mkString("{", ",", "}")
      s"""{"n":${2 * nn},"planes":$p,"bands_by_designCos":$row}"""
    }.mkString("[", ",", "]")
    println(s"""{"srp_cost_table":$costs}""")
    spark.stop()
  }
}
