package graft.tools

/** Scratch profiler for q220's stages (what costs 8 s?). */
object PcaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pca] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    time("count")(emb.count())
    time("means only")(
      graft.ops.VectorOps.dimensionMeans(emb, "embedding"))
    time("cov frame count")(
      graft.ops.VectorOps.covarianceMatrix(emb, "embedding").count())
    time("cov frame collect")(
      graft.ops.VectorOps.covarianceMatrix(emb, "embedding").collect())
    val (mean, eig, comps) = time("pcaComponents")(
      graft.ops.VectorOps.pcaComponents(emb, "embedding", 2))
    val (_, _, _) = time("pcaComponents again")(
      graft.ops.VectorOps.pcaComponents(emb, "embedding", 2))
    println(s"[pca] eig: ${eig.toSeq}")
    val proj = graft.ops.VectorOps.pcaProject(emb,
      Seq("vec_id", "label"), "embedding", mean, comps)
    time("project count")(proj.count())
    time("project again")(proj.count())
    spark.stop()
  }
}
