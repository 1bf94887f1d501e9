package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.Components

/** Scale proof for the connected-components fixpoint: rounds must track
  * the planted graph DIAMETER, not the node count, and per-round shuffle
  * volume must stay flat (labels only — the edges never reshuffle).
  *
  *   runMain graft.tools.ComponentsBench [nClusters] [chainLen]
  *
  * Graph: `nClusters` 5-node star clusters (the near-dup shape: LSH
  * buckets make duplicate groups mutually adjacent, diameter 2) plus
  * 1000 planted path components of `chainLen` nodes (the adversarial
  * long-diameter tail). Defaults: 400k clusters → 2M star nodes + 12k
  * chain nodes; ~1.61M edges. Expected rounds ≈ chainLen (the chains
  * dominate the diameter; the 2M star nodes converge in 2).
  */
object ComponentsBench {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toInt).getOrElse(400000)
    val chainLen = args.lift(1).map(_.toInt).getOrElse(12)
    // chainLen 1 would make sequence(0, chainLen-2) DESCEND ([0,-1]),
    // planting edges into neighboring id ranges instead of isolated nodes
    require(chainLen >= 2, s"chainLen must be >= 2, got $chainLen")
    val nChains = 1000
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    // star clusters: hub = c*5, spokes c*5+1..4
    val stars = spark.range(nClusters)
      .select((col("id") * 5).as("base"),
        explode(sequence(lit(1), lit(4))).as("k"))
      .select(col("base").as("src"), (col("base") + col("k")).as("dst"))
    // chains: node ids offset past the stars; edges (i, i+1)
    val chainBase = nClusters * 5L
    val chains = spark.range(nChains)
      .select((lit(chainBase) + col("id") * chainLen).as("s0"),
        explode(sequence(lit(0), lit(chainLen - 2))).as("i"))
      .select((col("s0") + col("i")).as("src"),
        (col("s0") + col("i") + 1).as("dst"))
    val edges = stars.unionByName(chains)

    val t0 = System.nanoTime()
    val (labels, stats) = Components.connectedComponentsWithStats(
      edges, "src", "dst", maxIter = chainLen + 5, localThreshold = 0L)
    val nComponents = labels.select("component").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    val st = stats.get
    // Locale.ROOT: the f interpolator renders decimal COMMAS on e.g.
    // de_DE JVMs — invalid JSON (same guard as Bench.d4)
    def d(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    val perRound = st.perRound.map(r =>
      s"""{"round":${r.round},"changed":${r.changed},"secs":${d(r.secs, 2)},""" +
        s""""shuffle_read_mb":${d(r.shuffleReadMB, 1)},""" +
        s""""shuffle_write_mb":${d(r.shuffleWriteMB, 1)}}""")
      .mkString("[", ",", "]")
    println(
      s"""{"components_bench": {"nodes": ${st.nodes}, "edges": ${st.edges}, """ +
        s""""components": $nComponents, "expected_components": ${nClusters + nChains}, """ +
        s""""rounds": ${st.rounds}, "chain_len": $chainLen, "secs": ${d(secs, 1)}, """ +
        s""""per_round": $perRound}}""")
    assert(nComponents == nClusters + nChains,
      s"component count $nComponents != planted ${nClusters + nChains}")
    spark.stop()
  }
}
