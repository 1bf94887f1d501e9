package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Micro-bench for [[graft.ops.Sketches.bloomPrune]] at the q59 shape:
  * lineitem filtered by a bloom over urgent orders' keys, then the
  * residual semi join — vs the two plans a user would otherwise write.
  *
  *   runMain graft.tools.BloomBench [sfDir] [reps]
  *
  * Variants (all produce identical rows; q59's oracle gate proves it):
  *   bloom+semi  — bloomPrune (deserialized closure probe) + semi join
  *   broadcast   — plain broadcast left-semi, no prune
  *   shuffle     — plain shuffle left-semi (broadcast disabled), the
  *                 plan a too-big-to-broadcast dim forces at scale
  *
  * The interesting comparison is bloom+semi vs shuffle: the bloom exists
  * for the regime where the dim side exceeds the broadcast threshold but
  * its KEY BLOOM (~1.2 MB per 1M keys at 1% fpp) still fits on the
  * driver, so the fact side sheds non-joining rows before its shuffle.
  * At test scale broadcast wins (the dim fits); the number to carry is
  * how much fact-shuffle volume the prune removes.
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    def urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    def fact = Tables.lineitem(spark, sfDir)

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "bloom+semi" -> (() => agg(
        graft.ops.Sketches.bloomPrune(fact, col("l_orderkey"), urgent, 200000L)
          .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi"))),
      "broadcast" -> (() => agg(
        fact.join(broadcast(urgent),
          col("l_orderkey") === col("o_orderkey"), "left_semi"))),
      "shuffle" -> (() => agg(
        fact.join(urgent.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"), "left_semi"))),
      "bloom+shuffle" -> (() => agg(
        graft.ops.Sketches.bloomPrune(fact, col("l_orderkey"), urgent, 200000L)
          .join(urgent.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")))
    )

    // selectivity of the prune at this sf (what the bloom buys)
    val total = fact.count()
    val kept = graft.ops.Sketches
      .bloomPrune(fact, col("l_orderkey"), urgent, 200000L).count()
    println(f"[bloom] fact rows $total%d, bloom-kept $kept%d " +
      f"(${100.0 * kept / total}%.1f%% pass the probe)")

    for ((name, mk) <- variants) {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bloom] $name%-11s min ${times.min}%.3f s  " +
        s"(reps ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
