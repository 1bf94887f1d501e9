package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures what [[graft.plans.ProximityJoinRewrite]] buys: the same
  * proximity self-join timed through the rewritten banded plan vs the
  * nested-loop plan the naive spelling otherwise forces.
  *
  * The baseline is expressed as `(a−b) <= c AND (b−a) <= c` —
  * semantically identical to `abs(a−b) <= c` but outside the rule's
  * Abs-pattern match, so the optimizer leaves it as
  * BroadcastNestedLoopJoin. Run at sf0.01 by default: the nested loop
  * is O(n²) COMPARISONS (10k² = 1e8 here), which is exactly the point —
  * at sf0.1 the baseline is already a 100× non-starter while the banded
  * plan stays match-bound.
  *
  *   runMain graft.tools.ProxBench [sfDir]
  */
object ProxBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val a = e.select(col("event_id").as("id_a"), col("us").as("us_a"))
    val b = e.select(col("event_id").as("id_b"), col("us").as("us_b"))
    val boundUs = 300000000L // 5 minutes

    def banded: DataFrame = a.join(b,
      abs(col("us_a") - col("us_b")) <= lit(boundUs) &&
        col("id_a") < col("id_b"))
    def nestedLoop: DataFrame = a.join(b,
      (col("us_a") - col("us_b")) <= lit(boundUs) &&
        (col("us_b") - col("us_a")) <= lit(boundUs) &&
        col("id_a") < col("id_b"))

    def time(name: String, df: => DataFrame): (Long, Double) = {
      val plan = df.queryExecution.executedPlan.toString
      val shape =
        if (plan.contains("BroadcastNestedLoopJoin")) "nested-loop"
        else if (plan.contains("Expand")) "banded-equi"
        else "other"
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[proxbench] $name%-12s plan=$shape%-12s rows=$n%9d " +
        f"time=$sec%7.2f s")
      (n, sec)
    }

    val (n1, t1) = time("banded", banded)
    val (n2, t2) = time("nested-loop", nestedLoop)
    require(n1 == n2, s"result mismatch: $n1 vs $n2")
    println(f"[proxbench] identical results; speedup ${t2 / t1}%.1fx " +
      s"at ${e.count()} rows (comparisons n^2 vs band-local)")
    spark.stop()
  }
}
