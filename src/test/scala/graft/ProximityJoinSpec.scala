package graft

import org.apache.spark.sql.functions._

/** The [[graft.plans.ProximityJoinRewrite]] optimizer rule: a naive
  * abs-difference join must plan as a banded equi-join (hash-
  * partitionable) instead of a nested loop, without changing results —
  * including on negative values, where truncating division would
  * mis-band. */
class ProximityJoinSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("naive abs-join rewrites to an equi-join on bands") {
    import spark.implicits._
    val a = (1L to 200L).map(i => (i, i * 10L)).toDF("id_a", "t_a")
    val b = (1L to 200L).map(i => (i, i * 10L + 3)).toDF("id_b", "t_b")
    val joined = a.join(b, abs(col("t_a") - col("t_b")) <= 7L)
    val p = plan(joined)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    // parity against the arithmetic ground truth
    val got = joined.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      i <- 1L to 200L; j <- 1L to 200L
      if math.abs(i * 10L - (j * 10L + 3)) <= 7L
    } yield (i, j)).toSet
    assert(got == want)
  }

  test("negative values band correctly (floor, not truncate)") {
    import spark.implicits._
    val a = (-50L to 50L).map(i => (i, i * 3L)).toDF("id_a", "t_a")
    val b = (-50L to 50L).map(i => (i, i * 3L - 2L)).toDF("id_b", "t_b")
    val got = a.join(b, abs(col("t_a") - col("t_b")) <= 4L)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      i <- -50L to 50L; j <- -50L to 50L
      if math.abs(i * 3L - (j * 3L - 2L)) <= 4L
    } yield (i, j)).toSet
    assert(got == want)
  }

  test("naive levenshtein join bands on length, results exact") {
    import spark.implicits._
    val words = Seq("cat", "cart", "carts", "dog", "dig", "dug",
      "elephant", "elephants", "relevant", "xy", "xyz", "wxyz")
    val a = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id_a", "w_a")
    val b = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id_b", "w_b")
    val joined = a.join(b,
      levenshtein(col("w_a"), col("w_b")) <= 2 && col("id_a") < col("id_b"))
    val p = plan(joined)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("__prox_band"), p)
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val got = joined.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      i <- words.indices; j <- words.indices
      if i < j && lev(words(i), words(j)) <= 2
    } yield (i.toLong, j.toLong)).toSet
    assert(got == want, s"got ${got.size} want ${want.size}")
  }

  test("extra conjuncts survive; equi-keyed joins are left alone") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i, i * 5L, i % 3)).toDF("id_a", "t_a", "k_a")
    val b = (1L to 100L).map(i => (i, i * 5L + 1, i % 3)).toDF("id_b", "t_b", "k_b")
    // extra non-equi conjunct rides along as a post-filter
    val prox = a.join(b,
      abs(col("t_a") - col("t_b")) <= 6L && col("id_a") < col("id_b"))
    assert(!plan(prox).contains("BroadcastNestedLoopJoin"), plan(prox))
    val got = prox.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      i <- 1L to 100L; j <- 1L to 100L
      if math.abs(i * 5L - (j * 5L + 1)) <= 6L && i < j
    } yield (i, j)).toSet
    assert(got == want)
    // an equality conjunct means the built-in hash join is already
    // right — the rule must not touch it (no band column in the plan)
    val equi = a.join(b,
      col("k_a") === col("k_b") && abs(col("t_a") - col("t_b")) <= 6L)
    assert(!plan(equi).contains("__prox_band"), plan(equi))
    assert(equi.count() == want.count { case (i, j) => i % 3 == j % 3 } +
      (for {
        i <- 1L to 100L; j <- 1L to 100L
        if math.abs(i * 5L - (j * 5L + 1)) <= 6L && i >= j && i % 3 == j % 3
      } yield ()).size)
  }
}
