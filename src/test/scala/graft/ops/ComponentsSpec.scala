package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("two separate components get their min ids as labels") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("chain case greedy pair-dropping gets wrong: (1,3),(2,3)") {
    // greedy drop-doc_b keeps doc 2 (never a doc_b); CC assigns it to
    // cluster 1 — the whole reason this operator exists
    val got = cc(Seq((1L, 3L), (2L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long path converges (diameter rounds) regardless of direction") {
    val n = 12L
    val back = (1L until n).map(i => (i + 1, i)) // edges all point "down"
    val got = cc(back)
    assert(got === (1L to n).map(_ -> 1L).toMap)
  }

  test("self-loops and duplicate edges are harmless") {
    val got = cc(Seq((5L, 5L), (5L, 6L), (5L, 6L), (6L, 5L)))
    assert(got === Map(5L -> 5L, 6L -> 5L))
  }

  test("labels are partitioning-invariant") {
    val edges = Seq((1L, 9L), (9L, 4L), (2L, 7L), (7L, 2L), (3L, 8L))
    val base = cc(edges)
    val repart = Components.connectedComponents(
        edges.toDF("a", "b").repartition(7, col("b")), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(base === repart)
  }

  test("non-convergence within maxIter fails loudly, never under-merges") {
    val path = (1L until 30L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Components.connectedComponents(path.toDF("a", "b"), "a", "b",
        maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
