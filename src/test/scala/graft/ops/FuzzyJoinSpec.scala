package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class FuzzyJoinSpec extends SparkSpecBase {

  test("nearNames equals brute force within the same-last-token block") {
    import spark.implicits._
    val names = Seq(
      (1L, "red widget"), (2L, "rad widget"), (3L, "blue widget"),
      (4L, "red gizmo"), (5L, "rod gizmo"), (6L, "entirely other gizmo"),
      (7L, "red widget"), (8L, "reddest widget"))
    val df = names.toDF("id", "name")
    val got = FuzzyJoin.nearNames(df, "id", "name", maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, na) <- names; (ib, nb) <- names
      if ia < ib
      if na.split(' ').last == nb.split(' ').last // declared block contract
      if lev(na, nb) <= 2
    } yield (ia, ib)).toSet
    assert(got == expected)
    // sanity on the fixture: both an in-block hit and an out-of-block miss
    assert(got.contains((1L, 2L)) && got.contains((1L, 7L)))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("band-edge pairs survive when the SMALLER id is the longer name") {
    import spark.implicits._
    // "abcd x" (len 6, band 1) vs "abc x" (len 5, band 1)… craft a true
    // cross-band pair: len 8 → band 2, len 7 → band 1 (band width 4).
    // id 1 gets the LONGER name — the orientation a probe-up-only
    // explode would lose (regression for the +1-only band probe).
    val df = Seq((1L, "abcdef x"), (2L, "abcde x")).toDF("id", "name")
    val got = FuzzyJoin.nearNames(df, "id", "name", maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("each surviving pair is emitted exactly once") {
    import spark.implicits._
    val df = Seq((1L, "same x"), (2L, "same x"), (3L, "samey x"))
      .toDF("id", "name")
    val rows = FuzzyJoin.nearNames(df, "id", "name", maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(rows.size == rows.distinct.size)
    assert(rows.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("band narrower than maxDist is rejected") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      FuzzyJoin.nearNames(df, "id", "name", maxDist = 5, band = 4)
    }
  }
}
