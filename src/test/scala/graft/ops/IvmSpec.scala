package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class IvmSpec extends SparkSpecBase {

  /** Bag (multiset) compare: group-by-all-columns counts must match. */
  private def bagEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.sorted.map(col).toSeq
    val ca = a.groupBy(cols: _*).count()
    val cb = b.groupBy(cols: _*).count()
    ca.unionByName(cb).distinct().count() == ca.count() &&
      ca.count() == cb.count()
  }

  test("joinDelta equals full-join minus base-join, bag-exactly") {
    import spark.implicits._
    val a0 = Seq((1, "a1"), (2, "a2"), (2, "a2dup")).toDF("k", "av")
    val da = Seq((2, "a2new"), (3, "a3")).toDF("k", "av")
    val b0 = Seq((1, "b1"), (2, "b2"), (3, "b3")).toDF("k", "bv")
    val db = Seq((1, "b1new"), (2, "b2new")).toDF("k", "bv")
    val delta = Ivm.joinDelta(a0, da, b0, db, Seq("k"))
    val full = a0.unionByName(da).join(b0.unionByName(db), Seq("k"))
    val base = a0.join(b0, Seq("k"))
    assert(bagEqual(delta, full.exceptAll(base)))
  }

  test("cross-delta rows (ΔA ⋈ ΔB) appear exactly once") {
    import spark.implicits._
    val a0 = Seq.empty[(Int, String)].toDF("k", "av")
    val da = Seq((9, "a")).toDF("k", "av")
    val b0 = Seq.empty[(Int, String)].toDF("k", "bv")
    val db = Seq((9, "b")).toDF("k", "bv")
    val delta = Ivm.joinDelta(a0, da, b0, db, Seq("k")).collect()
    assert(delta.length == 1)
  }

  test("empty deltas produce an empty maintenance batch") {
    import spark.implicits._
    val a0 = Seq((1, "a")).toDF("k", "av")
    val b0 = Seq((1, "b")).toDF("k", "bv")
    val none = Seq.empty[(Int, String)]
    assert(Ivm.joinDelta(a0, none.toDF("k", "av"),
      b0, none.toDF("k", "bv"), Seq("k")).count() == 0L)
  }

  test("maintained view equals recomputed view after applying the delta") {
    import spark.implicits._
    val a0 = (1 to 40).map(i => (i % 7, s"a$i")).toDF("k", "av")
    val da = (41 to 50).map(i => (i % 7, s"a$i")).toDF("k", "av")
    val b0 = (1 to 30).map(i => (i % 5, s"b$i")).toDF("k", "bv")
    val db = (31 to 38).map(i => (i % 5, s"b$i")).toDF("k", "bv")
    val maintained = a0.join(b0, Seq("k"))
      .unionByName(Ivm.joinDelta(a0, da, b0, db, Seq("k")))
    val recomputed = a0.unionByName(da).join(b0.unionByName(db), Seq("k"))
    assert(bagEqual(maintained, recomputed))
  }
}
