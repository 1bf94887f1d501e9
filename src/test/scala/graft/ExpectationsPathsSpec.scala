package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.etl.Expectations
import graft.ops.Attribution

/** Round-5 batch 5: declarative expectations (q253), behavioral paths
  * (q173). */
class ExpectationsPathsSpec extends SparkSpecBase {
  import spark.implicits._

  test("Expectations: every check kind catches its planted violation") {
    val df = Seq(
      (Some(1L), 10.0, "O", "1-URGENT"),
      (None, 20.0, "F", "5-LOW"),       // null key
      (Some(3L), 999.0, "X", "bogus"),  // range + domain + pattern
      (Some(3L), 30.0, "P", "2-HIGH"))  // duplicate key
      .toDF("k", "price", "status", "prio")
    val rep = Expectations.run(df, Seq(
        Expectations.notNull("k"),
        Expectations.inRange("price", 0.0, 100.0),
        Expectations.accepted("status", Seq("O", "F", "P")),
        Expectations.matches("prio", "^[1-5]-")),
      unique = Seq("k")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass"))).toMap
    assert(rep("not_null") == ((1L, false)))
    assert(rep("in_range") == ((1L, false)))
    assert(rep("accepted_values") == ((1L, false)))
    assert(rep("matches") == ((1L, false)))
    assert(rep("unique") == ((1L, false)), "3 non-null keys, 2 distinct")
  }

  test("Expectations: tolerance threshold separates soft from hard fail") {
    val df = (1 to 100).map(i => Tuple1(if (i <= 3) 999.0 else 50.0))
      .toDF("v")
    val rep = Expectations.run(df, Seq(
      Expectations.inRange("v", 0.0, 100.0, maxFrac = 0.05),
      Expectations.inRange("v", 0.0, 100.0, maxFrac = 0.01)))
      .collect().map(r => r.getAs[Double]("viol_frac") ->
        r.getAs[Boolean]("pass"))
    assert(rep.forall(_._1 == 0.03))
    assert(rep.map(_._2).toSeq.sorted == Seq(false, true))
  }

  test("Expectations: fkCovered counts orphans, nulls exempt") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expectations.fkCovered(child, "ck", parent, "pk")
      .collect().head
    assert(r.getAs[Long]("n_violations") == 1L)
    assert(!r.getAs[Boolean]("pass"))
  }

  test("topPaths: step order by (ts, tie), deterministic top-k ties") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = Seq(
      (1L, t(1), 1L, "a"), (1L, t(2), 2L, "b"),   // session 1: a>b
      (2L, t(5), 3L, "b"), (2L, t(4), 4L, "a"),   // session 2: a>b (ts order)
      (3L, t(1), 6L, "c"), (3L, t(1), 5L, "a"))   // session 3: tie → id order a>c
      .toDF("u", "ts", "id", "step")
    val out = Attribution.topPaths(df, Seq(col("u")), "ts", "id",
      "step", 10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head == (("a>b", 2L)))
    assert(out.toSet == Set(("a>b", 2L), ("a>c", 1L)))
    // top-k count ties break by path asc
    val tied = Attribution.topPaths(df, Seq(col("u")), "ts", "id",
      "step", 1).collect()
    assert(tied.length == 1 && tied.head.getString(0) == "a>b")
  }
}
