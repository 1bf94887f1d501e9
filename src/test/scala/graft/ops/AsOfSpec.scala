package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left ts") {
    val purchases = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 102L) // before any signup → null
    ).toDF("user_id", "ts", "purchase_id")
    val signups = Seq(
      (1L, ts("2024-01-01 09:00:00"), 900L),
      (1L, ts("2024-01-01 11:00:00"), 901L),
      (2L, ts("2024-01-01 09:30:00"), 902L)
    ).toDF("user_id", "ts", "signup_id")

    val got = AsOf.asofJoin(purchases, signups, "user_id", "ts",
      Seq("signup_id"))
      .select("purchase_id", "asof_signup_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(100L).contains(900L)) // 10:00 → signup at 09:00
    assert(got(101L).contains(901L)) // 12:00 → signup at 11:00
    assert(got(102L).isEmpty)        // 09:00 < first signup 09:30
  }

  test("equal timestamps match (ASOF >= semantics)") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "ts", "lid")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 7L))
      .toDF("user_id", "ts", "rid")
    val got = AsOf.asofJoin(l, r, "user_id", "ts", Seq("rid")).head()
    assert(got.getAs[Long]("asof_rid") == 7L)
  }

  test("nulls in right value columns never stitch a chimera row") {
    // r1(09:00, a=5, b=null), r2(11:00, a=null, b=7): the as-of match at
    // 12:00 is r2 and must surface AS r2 — (11:00, null, 7). A per-column
    // ignoreNulls fill would emit (11:00, 5, 7), mixing two right rows.
    val l = Seq((1L, ts("2024-01-01 12:00:00"), 1L))
      .toDF("user_id", "ts", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5L), None: Option[Long]),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Long], Some(7L)))
      .toDF("user_id", "ts", "a", "b")
    val got = AsOf.asofJoin(l, r, "user_id", "ts", Seq("a", "b")).head()
    assert(got.getAs[Timestamp]("asof_ts") == ts("2024-01-01 11:00:00"))
    assert(got.isNullAt(got.fieldIndex("asof_a")), got.toString)
    assert(got.getAs[Long]("asof_b") == 7L)
  }

  test("right rows tied on (key, ts) resolve deterministically across partitionings") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "ts", "lid")
    val rRows = Seq((1L, ts("2024-01-01 09:00:00"), 903L),
      (1L, ts("2024-01-01 09:00:00"), 901L),
      (1L, ts("2024-01-01 09:00:00"), 902L))
    // every shuffle/order of the right side must pick the same winner:
    // the greatest carried tuple (here rid=903) under the window tiebreak
    for (perm <- rRows.permutations.take(6); parts <- Seq(1, 3)) {
      val r = perm.toDF("user_id", "ts", "rid").repartition(parts)
      val got = AsOf.asofJoin(l, r, "user_id", "ts", Seq("rid")).head()
      assert(got.getAs[Long]("asof_rid") == 903L,
        s"nondeterministic tie-break for perm=$perm parts=$parts")
    }
  }
}
