package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class DiffSpec extends SparkSpecBase {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldV = Seq((1L, Some("a"), Some("x")), (2L, Some("b"), Some("y")),
      (3L, Some("c"), Some("z"))).toDF("id", "p", "q")
    val newV = Seq((2L, Some("b"), Some("y")), (3L, Some("c"), Some("Z")),
      (4L, Some("d"), Some("w"))).toDF("id", "p", "q")
    val got = Diff.snapshotDiff(oldV, newV, Seq("id"), Seq("p", "q"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("digest framing: null vs empty and shifted boundaries differ") {
    val none: Option[String] = None
    // same concatenation, different fields — an unframed digest would
    // report 'unchanged' for every one of these edits
    val oldV = Seq((1L, Some("ab"), Some("c")), (2L, Some("a"), none),
      (3L, Some(""), Some(""))).toDF("id", "p", "q")
    val newV = Seq((1L, Some("a"), Some("bc")), (2L, Some("a"), Some("")),
      (3L, none, none)).toDF("id", "p", "q")
    val got = Diff.snapshotDiff(oldV, newV, Seq("id"), Seq("p", "q"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.forall(_ == "changed"), got.toString)
  }

  test("diffSummary counts per status") {
    val oldV = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val newV = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val got = Diff.diffSummary(oldV, newV, Seq("id"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("removed" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("tableDigest: order- and partitioning-invariant, change-sensitive") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null)).toDF("id", "v")
    def dig(d: org.apache.spark.sql.DataFrame) =
      Diff.tableDigest(d, Seq("id", "v")).collect().head
    val base = dig(df)
    assert(base.getAs[Long]("n_rows") === 3L)
    assert(dig(df.repartition(7)).getAs[Long]("digest") ===
      base.getAs[Long]("digest"))
    assert(dig(df.orderBy(col("v").desc_nulls_last))
      .getAs[Long]("digest") === base.getAs[Long]("digest"))
    // any single-value change moves the digest
    val tweaked = Seq((1L, "a"), (2L, "B"), (3L, null)).toDF("id", "v")
    assert(dig(tweaked).getAs[Long]("digest") !==
      base.getAs[Long]("digest"))
    // framing: ("ab", "c") vs ("a", "bc") must differ
    val ab = Seq(("ab", "c")).toDF("x", "y")
    val a = Seq(("a", "bc")).toDF("x", "y")
    assert(dig2(ab) !== dig2(a))
  }

  private def dig2(d: org.apache.spark.sql.DataFrame): Long =
    Diff.tableDigest(d, Seq("x", "y")).collect().head.getAs[Long]("digest")

  test("tableDigest rejects formatter-dependent column types") {
    val df = Seq((1L, 1.5)).toDF("id", "d")
    intercept[IllegalArgumentException] {
      Diff.tableDigest(df, Seq("id", "d"))
    }
  }
}
