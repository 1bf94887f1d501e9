package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class DedupSpec extends SparkSpecBase {

  test("firstRowPerGroup keeps exactly the deterministic first row") {
    import spark.implicits._
    val df = Seq(
      ("a", 2, "x"), ("a", 1, "y"), ("b", 5, "z"), ("b", 5, "w")
    ).toDF("k", "ord", "payload")
    val got = Dedup.firstRowPerGroup(df, Seq(col("k")),
      Seq(col("ord").asc, col("payload").asc))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(2)))
    assert(got.toSeq == Seq(("a", "y"), ("b", "w")))
  }

  test("antiAppend drops already-present keys AND within-batch duplicates") {
    import spark.implicits._
    val existing = Seq(("k1", 1L)).toDF("key", "id")
    val incoming = Seq("k1", "k2", "k2", "k3").toDF("key")
    val got = Dedup.antiAppend(incoming, existing, Seq("key"))
      .orderBy("key").as[String].collect()
    assert(got.toSeq == Seq("k2", "k3"))
  }

  test("antiAppendDeterministic picks the tiebreak-first survivor per key") {
    import spark.implicits._
    val existing = Seq(("k0", "old")).toDF("key", "payload")
    val incoming = Seq(
      ("k0", "zz"), ("k1", "b"), ("k1", "a"), ("k1", "c"), ("k2", "x")
    ).toDF("key", "payload")
    for (parts <- Seq(1, 4)) {
      val got = Dedup.antiAppendDeterministic(
          incoming.repartition(parts), existing, Seq("key"),
          Seq(col("payload").asc))
        .orderBy("key").collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq == Seq(("k1", "a"), ("k2", "x")), s"parts=$parts")
    }
  }

  test("left_anti equals NOT IN only for non-null keys (documented risk 3)") {
    import spark.implicits._
    val left = Seq(Option("a"), Option("b"), None).toDF("key")
    val right = Seq(Option("a"), None).toDF("key")
    // left_anti keeps 'b' AND the null row; SQL NOT IN would return zero
    // rows when the subquery contains a NULL. Keys in the engine's id maps
    // are non-null, where the two coincide.
    val anti = left.join(right, Seq("key"), "left_anti").count()
    assert(anti == 2)
    left.createOrReplaceTempView("dedup_spec_l")
    right.createOrReplaceTempView("dedup_spec_r")
    val notIn = spark.sql(
      "SELECT count(*) FROM dedup_spec_l " +
        "WHERE key NOT IN (SELECT key FROM dedup_spec_r)").head().getLong(0)
    assert(notIn == 0)
  }

  test("keysetPage pages the full set exactly once, filter pushed down") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val total = orders.count()
    var seen = Vector.empty[Long]
    var after: Option[Any] = None
    var page = Dedup.keysetPage(orders, "o_orderkey", 700, after)
    while (page.count() > 0) {
      val keys = page.select("o_orderkey").collect().map(_.getLong(0))
      seen ++= keys
      after = Some(keys.max)
      page = Dedup.keysetPage(orders, "o_orderkey", 700, after)
    }
    assert(seen.length == total)
    assert(seen == seen.sorted && seen.distinct.length == seen.length)
    // the keyset predicate reaches the parquet scan
    val plan = Dedup.keysetPage(orders, "o_orderkey", 700, Some(100L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), " +
      "GreaterThan(o_orderkey,100)"), plan)
  }

  test("exactDedup keeps one deterministic representative per content") {
    import spark.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "text")
    val got = Dedup.exactDedup(df, Seq(col("text")), col("id").asc)
      .orderBy("id").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "same"), (3L, "other")))
  }

  test("content hash frames fields: no boundary or null collisions") {
    import spark.implicits._
    val none: Option[String] = None
    // every row is DISTINCT content: shifted field boundaries, nulls in
    // different positions, and null-vs-empty must all hash apart — an
    // unframed concat would collide them and exactDedup would DELETE
    // non-duplicate rows
    val df = Seq(
      (1L, Some("ab"), Some("c")),
      (2L, Some("a"), Some("bc")),
      (3L, Some("a"), none),
      (4L, none, Some("a")),
      (5L, Some("a"), Some("")),
      (6L, none, none),
      (7L, Some(""), Some("")))
      .toDF("id", "x", "y")
    val kept = Dedup.exactDedup(df, Seq(col("x"), col("y")), col("id").asc)
    assert(kept.count() == 7, kept.orderBy("id").collect().mkString(","))
    assert(Dedup.exactDupGroups(df, Seq(col("x"), col("y"))).count() == 0)
    // and true duplicates still collapse
    val dup = df.unionByName(df)
    assert(Dedup.exactDedup(dup, Seq(col("x"), col("y")), col("id").asc)
      .count() == 7)
  }

  test("prefixDedup groups by token prefix, keeps the smallest id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h TAIL-ONE x y"),
      (2L, "a b c d e f g h TAIL-TWO z"),   // same 8-token prefix as 1
      (3L, "a b c d e f g DIFFERENT h"),    // diverges at token 8
      (4L, "short doc"))                    // < 8 tokens: whole-text prefix
      .toDF("doc_id", "text")
    val got = Dedup.prefixDedup(docs, "doc_id", "text", 8)
      .select("doc_id", "group_n", "rep", "is_kept")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((2L, 1L, true)))
    assert(got(2L) == ((2L, 1L, false)))
    assert(got(3L) == ((1L, 3L, true)))
    assert(got(4L) == ((1L, 4L, true)))
  }
}
