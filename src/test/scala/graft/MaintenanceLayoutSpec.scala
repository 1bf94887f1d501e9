package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Ivm, Sharding}

/** Round-5 maintenance/layout family: retraction-capable aggregate-state
  * IVM (q241), golden-record survivorship (q242), zone-map prunability
  * (q243). The value gate is the DuckDB oracle; these specs pin the
  * algebraic contracts — maintenance ≡ recompute, canonical-pick
  * determinism, pruning soundness — a value compare can't see. */
class MaintenanceLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("aggState merge ≡ recompute over insert + retraction deltas") {
    val base = Seq(("a", 1.0), ("a", 2.5), ("b", 4.0), ("c", 7.0))
      .toDF("k", "v")
    val inserts = Seq(("a", 10.0), ("d", 1.25)).toDF("k", "v")
    val deletes = Seq(("a", 1.0), ("b", 4.0)).toDF("k", "v")
    val state = Ivm.aggState(base, Seq("k"), "v", lit(1L))
    val delta = Ivm.aggState(
      inserts.withColumn("__w", lit(1L))
        .unionByName(deletes.withColumn("__w", lit(-1L))),
      Seq("k"), "v", col("__w"))
    val maintained = Ivm.mergeAggState(state, delta, Seq("k"))
    // ground truth: (base ∖ deletes) ∪ inserts, recomputed from scratch
    val truth = Ivm.aggState(
      Seq(("a", 2.5), ("c", 7.0), ("a", 10.0), ("d", 1.25)).toDF("k", "v"),
      Seq("k"), "v", lit(1L))
    assert(canon(maintained) == canon(truth))
    // 'b' was fully retracted → the key must DISAPPEAR, like a recompute
    assert(!maintained.collect().exists(_.getString(0) == "b"))
  }

  test("aggState: zero-sum delta leaves cnt keys intact, totals moved") {
    // an UPDATE expressed as retract-old + insert-new: cnt unchanged
    val state = Ivm.aggState(Seq(("k", 5.0)).toDF("k", "v"),
      Seq("k"), "v", lit(1L))
    val upd = Ivm.aggState(
      Seq(("k", 5.0, -1L), ("k", 8.0, 1L)).toDF("k", "v", "w"),
      Seq("k"), "v", col("w"))
    val r = Ivm.mergeAggState(state, upd, Seq("k")).collect().head
    assert(r.getAs[Long]("cnt") == 1L)
    assert(r.getAs[java.math.BigDecimal]("total").doubleValue == 8.0)
  }

  test("goldenRecord: mode wins, ties break (count desc, value asc)") {
    val df = Seq(
      (1L, "en", "srcB"), (1L, "en", "srcA"), (1L, "de", "srcA"),
      (2L, null, "x"), (2L, "fr", "x")).toDF("c", "lang", "source")
    val g = Dedup.goldenRecord(df, col("c"), Seq("lang", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(g((1L, "lang")) == (("en", 2L, 3L)))     // clear mode
    assert(g((1L, "source")) == (("srcA", 2L, 3L))) // 2-2 tie → asc value
    assert(g((2L, "lang")) == (("fr", 1L, 1L)))     // nulls don't vote
    assert(g((2L, "source")) == (("x", 2L, 2L)))
  }

  test("goldenRecord is partitioning-invariant") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select((col("doc_id") % 7).as("c"), col("lang"), col("source"))
    val a = Dedup.goldenRecord(df, col("c"), Seq("lang", "source"))
    val b = Dedup.goldenRecord(df.repartition(5, col("lang")),
      col("c"), Seq("lang", "source"))
    assert(canon(a) == canon(b))
  }

  test("zoneMap bounds are exact and prunedShards is sound") {
    val df = Seq((0, 10L), (0, 20L), (1, 100L), (1, 200L), (2, 35L))
      .toDF("shard", "x")
    val zm = Sharding.zoneMap(df, col("shard"), Seq("x" -> col("x")))
    val bounds = zm.collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(bounds(0) == ((10L, 20L)) && bounds(1) == ((100L, 200L)))
    // predicate [30, 40]: shard 0 (max 20 < 30) and shard 1 (min 100 >
    // 40) prune; shard 2 overlaps → 2/3
    val p = Sharding.prunedShards(zm, "x", 30L, 40L, "t").collect().head
    assert(p.getAs[Long]("n_shards") == 3L && p.getAs[Long]("pruned") == 2L)
    // soundness: no pruned shard contains a row matching the predicate
    val prunedIds = zm.filter(col("hi") < 30L || col("lo") > 40L)
      .select("shard").as[Int].collect().toSet
    val hits = df.filter(col("x").between(30L, 40L))
      .select("shard").as[Int].collect().toSet
    assert(prunedIds.intersect(hits).isEmpty)
  }

  test("cmsJoinSize: one-sided bound, exact when collision-free, width law") {
    import graft.ops.Sketches
    // join size = Σ fA·fB = 2·3 + 1·1 = 7
    val a = Seq("x", "x", "y", "z").toDF("k")
    val b = Seq("x", "x", "x", "y", "w").toDF("k")
    val exact = 7L
    val wide = Sketches.cmsJoinSize(a, col("k"), b, col("k"),
      depth = 4, width = 1024).collect().head
    assert(wide.getAs[Long]("est") >= exact, "never under-estimates")
    assert(wide.getAs[Long]("est") == exact,
      "4 keys in 1024 buckets: collision-free, estimate exact")
    // width law: narrower sketch over-counts more, never less
    val narrow = Sketches.cmsJoinSize(a, col("k"), b, col("k"),
      depth = 4, width = 2).collect().head
    assert(narrow.getAs[Long]("est") >= wide.getAs[Long]("est"))
  }

  test("rollingActive: window coverage, dedup, and observed-day gate") {
    import java.sql.Timestamp
    import graft.ops.TimeSeries
    def t(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // u1 active day 1 (twice) and day 5; u2 active day 5 only
    val df = Seq((t(1, 9), 1L), (t(1, 17), 1L), (t(5, 9), 1L),
      (t(5, 10), 2L)).toDF("ts", "u")
    val out = TimeSeries.rollingActive(df, "ts", "u", 3).collect()
      .map(r => r.getDate(0).toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    // only observed days appear (no phantom day-6/7 rows)
    assert(out.keySet == Set("2024-01-01", "2024-01-05"))
    assert(out("2024-01-01") == ((1L, 1L)), "double event counts once")
    // day 5 trailing-3 window [3,5] contains only day-5 activity
    assert(out("2024-01-05") == ((2L, 2L)))
    // widen to 5 days: day 5 window [1,5] picks up u1's day-1 activity
    // but wau still dedups u1 across days → 2, not 3
    val wide = TimeSeries.rollingActive(df, "ts", "u", 5).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("wau")).toMap
    assert(wide("2024-01-05") == 2L)
  }

  test("zoneMap: all-null stat shard has NULL bounds, never prunes") {
    val df = Seq((0, Some(5L)), (1, None), (1, None))
      .toDF("shard", "x")
    val zm = Sharding.zoneMap(df, col("shard"), Seq("x" -> col("x")))
    val r1 = zm.filter(col("shard") === 1).collect().head
    assert(r1.isNullAt(r1.fieldIndex("lo")))
    assert(r1.getAs[Long]("n_null") == 2L)
    val p = Sharding.prunedShards(zm, "x", 100L, 200L, "t")
      .collect().head
    assert(p.getAs[Long]("pruned") == 1L, "only the non-null shard prunes")
  }
}
