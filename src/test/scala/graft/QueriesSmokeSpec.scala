package graft

/** Smoke: every registered query runs at sf0.001 and the flagship returns
  * rows. Value-level correctness is the driver's DuckDB oracle gate
  * (tools/check.py locally). */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty || missing.forall(_.endsWith("_noracle")),
      s"queries without oracle SQL: $missing")
  }

  test("no orphan oracle SQL (oracle key without a registered query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }

  test("q111 source matrix accounts for every q28 verified pair") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("q28_neardup_verified")(spark, sf).count()
    val m = SparkEntry.queries("q111_dup_source_matrix")(spark, sf)
    val cells = m.collect()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == pairs)
    // orientation-normalized: one cell per unordered source pair
    cells.foreach(r => assert(
      r.getAs[String]("source_a") <= r.getAs[String]("source_b")))
    assert(m.groupBy("source_a", "source_b").count()
      .filter(col("count") > 1).count() == 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 and returns a sane schema") {
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
