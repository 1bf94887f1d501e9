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

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 and returns a sane schema") {
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
