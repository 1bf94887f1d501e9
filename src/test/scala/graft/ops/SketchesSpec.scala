package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SketchesSpec extends SparkSpecBase {

  private def orders = spark.read.parquet(s"$sf/orders.parquet")
  private def lineitem = spark.read.parquet(s"$sf/lineitem.parquet")

  test("HLL distinct counts land within rsd of exact") {
    val approx = Sketches.distinctCounts(orders,
        Seq(col("o_orderstatus")), col("o_custkey"), rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k).toDouble
      assert(math.abs(a - e) / e < 0.10, s"$k: approx $a vs exact $e")
    }
  }

  test("approx percentiles bracket the exact ones") {
    val approx = Sketches.quantiles(lineitem, Seq(col("l_returnflag")),
        col("l_extendedprice"), Seq(0.5), accuracy = 10000)
      .select(col("l_returnflag"), col("approx_pcts")(0).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = lineitem.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, e) <- exact)
      assert(math.abs(approx(k) - e) / e < 0.05,
        s"$k: approx ${approx(k)} vs exact $e")
  }

  test("bloomPrune works for string keys (no false negatives)") {
    import spark.implicits._
    val fact = (1 to 500).map(i => (s"k$i", i)).toDF("key", "v")
    val dim = (1 to 500 by 25).map(i => s"k$i").toDF("key")
    val pruned = Sketches.bloomPrune(fact, col("key"), dim, 20, 0.01)
    assert(pruned.join(dim, Seq("key")).count()
      == fact.join(dim, Seq("key")).count())
    assert(pruned.count() < 100) // 20 true keys + few false positives
  }

  test("bloomPrune never drops joinable rows, prunes most others") {
    // dim: 5% of customers; fact: orders
    val dim = orders.select(col("o_custkey")).distinct()
      .filter(col("o_custkey") % 20 === 0)
    val pruned = Sketches.bloomPrune(orders, col("o_custkey"), dim,
      expectedDim = 200, fpp = 0.01)
    val joinExact = orders.join(dim, Seq("o_custkey")).count()
    val joinPruned = pruned.join(dim, Seq("o_custkey")).count()
    assert(joinExact == joinPruned) // no false negatives
    val kept = pruned.count().toDouble / orders.count()
    assert(kept < 0.2, s"pruned fraction too weak: kept $kept")
  }
}
