package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TableLayoutSpec extends SparkSpecBase {

  test("joins on the bucket key read co-located — no exchange in the plan") {
    val person = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("person_id"), col("c_name"))
    val visits = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").as("person_id"), col("o_orderkey"))
    TableLayout.writeBucketed(person, "bucketed_person", "person_id", 8)
    TableLayout.writeBucketed(visits, "bucketed_visits", "person_id", 8)
    // disable broadcast so the join must use the bucket layout (at real
    // scale neither side is broadcastable — that's bucketing's use case)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = TableLayout.read(spark, "bucketed_person")
        .join(TableLayout.read(spark, "bucketed_visits"), "person_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == person.join(visits, "person_id").count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
