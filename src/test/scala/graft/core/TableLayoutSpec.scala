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

  test("partition pruning: a day predicate reads only that day's directory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val events = graft.core.Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
    val path = "target/sparktmp/events_by_day"
    TableLayout.writePartitioned(events, path, "day")
    val nDays = events.select("day").distinct().count()
    assert(nDays > 1, s"need multiple partitions, got $nDays")
    val oneDay = events.select(max("day")).head().getDate(0)
    val pruned = spark.read.parquet(path).filter(col("day") === lit(oneDay))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    // planning-time pruning visible in the scan node…
    assert(scan.metadata("PartitionFilters").contains("day"), scan.metadata)
    // …and execution-real: every file actually read lives in the one
    // matching day= directory (of 30)
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains(s"day=$oneDay")),
      files.mkString("\n"))
    assert(pruned.count() ==
      events.filter(col("day") === lit(oneDay)).count())
  }

  test("minhash aggregation on a doc_id-bucketed corpus needs no exchange") {
    // at 100 TB the (doc, shingle-hash) → minhash groupBy(doc_id) is the
    // near-dup pipeline's first aggregation; bucketing the corpus by
    // doc_id at ingest lets it run entirely map-side
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    TableLayout.writeBucketed(docs, "bucketed_docs", "doc_id", 8)
    val mh = graft.ops.NearDup.minhashRows(
      graft.ops.NearDup.shingleRows(
        TableLayout.read(spark, "bucketed_docs"), "doc_id", "text", 3),
      "doc_id", 16)
    val plan = mh.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(mh.count() > 0)
  }

  test("compact preserves a hive-partitioned layout and its pruning") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_p")
      .toString + "/t"
    val src = (1L to 900L).map(i => (i, s"d${i % 3}", s"pay$i"))
      .toDF("id", "day", "payload")
    src.repartition(12).write.partitionBy("day").parquet(dir)
    TableLayout.compact(spark, dir, targetFileBytes = 1L * 1024 * 1024)
    // layout intact: still day=* dirs, one file each after compaction
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(parts.length == 3, parts.mkString(","))
    parts.foreach { p =>
      assert(p.listFiles().count(_.getName.endsWith(".parquet")) == 1, p)
    }
    // content + partition column survive (as the string it was written as)
    val back = spark.read.parquet(dir)
      .select(col("id"), col("day").cast("string"), col("payload"))
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("compact recovers an interrupted swap without phantom partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_r")
      .toString + "/t"
    val src = (1L to 300L).map(i => (i, s"d${i % 3}", s"pay$i"))
      .toDF("id", "day", "payload")
    src.repartition(6).write.partitionBy("day").parquet(dir)
    // simulate a crash between rename-aside and swap for partition day=d1:
    // the live dir is gone, the complete old copy sits dot-prefixed
    val live = new java.io.File(dir, "day=d1")
    val aside = new java.io.File(dir, ".day=d1.compact_old")
    assert(live.renameTo(aside))
    // a dot-path is invisible to Spark — no phantom 'day=d1.compact_old'
    // partition, which an unhidden aside name would create (duplicating
    // every row of the partition after a crash)
    assert(spark.read.parquet(dir).select("day").distinct().count() == 2)
    // recovery: compact restores the aside copy, then compacts normally
    TableLayout.compact(spark, dir, targetFileBytes = 1L * 1024 * 1024)
    val back = spark.read.parquet(dir)
      .select(col("id"), col("day").cast("string"), col("payload"))
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    val stray = new java.io.File(dir).listFiles()
      .filter(_.getName.contains("compact_"))
    assert(stray.isEmpty, stray.mkString(","))
  }

  test("compact merges a many-file table, preserving content exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .toString + "/t"
    val src = (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "payload")
    src.repartition(64).write.parquet(dir) // the small-files state
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    val after = TableLayout.compact(spark, dir, targetFileBytes = 64L * 1024)
    assert(after < 16, s"still $after files")
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
