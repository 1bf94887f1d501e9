package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class ShardingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("shuffleShard covers every row once, positions dense from 0") {
    val a = Sharding.shuffleShard(docs, col("doc_id"), nShards = 8,
      seed = 7).cache()
    assert(a.count() == docs.count())
    assert(a.select("doc_id").distinct().count() == docs.count())
    // per shard: pos is exactly 0..n-1
    val bad = a.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"))
      .filter($"lo" =!= 0 || $"hi" =!= $"n" - 1)
    assert(bad.count() == 0)
    a.unpersist()
  }

  test("assignment is a pure function of (key, seed): partitioning-" +
    "invariant, seed-sensitive, decorrelated from input order") {
    val k = (d: org.apache.spark.sql.DataFrame) =>
      Sharding.shuffleShard(d, col("doc_id"), 8, seed = 7)
        .select("doc_id", "shard", "pos")
        .as[(Long, Int, Long)].collect().toSet
    val base = k(docs)
    assert(k(docs.repartition(13, $"lang")) == base)
    assert(k(docs.orderBy($"n_chars".desc)) == base)
    val other = Sharding.shuffleShard(docs, col("doc_id"), 8, seed = 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet
    assert(other != base)
    // shuffled: within-shard neighbor positions are not ingest neighbors
    val pairs = Sharding.shuffleShard(docs, col("doc_id"), 1, seed = 7)
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._2)
    val adjacentIngest = pairs.sliding(2).count {
      case Array((a, _), (b, _)) => math.abs(a - b) == 1
      case _                     => false
    }
    // 2500 docs: a random order has ~2 adjacent-id neighbor pairs
    assert(adjacentIngest < pairs.length / 20, s"got $adjacentIngest")
  }

  test("shards balance within birthday noise") {
    val sizes = Sharding.shuffleShard(docs, col("doc_id"), 8, seed = 3)
      .groupBy($"shard").count().select("count").as[Long].collect()
    assert(sizes.length == 8)
    val n = sizes.sum.toDouble
    // uniform hash: each shard within 4 sigma of n/8
    val sigma = math.sqrt(n * (1.0 / 8) * (7.0 / 8))
    sizes.foreach(s => assert(math.abs(s - n / 8) < 4 * sigma + 1,
      s"shard size $s vs ${n / 8}"))
  }

  test("shardManifest totals match the assignment") {
    val a = Sharding.shuffleShard(docs, col("doc_id"), 4, seed = 1)
      .withColumn("n_tok", TextOps.tokenCount(col("text")).cast("long"))
    val m = Sharding.shardManifest(a, Some(col("n_tok")))
      .orderBy($"shard").collect()
    assert(m.map(_.getLong(1)).sum == docs.count())
    val totTok = docs.select(sum(TextOps.tokenCount(col("text"))))
      .as[Long].head()
    assert(m.map(_.getLong(2)).sum == totTok)
  }

  test("shardAppend: same shard as a rebuild, positions continue densely") {
    val (day1, day2) = (docs.filter($"doc_id" % 2 === 0),
      docs.filter($"doc_id" % 2 =!= 0))
    val a1 = Sharding.shuffleShard(day1, col("doc_id"), 4, seed = 9)
    val m1 = Sharding.shardManifest(a1, None)
    val a2 = Sharding.shardAppend(m1, day2, col("doc_id"), 4, seed = 9)
    // same pure hash ⇒ same shard as a full rebuild would give
    val rebuild = Sharding.shuffleShard(docs, col("doc_id"), 4, seed = 9)
      .select($"doc_id", $"shard".as("shard_rb"))
    assert(a2.join(rebuild, "doc_id")
      .filter($"shard" =!= $"shard_rb").count() == 0)
    // union has dense unique positions 0..n-1 per shard
    val union = a1.select($"shard", $"pos")
      .unionByName(a2.select($"shard", $"pos"))
    val perShard = union.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("mn"), max($"pos").as("mx"),
        countDistinct($"pos").as("nd"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("mn") == 0L)
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("nd") == r.getAs[Long]("n"))
    }
    // day-1 rows keep their already-consumed positions (pure append)
    assert(Sharding.shardAppend(m1, day2, col("doc_id"), 4, seed = 9)
      .select($"doc_id", $"shard", $"pos")
      .except(a2.select($"doc_id", $"shard", $"pos")).isEmpty)
  }
}
