package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables
import graft.ops.Sharding

/** The on-disk contract of [[ShardSink]]: one file per shard directory,
  * file row order = pos order, read-back equals the assignment, manifest
  * counts match. */
class ShardSinkSpec extends SparkSpecBase {

  test("writeShards: one file per shard, pos-ordered, manifest matches") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = Tables.documents(spark, sf)
    val assigned = Sharding.shuffleShard(docs, col("doc_id"), nShards = 8,
      seed = 11L)
    val manifest = ShardSink.writeShards(assigned, out,
      Some(size(split(col("text"), "\\s+")).cast("long"))).collect()

    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == manifest.length)
    for (d <- shardDirs) {
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
      // single-file parquet read preserves row order: pos must be 0..n-1
      val pos = spark.read.parquet(files.head.getPath)
        .select(col("pos")).collect().map(_.getLong(0))
      assert(pos.toSeq == (0L until pos.length).toSeq,
        s"${d.getName} not pos-ordered")
    }
    // read-back (with the shard partition column) equals the assignment
    val back = spark.read.parquet(out)
    assert(back.count() == assigned.count())
    assert(back.select(col("doc_id"), col("shard").cast("int"), col("pos"))
      .except(assigned.select(col("doc_id"), col("shard"), col("pos")))
      .isEmpty)
    // manifest row counts agree with the per-directory file contents
    val byShard = manifest.map(r =>
      r.getAs[Int]("shard") -> r.getAs[Long]("n_rows")).toMap
    for (d <- shardDirs) {
      val sid = d.getName.stripPrefix("shard=").toInt
      val n = spark.read.parquet(d.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getPath).count()
      assert(byShard(sid) == n)
    }
  }
}
