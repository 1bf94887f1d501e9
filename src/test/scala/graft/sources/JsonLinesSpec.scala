package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpecBase

class JsonLinesSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  test("readSplit parses good lines and quarantines malformed ones") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.writeString(Paths.get(dir, "part0.jsonl"),
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "gamma"}
        |not json at all
        |""".stripMargin)
    val (good, bad) = JsonLines.readSplit(spark, dir, schema)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
    val raw = bad.select("raw_line").as[String].collect()
    assert(raw.length == 2 && raw.exists(_.contains("not json at all")),
      raw.mkString("|"))
  }

  test("write/read roundtrip through gzip shards preserves rows") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString + "/out"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    JsonLines.write(docs, dir, shards = 3)
    // gzip shard layout: one .json.gz per shard
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length == 3, files.mkString(","))
    val (back, bad) = JsonLines.readSplit(spark, dir, schema)
    assert(bad.isEmpty)
    assert(back.count() == docs.count())
    // value-exact roundtrip, not just counts
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
