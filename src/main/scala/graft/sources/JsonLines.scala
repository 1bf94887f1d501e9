package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus source/sink — the interchange format LLM data
  * pipelines actually move documents in (one JSON object per line,
  * usually gzip shards). The reference's ingest surface is CSV
  * (`python/enhanced_synthea_to_omop.py:698-706` header-driven COPY);
  * this is the same bronze-layer posture for JSONL: explicit schema
  * (never inference — a schema-inference pass reads the whole corpus
  * twice and locks in whatever the first shard happened to contain),
  * malformed lines CAPTURED, not dropped or crashed on.
  *
  * Scale: Spark's json reader splits uncompressed/bzip2 files and
  * parallelizes gzip shards at file granularity — shard your corpus,
  * don't ship one big .gz. Parse errors land in the corrupt-record
  * column at read, so the good/bad split below is one scan, no repair
  * pass.
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Permissive read with the corrupt line preserved per row. */
  def read(spark: SparkSession, path: String,
           schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already define $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Read split into (clean rows, quarantined raw lines). The parsed
    * frame is persisted first: Spark refuses a filter that references
    * ONLY the internal corrupt-record column on a lazy scan (the
    * pushdown would change what "corrupt" means), and without the
    * persist the two halves would each re-parse the corpus anyway. */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    val parsed = read(spark, path, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val good = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, bad)
  }

  /** Write as `shards` gzip JSONL files — the layout a downstream
    * loader parallelizes over (gzip is splittable only per-file). */
  def write(df: DataFrame, path: String, shards: Int,
            compression: String = "gzip"): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.repartition(shards).write.mode("overwrite")
      .option("compression", compression).json(path)
  }
}
