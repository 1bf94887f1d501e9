package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Sharding

/** Training-shard parquet writer: materializes a
  * [[graft.ops.Sharding.shuffleShard]] assignment as the on-disk layout a
  * training data-loader consumes — one directory per shard, rows inside
  * each file in `pos` order, plus the loader's manifest (rows / token mass
  * per shard).
  *
  * Layout contract: `repartition(col("shard"))` hashes each shard id to
  * exactly one task, and `partitionBy("shard")` then splits task output by
  * value — so every shard directory holds exactly ONE parquet file whose
  * row order is the `sortWithinPartitions(shard, pos)` order. A reader
  * that scans shard directories in id order and files in row order
  * reproduces the global shuffled order without any sort.
  *
  * 100 TB: size `nShards` so one shard ≈ one target file (e.g. 10k shards
  * of ~10 GB) and set `spark.sql.shuffle.partitions` ≥ nShards so the
  * exchange balances one shard per task; the per-task sort is
  * file-sized, spilling at worst. The write is the same single exchange
  * the shard assignment already paid for — no extra corpus pass.
  */
object ShardSink {

  /** Write `assigned` (must carry `shard` and `pos` columns) to `out`;
    * returns the shard manifest (not written — callers decide where the
    * loader index lives). */
  def writeShards(assigned: DataFrame, out: String,
                  tokensCol: Option[Column] = None): DataFrame = {
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    Sharding.shardManifest(assigned, tokensCol)
  }
}
