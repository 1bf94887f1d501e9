package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling + shard assignment — the last step of
  * training-data assembly: the curated corpus must reach the trainer in a
  * pseudorandom order that is (a) decorrelated from ingest order (a
  * source-sorted corpus trains on one domain for hours), (b) reproducible
  * bit-for-bit across reruns/retries/partitionings, and (c) addressable
  * ("shard 1737 of 8192, position 52") so a crashed training job can
  * resume mid-epoch.
  *
  * `orderBy(rand())` fails (b): Spark's rand() is per-partition-seeded, so
  * the order changes with partitioning and task retries. The shuffle key
  * here is the [[Sampling.sampleHash]] family instead — a pure function of
  * (row key, seed), uniform after the multiplicative remix, with an exact
  * DuckDB twin so the full assignment is oracle-checkable.
  */
object Sharding {

  /** Assign every row a shard (`pmod(key hash, nShards)`) and a position
    * within the shard (rank by the same hash). One exchange on the shard
    * id + a shard-local sort — exactly the repartition+sortWithinPartitions
    * a shard writer performs anyway; the Window's state is one row (rank
    * counter), never the shard.
    *
    * 100 TB: pick nShards so one shard ≈ one output file (10k shards of
    * ~10 GB), far above core count, so the hash exchange balances and each
    * sort is partition-group-sized, spilling at worst. Hash ties (the
    * ~1e-9 birthday band at 1e9 rows/shard) break by key, so positions
    * stay deterministic.
    *
    * Output: input columns + `shard` (int) + `pos` (long, 0-based dense
    * within shard, hash order). */
  def shuffleShard(df: DataFrame, keyCol: Column, nShards: Int,
                   seed: Long): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val rk = (TextOps.polyHash(
      concat(keyCol.cast("string"), lit("#" + seed)))
      * Sampling.Mixer) % TextOps.HashMod
    df.withColumn("__rk", rk)
      .withColumn("shard", pmod(col("__rk"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos",
        (row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__rk"), keyCol)) - 1).cast("long"))
      .drop("__rk")
  }

  /** Per-shard manifest over a [[shuffleShard]] assignment: row count and
    * (optionally) token mass per shard, for the trainer's data-loader
    * index. Tiny by construction — nShards rows. */
  def shardManifest(assigned: DataFrame, tokensCol: Option[Column])
      : DataFrame = {
    val aggs = count(lit(1)).as("n_rows") ::
      tokensCol.map(c => sum(c).cast("long").as("n_tokens")).toList
    assigned.groupBy(col("shard")).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental shard append for a daily corpus drop: assign `incoming`
    * rows to shards with the SAME pure hash as [[shuffleShard]] (same
    * nShards + seed ⇒ a key lands on the same shard it would in a full
    * rebuild — spec-asserted), and continue each shard's position
    * sequence from the standing `manifest` (shard, n_rows). The standing
    * corpus is never rescanned: cost is one exchange of the increment
    * plus a broadcast of the nShards-row manifest.
    *
    * Position semantics differ from a rebuild by design: a rebuild ranks
    * ALL rows by hash; append gives earlier drops earlier positions
    * (arrival order between drops, hash order within a drop) — exactly
    * what a training job that already consumed those positions requires.
    * Shards absent from the manifest start at 0. */
  def shardAppend(manifest: DataFrame, incoming: DataFrame, keyCol: Column,
                  nShards: Int, seed: Long): DataFrame = {
    val assigned = shuffleShard(incoming, keyCol, nShards, seed)
    val offsets = manifest.select(col("shard"),
      col("n_rows").cast("long").as("__off"))
    assigned
      .join(broadcast(offsets), Seq("shard"), "left")
      .withColumn("pos", col("pos") + coalesce(col("__off"), lit(0L)))
      .drop("__off")
  }

  /** RESIZE-STABLE bucket assignment via the native `jump_hash`
    * expression ([[graft.functions.JumpHash]]): growing n → n+1 moves
    * exactly ~1/(n+1) of keys, all into the new bucket.
    *
    * Complements [[shuffleShard]], which deliberately uses `pmod` —
    * right when shards are write-once files rebuilt as a set (training
    * shards), because mod is cheaper and a rebuild reshards everything
    * anyway. Use THIS for standing ownership that outlives resizes:
    * cache/index partitions (IVF list homes), per-bucket streaming
    * state, compaction targets — anywhere "add one shard" must not
    * rewrite the other n. Key must already be well-spread OR unique
    * (the internal LCG remixes every iteration, so sequential ids are
    * fine). */
  def consistentShard(keyCol: Column, nShards: Int): Column = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    call_function("jump_hash", keyCol.cast("long"), lit(nShards))
  }
}
