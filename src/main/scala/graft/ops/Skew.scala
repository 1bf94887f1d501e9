package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4 scale posture): salted joins for hot
  * keys. AQE's skew-join handles sort-merge skew automatically; salting
  * is the explicit tool when a broadcast isn't possible and one key
  * dominates (the classic "null key" / celebrity-user shuffle straggler).
  *
  * Shape: the big side gets a deterministic salt in [0, factor) derived
  * by hashing a high-cardinality discriminator column (NOT rand() — reruns
  * must reproduce); the small side is exploded factor×. The join key
  * becomes (key, salt), spreading each hot key over `factor` reducers.
  *
  * Use ONLY under measured skew. The explode replicates the small side
  * factor×, so on a uniform key distribution a salted join costs ~factor×
  * the plain join (q63's identity bench shows exactly that, ~4× at
  * factor 4) for zero benefit. First preference is AQE's runtime skew
  * split — `spark.sql.adaptive.skewJoin.enabled` (on in
  * [[graft.core.Sessions]]) with its `skewedPartitionFactor` /
  * `skewedPartitionThresholdInBytes` knobs — which pays nothing when no
  * partition is skewed; reach for salting when the skew is in a
  * broadcast-impossible shuffled hash/sort-merge join and AQE's split is
  * defeated (e.g. a single key larger than one executor's memory, or
  * aggregation upstream of the join pinning the partitioning).
  */
object Skew {

  /** Join types where salting is row-identical to the plain join: the
    * small side's factor× replicas are indistinguishable to inner/semi
    * matching and to BIG-side outer padding. right/full outer would
    * null-pad every unmatched small-side REPLICA (factor copies of one
    * row) — not identical — so those types are rejected. */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
      "cross")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 discriminator: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor" +
      " (0 makes pmod NULL on the big side: silently empty join)")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")) ||
        SafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin is row-identical to the plain join only for " +
        s"inner/left/semi/anti types; '$joinType' would null-pad " +
        "unmatched small-side replicas factor times")
    val salted = big.withColumn("__salt",
      pmod(hash(discriminator), lit(factor)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
