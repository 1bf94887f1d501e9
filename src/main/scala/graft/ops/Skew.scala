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
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 discriminator: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(discriminator), lit(factor)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
