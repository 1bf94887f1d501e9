package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) pairs — the
  * "users who did X also did Y" readout (co-visitation recommendations,
  * feature co-occurrence screens). Computes, per ORDERED item pair
  * (antecedent → consequent): joint basket count, support, confidence,
  * and lift.
  *
  * Scale shape: baskets dedupe to DISTINCT (basket, item) first; the
  * pair stream comes from a per-basket self-join whose output is
  * bounded by (items-per-basket)² per basket — with any realistic item
  * fan-out this is the standard A-priori candidate shape, and the
  * aggregate lands on the ITEM-PAIR DOMAIN (≪ baskets). Item marginals
  * and the basket total are broadcast back. All ratios are exact
  * integer divisions pushed to one final double division each. */
object Assoc {

  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
                  minJoint: Long = 1L): DataFrame = {
    require(minJoint >= 1, s"minJoint must be >= 1, got $minJoint")
    val b = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = b.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val marg = b.groupBy(col("__i")).agg(count(lit(1)).as("__m"))
    val joint = b.select(col("__b"), col("__i").as("antecedent"))
      .join(b.select(col("__b"), col("__i").as("consequent")), "__b")
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_joint"))
      .filter(col("n_joint") >= minJoint)
    joint
      .join(broadcast(marg.select(col("__i").as("antecedent"),
        col("__m").as("__ma"))), "antecedent")
      .join(broadcast(marg.select(col("__i").as("consequent"),
        col("__m").as("__mc"))), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_joint"),
        round(col("n_joint").cast("double") / col("__n"), 6)
          .as("support"),
        round(col("n_joint").cast("double") / col("__ma"), 6)
          .as("confidence"),
        round(col("n_joint").cast("double") * col("__n") /
          (col("__ma") * col("__mc")), 6).as("lift"))
  }

  /** Ordered co-occurrence (sequential-pattern reach) per item pair:
    * among baskets/users containing both A and B, how many saw A START
    * before B ENDED (first-A < last-B) — the temporal refinement of
    * [[basketRules]] ("did X actually lead Y"), and the 2-item core of
    * sequential-pattern mining. One hash aggregate to the (key, item)
    * domain (min/max event time — map-side combinable), then a per-key
    * self-join bounded by (items-per-key)², landing on the item-pair
    * domain. Timestamp comparisons are exact (microsecond integers
    * under the hood) — no float anywhere. A and B are DISTINCT items
    * (self-pairs are filtered before the aggregate — a self-pair row
    * would just count multi-event keys, which is not a pair fact). */
  def orderedPairReach(df: DataFrame, keyCol: String, itemCol: String,
                       tsCol: String): DataFrame = {
    val spans = df.groupBy(col(keyCol).as("__k"), col(itemCol).as("__i"))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = spans.select(col("__k"), col("__i").as("item_a"),
      col("__first").as("__fa"))
    val b = spans.select(col("__k"), col("__i").as("item_b"),
      col("__last").as("__lb"))
    val out = a.join(b, Seq("__k"))
      .filter(col("item_a") =!= col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"),
        count(when(col("__fa") < col("__lb"), 1)).as("n_ordered"))
    out
  }
}
