package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage scoring (Fellegi–Sunter): turn per-field
  * agreement indicators on CANDIDATE pairs into log-likelihood match
  * weights and a three-way decision. The candidate pairs come from a
  * blocking tier ([[NearDup.sortedNeighborhood]], LSH bands, fuzzy keys)
  * — this operator is the scoring layer on top, so its cost is
  * O(candidate pairs), never O(n²).
  *
  * Weights: agreement on field i contributes log2(m_i/u_i), disagreement
  * log2((1−m_i)/(1−u_i)), where m = P(agree | match), u = P(agree |
  * non-match). Both log values are evaluated ONCE in Scala per field and
  * embedded as double literals (6-dp rounded) — the engines only ever
  * add a fixed, per-row sequence of literals, so scores are exact and
  * partition-order-free, and a SQL oracle interpolating the same
  * literals matches bit-for-bit. */
object Linkage {

  /** One scored field: a boolean agreement expression over the pair row
    * plus its m/u probabilities. */
  final case class Field(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"field $name needs 0 < u < m < 1, got m=$m u=$u")
    /** log2(m/u), 6-dp — the literal both engines see. */
    def wAgree: Double =
      BigDecimal(math.log(m / u) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    /** log2((1−m)/(1−u)), 6-dp (negative). */
    def wDisagree: Double =
      BigDecimal(math.log((1 - m) / (1 - u)) / math.log(2.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Score candidate `pairs`: adds one `w_<name>` column per field, the
    * `match_weight` total, and a `decision` column ('match' at ≥ upper,
    * 'non_match' at ≤ lower, 'possible' between). Null agreements score
    * as disagreement (a missing field can't support a match claim). */
  def fellegiSunter(pairs: DataFrame, fields: Seq[Field],
                    upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    require(upper >= lower, s"upper $upper must be >= lower $lower")
    val withW = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"w_${f.name}",
        when(coalesce(f.agree, lit(false)), lit(f.wAgree))
          .otherwise(lit(f.wDisagree)))
    }
    // fixed left-to-right literal addition — identical order in the
    // oracle SQL, so the double sum is reproducible exactly
    val total = fields.map(f => col(s"w_${f.name}"))
      .reduceLeft(_ + _)
    withW
      .withColumn("match_weight", round(total, 6))
      .withColumn("decision",
        when(col("match_weight") >= upper, "match")
          .when(col("match_weight") <= lower, "non_match")
          .otherwise(lit("possible")))
  }
}
