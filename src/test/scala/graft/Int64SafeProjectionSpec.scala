package graft

import org.apache.spark.sql.types.DecimalType

/** Repo-wide invariant: every verifiable projection stays int64-exact.
  *
  * The driver's correctness checker canonicalizes result values through
  * int64/float64 pathways, so a column whose values can exceed int64 —
  * e.g. a DECIMAL(38,0) sum of ≈2^61 hashes — hash-mismatches even when
  * both engines compute it exactly (the round-12 q123 failure). The fix
  * pattern is to split such checksums into hi/lo halves (sum(h>>31) +
  * sum(h & (2^31−1))), each bounded by 2^31·n. This spec pins the
  * invariant two ways:
  *
  *  1. no registered query's OUTPUT schema carries a DecimalType wider
  *     than precision 18 (10^18 < 2^63 — raw int64-safe); wide decimals
  *     inside a plan are fine, only the projected result matters;
  *  2. no oracle SQL casts to DECIMAL(38,0) anywhere. Interior exact
  *     carriers with a fractional scale (DECIMAL(28,10) gradient sums,
  *     DECIMAL(38,8) squared-value sums) are fine — they are cast back
  *     to DOUBLE before the projection, and any wide decimal that DID
  *     reach an oracle projection would already trip the driver's
  *     schema compare against the Spark side guarded by (1). Scale-0
  *     width 38 is exactly the exceed-int64 integer-checksum pattern
  *     this spec exists to ban.
  */
class Int64SafeProjectionSpec extends SparkSpecBase {

  test("no query output column is a DecimalType wider than precision 18") {
    // plan construction only — never executed, so the full board is cheap
    val wide = SparkEntry.queries.toSeq.flatMap { case (name, q) =>
      q(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] &&
            f.dataType.asInstanceOf[DecimalType].precision > 18 =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(wide.isEmpty,
      s"projections that can exceed int64 (split into hi/lo sums): $wide")
  }

  test("no oracle SQL casts to DECIMAL(38,0)") {
    val pat = raw"(?i)DECIMAL\s*\(\s*38\s*,\s*0\s*\)".r
    val hits =
      (SparkEntry.oracleSql ++ SparkEntry.oracleSqlScaleOverrides)
        .toSeq.collect {
      case (name, sql) if pat.findFirstIn(sql).isDefined => name
    }
    assert(hits.isEmpty, s"oracle casts at max decimal width: $hits")
  }
}
