package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * right.ts ≤ left.ts within the same key. Spark has no native ASOF
  * operator; the idiomatic composition (builder-prompt preference (a)) is
  * a tagged union + one windowed last-value carry-forward:
  *
  *   union(left tagged 0, right tagged 1)
  *     sorted per key by (ts, tag desc, right-tiebreak)
  *     last(right-col, ignoreNulls) over rows ≤ current
  *     keep left rows
  *
  * ONE shuffle+sort on the key — same cost as a regular sort-merge join,
  * no per-row probing, no range explosion; at equal timestamps the right
  * row sorts first, so right.ts == left.ts matches (standard ASOF ≥
  * semantics, same as DuckDB's ASOF JOIN used by the oracle). */
object AsOf {

  /** @param rightValueCols right columns carried to the output (each
    *   becomes `asof_<name>`); right rows also carry their `tsCol` as
    *   `asof_ts`. Left rows with no prior right row get nulls. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightValueCols: Seq[String]): DataFrame = {
    val carried = s"asof_$tsCol" +: rightValueCols.map("asof_" + _)
    val leftTagged = left
      .withColumn("__tag", lit(0))
      .withColumn(s"asof_$tsCol", lit(null).cast(left.schema(tsCol).dataType))
    val leftAligned = rightValueCols.foldLeft(leftTagged) { (df, c) =>
      df.withColumn(s"asof_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rightTagged = right.select(
      col(keyCol) +: col(tsCol).as(tsCol) +: lit(1).as("__tag") +:
        col(tsCol).as(s"asof_$tsCol") +:
        rightValueCols.map(c => col(c).as(s"asof_$c")): _*)
    val rightAligned = leftAligned.columns.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(
        leftAligned.schema(c).dataType))
    }.select(leftAligned.columns.map(col): _*)

    // right rows (__tag=1) sort before left (__tag=0) at equal ts so
    // ties match (ASOF >= semantics); the carried value columns break
    // ties among right rows sharing (key, ts) so last() is deterministic
    // across runs and partitionings (left rows hold NULLs there —
    // asc_nulls_first keeps them after all right rows at the same ts
    // only via __tag, which already dominates)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc +: col("__tag").desc +:
        carried.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = carried.foldLeft(leftAligned.unionByName(rightAligned)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 0).drop("__tag")
  }
}
