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
  *     last(right-struct, ignoreNulls) over rows ≤ current
  *     keep left rows
  *
  * ONE shuffle+sort on the key — same cost as a regular sort-merge join,
  * no per-row probing, no range explosion; at equal timestamps the right
  * row sorts first, so right.ts == left.ts matches (standard ASOF ≥
  * semantics, same as DuckDB's ASOF JOIN used by the oracle).
  *
  * The carried columns travel as ONE STRUCT filled by a single last():
  * the output is always a coherent snapshot of exactly one right row.
  * (Filling each column independently with its own ignoreNulls last()
  * would stitch the result together from DIFFERENT right rows whenever a
  * right value column contains nulls — e.g. r1(ts=1, a=5, b=null),
  * r2(ts=2, a=null, b=7) must yield r2's (2, null, 7), not the chimera
  * (2, 5, 7).) */
object AsOf {

  /** @param rightValueCols right columns carried to the output (each
    *   becomes `asof_<name>`); right rows also carry their `tsCol` as
    *   `asof_ts`. Left rows with no prior right row get nulls. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightValueCols: Seq[String]): DataFrame = {
    val carried = s"asof_$tsCol" +: rightValueCols.map("asof_" + _)
    val rightTagged = right.select(
      col(keyCol), col(tsCol), lit(1).as("__tag"),
      struct(col(tsCol).as(s"asof_$tsCol") +:
        rightValueCols.map(c => col(c).as(s"asof_$c")): _*).as("__asof"))
    val leftTagged = left
      .withColumn("__tag", lit(0))
      .withColumn("__asof",
        lit(null).cast(rightTagged.schema("__asof").dataType))
    // allowMissingColumns: left's payload columns null-fill on the right
    // side of the union (they are never read from right rows)
    val unioned = leftTagged.unionByName(rightTagged,
      allowMissingColumns = true)

    // right rows (__tag=1) sort before left (__tag=0) at equal ts so
    // ties match (ASOF >= semantics); the carried struct breaks ties
    // among right rows sharing (key, ts) — struct ordering is
    // lexicographic over its fields, so last() is deterministic across
    // runs and partitionings (left rows hold NULL there; __tag already
    // dominates them)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").desc,
        col("__asof").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__asof",
      last(col("__asof"), ignoreNulls = true).over(w))
    filled.filter(col("__tag") === 0)
      .select(left.columns.map(col) ++
        carried.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
