package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed top-k aggregation (SURVEY.md §2.9 — the one place a custom
  * Aggregator genuinely beats built-ins at scale).
  *
  * The window formulation of per-group top-k (row_number over
  * (group ORDER BY score)) shuffles and sorts EVERY scored row; this
  * Aggregator keeps a bounded k-list per group per partition, so the
  * shuffle carries ≤ k rows per (group, partition) — at 100 TB corpus ×
  * thousands of queries, that is the difference between shuffling the
  * full score matrix and shuffling k·|groups| rows. Deterministic: order
  * by (score desc, item asc), identical output to the window form
  * (asserted in spec and by the q31 oracle).
  */
object TopK {

  case class ScoredRow(group: Long, item: Long, score: Double)

  /** Best-first ordering: score desc, item asc. Explicit compare rather
    * than Ordering.by on (-s, i): negating the score sends NaN (which
    * java sorts GREATER than everything) to the END of the buffer, while
    * Spark's window ORDER BY score DESC puts NaN rows FIRST — the
    * aggregator must agree with the window form on dirty scores (a
    * cosine of a zero vector is 0/0 = NaN) or the documented equivalence
    * breaks exactly there. Comparing the raw scores reversed keeps NaN
    * greatest on both paths. */
  private def ord: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val c = java.lang.Double.compare(y._1, x._1) // desc, NaN first
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }
    }

  def aggregator(k: Int): Aggregator[ScoredRow, Seq[(Double, Long)],
                                     Seq[(Double, Long)]] =
    new Aggregator[ScoredRow, Seq[(Double, Long)], Seq[(Double, Long)]] {
      def zero: Seq[(Double, Long)] = Nil
      def reduce(b: Seq[(Double, Long)], a: ScoredRow): Seq[(Double, Long)] = {
        val cand = (a.score, a.item)
        // fast path: full buffer and the candidate is not better than the
        // current worst — the overwhelmingly common case on the hot path;
        // the per-row full re-sort would cost O(k log k) per input row
        if (b.size >= k && ord.compare(cand, b.last) >= 0) b
        else (cand +: b).sorted(ord).take(k)
      }
      def merge(x: Seq[(Double, Long)],
                y: Seq[(Double, Long)]): Seq[(Double, Long)] =
        (x ++ y).sorted(ord).take(k)
      def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
      def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
    }

  /** Per-group top-k of `scoreCol` with deterministic (score desc, item
    * asc) order; output columns (groupCol, itemCol, rank, scoreCol).
    *
    * Group and item ids must be integral (they key the bounded-buffer
    * aggregator as longs); a string doc-id would silently cast to NULL
    * and collapse all rows into one group, so non-integral id columns
    * are rejected up front. Re-key string ids through [[DenseId]] first. */
  def topKPerGroup(df: DataFrame, groupCol: String, itemCol: String,
                   scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq(groupCol, itemCol).foreach { c =>
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"topKPerGroup id column '$c' must be integral, got " +
          s"${df.schema(c).dataType.simpleString} — assign dense integer " +
          "ids (ops.DenseId) for string keys")
    }
    val ds = df.select(col(groupCol).cast("long").as("group"),
        col(itemCol).cast("long").as("item"),
        col(scoreCol).cast("double").as("score"))
      .as[ScoredRow]
    ds.groupByKey(_.group)
      .agg(aggregator(k).toColumn.name("topk"))
      .flatMap { case (g, items) =>
        items.zipWithIndex.map { case ((s, i), idx) => (g, i, idx + 1, s) }
      }
      .toDF(groupCol, itemCol, "rank", scoreCol)
  }
}
