package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for JOIN views — the delta-join algebra
  * that keeps a materialized A ⋈ B current without recomputing it:
  *
  *   (A ∪ ΔA) ⋈ (B ∪ ΔB) = (A ⋈ B) ∪ (ΔA ⋈ B) ∪ ((A ∪ ΔA) ⋈ ΔB)
  *
  * The right-hand tail is what [[joinDelta]] computes. The factoring is
  * the standard asymmetric one (ΔA joins OLD B; ΔB joins NEW A) so the
  * ΔA ⋈ ΔB cross-delta rows appear exactly once — under bag semantics,
  * no dedup step and no multiplicity bookkeeping are needed for
  * insert-only deltas.
  *
  * Scale posture: both delta joins are |Δ|-driven — the delta side is a
  * day's increment, orders of magnitude smaller than the standing table,
  * so it BROADCASTS (or at worst shuffles |Δ| rows against a bucketed
  * base). The standing tables are scanned but never shuffled when the
  * base is bucketed/partitioned on the join key. Aggregate maintenance
  * on top of the join composes with
  * [[graft.streaming.EventStreams.mergeRollups]]: aggregate the delta
  * rows, merge partials. Deletes/updates need retraction multiplicities
  * (signed counts) — out of scope; the engine's idempotence story for
  * mutable domains is overwrite-partition ([[graft.etl.EtlRunner]]),
  * matching the reference's truncate-reload semantics.
  */
object Ivm {

  /** New join rows contributed by insert-only deltas `deltaA`/`deltaB`
    * to the view `a ⋈ b` on equi-join `keys`. Bag-exact:
    * result ≡ (a∪ΔA)⋈(b∪ΔB) EXCEPT ALL a⋈b, with each row's
    * multiplicity preserved. */
  def joinDelta(a: DataFrame, deltaA: DataFrame,
                b: DataFrame, deltaB: DataFrame,
                keys: Seq[String]): DataFrame = {
    val newA = a.unionByName(deltaA.select(a.columns.map(col).toSeq: _*))
    // unionByName aligns the two branches' columns by name, so the
    // differing join-output column orders need no manual re-select
    deltaA.join(b, keys).unionByName(newA.join(deltaB, keys))
  }

  /** Per-key COUNT/SUM aggregate state of a weighted row stream:
    * (keys, cnt = Σw, total = Σ w·value as DECIMAL(28,4)). With all
    * weights +1 this is the standing materialized rollup; a DELTA batch
    * uses signed weights — +1 inserts, −1 retractions — which is the
    * standard multiset-homomorphism trick that makes count/sum (and
    * anything derived from them: mean, rate, share) maintainable under
    * BOTH inserts and deletes without touching the standing table. The
    * aggregation is map-side combinable; the decimal sum is exact, so
    * maintenance is bit-identical to recompute, not approximately so. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String,
               weightCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      sum(weightCol.cast("long")).as("cnt"),
      sum((weightCol * col(valueCol).cast(DecimalType(18, 4)))
        .cast(DecimalType(28, 4))).as("total"))

  /** Merge a delta [[aggState]] into a standing one: full-outer on the
    * keys, componentwise add, DROP keys whose maintained count reaches
    * zero (a fully-retracted group must disappear, exactly as a
    * recompute would never emit it). Contract (spec-pinned and
    * oracle-gated by q241): merge(aggState(A), aggState(Δ)) ≡
    * aggState(A ⊎ Δ) row-for-row.
    *
    * Scale posture: the standing state is key-domain-sized (not
    * corpus-sized) and the delta side is a day's increment — the join
    * broadcasts the delta state in practice; the standing table is
    * never re-scanned. This is the batch twin of
    * [[graft.streaming.EventStreams.mergeRollups]]. */
  def mergeAggState(state: DataFrame, delta: DataFrame,
                    keys: Seq[String]): DataFrame = {
    val d = delta.select(keys.map(col) ++ Seq(
      col("cnt").as("__dc"), col("total").as("__dt")): _*)
    state.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as("cnt"),
        (coalesce(col("total"), lit(BigDecimal(0)).cast(DecimalType(28, 4)))
          + coalesce(col("__dt"), lit(BigDecimal(0)).cast(DecimalType(28, 4))))
          .cast(DecimalType(28, 4)).as("total")): _*)
      .filter(col("cnt") =!= 0L)
  }
}
