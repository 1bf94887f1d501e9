package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
