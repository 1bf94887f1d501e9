package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Distributed connected components over an edge list — the missing last
  * step of a near-duplicate pipeline. MinHash-LSH + verify emits PAIRS;
  * correct corpus dedup needs transitive CLUSTERS (keep one doc per
  * component, not "drop the larger id of each pair": for pairs (1,3),(2,3)
  * the greedy policy keeps doc 2, though it sits in cluster {1,2,3}).
  *
  * Algorithm: iterative min-label propagation. `labels(id) := min(labels(id),
  * min over neighbors of labels(nbr))` per round until a fixpoint — each
  * round is ONE shuffle (union + hash re-aggregation on id), map-side
  * combinable, and converges in O(graph diameter) rounds. Near-dup graphs
  * at corpus scale are forests of near-cliques (LSH buckets make duplicate
  * clusters mutually adjacent), so the diameter is tiny and label
  * propagation beats the O(log n)-round star-contraction algorithms on
  * constant factors; for adversarial long-path graphs raise `maxIter`.
  * Every round materializes through `localCheckpoint` — the plan of round
  * k references round k−1 TWICE (own label ∪ neighbor labels), so without
  * lineage truncation the logical plan doubles per round and explain/
  * codegen alone OOMs after ~10 rounds. Local (executor-resident)
  * checkpointing is right here: rounds are short-lived, and on executor
  * loss recomputing the round from the previous checkpoint is cheap. On a
  * long-running cluster job, set a reliable `spark.checkpoint.dir` and
  * swap `localCheckpoint` for `checkpoint` if executor churn is expected.
  * Superseded round RDDs are released by Spark's ContextCleaner once
  * unreferenced.
  *
  * The reference has no graph surface (SURVEY.md §2 — flat relational
  * only); this operator belongs to the training-data mandate, where
  * cluster-exact dedup is what a 100 TB corpus actually requires.
  */
object Components {

  /** Connected components of the undirected graph given by `edges`
    * (`srcCol`, `dstCol`; direction ignored, self-loops and duplicate
    * edges harmless). Returns one row per distinct node:
    * (`id`, `component`) where `component` is the smallest node id
    * reachable from `id` — a canonical, deterministic cluster label.
    *
    * @param maxIter hard cap on propagation rounds (diameter bound);
    *                throws if the fixpoint is not reached so a silent
    *                under-merge can never ship. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
    // symmetrize once; persisted — every round joins against it
    val und = e.unionByName(e.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    var labels = und.select(col("s").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; min with the node's own label.
      // One wide union → hash min-agg: a single shuffle per round.
      val viaEdges = und
        .join(labels.withColumnRenamed("id", "s"), "s")
        .select(col("d").as("id"), col("component"))
      val next = labels.unionByName(viaEdges)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      // labels only ever decrease, so "any change" = "any strict decrease"
      val changed = next.join(
          labels.withColumnRenamed("component", "prev"), "id")
        .filter(col("component") < col("prev")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    und.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "graph diameter exceeds the bound; raise maxIter")
    labels
  }
}
