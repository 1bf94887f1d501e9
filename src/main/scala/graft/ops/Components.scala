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

  /** One distributed-fixpoint round's observability record. Shuffle bytes
    * come from a stage-completion listener; the listener bus is async, so
    * a stage can occasionally be attributed to the neighboring round —
    * totals are exact, per-round splits are ±1 stage. The listener sees
    * EVERY stage on the SparkContext: run the instrumented variant on a
    * session with no concurrent jobs, or the foreign stages' shuffle
    * bytes land in whichever round is open. */
  final case class CcRound(round: Int, changed: Long, secs: Double,
                           shuffleReadMB: Double, shuffleWriteMB: Double)

  /** Fixpoint run stats: `rounds` is the O(diameter) claim made
    * measurable — it must track the planted diameter, not the node
    * count. `perRound` shuffle volumes must stay flat (each round
    * shuffles the label table only, never the edges). */
  final case class CcStats(nodes: Long, edges: Long, rounds: Int,
                           perRound: Seq[CcRound])

  /** [[connectedComponents]] plus fixpoint observability. Stats are None
    * when the size gate routed to the driver union-find (no rounds to
    * report). Adds one count job (nodes) over the uninstrumented path. */
  def connectedComponentsWithStats(edges: DataFrame, srcCol: String,
                                   dstCol: String, maxIter: Int = 25,
                                   localThreshold: Long = 1L << 20)
      : (DataFrame, Option[CcStats]) =
    ccImpl(edges, srcCol, dstCol, maxIter, localThreshold,
      collectStats = true)

  /** Connected components of the undirected graph given by `edges`
    * (`srcCol`, `dstCol`; direction ignored, self-loops and duplicate
    * edges harmless; an edge with a NULL endpoint is dropped entirely —
    * a null identifies no node). Node ids must be integral or string
    * and both endpoint columns must share one type (checked up front,
    * identically on both size-gated paths). Returns one row per
    * distinct node:
    * (`id`, `component`) where `component` is the smallest node id
    * reachable from `id` — a canonical, deterministic cluster label.
    *
    * @param maxIter hard cap on propagation rounds (diameter bound);
    *                throws if the fixpoint is not reached so a silent
    *                under-merge can never ship.
    * @param localThreshold edge count at or below which the component
    *                labels are computed with a driver-side union-find
    *                over the collected edge list — the same size-gated
    *                reasoning as `autoBroadcastJoinThreshold`: a verified
    *                near-dup pair set is a sliver of any corpus, and an
    *                iterative fixpoint of Spark jobs over a few thousand
    *                rows pays rounds × job-latency for work a single
    *                in-memory pass does exactly. Identical output to the
    *                distributed path (asserted in spec); set 0 to force
    *                the distributed fixpoint. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          localThreshold: Long = 1L << 20): DataFrame =
    ccImpl(edges, srcCol, dstCol, maxIter, localThreshold,
      collectStats = false)._1

  private def ccImpl(edges: DataFrame, srcCol: String, dstCol: String,
                     maxIter: Int, localThreshold: Long,
                     collectStats: Boolean)
      : (DataFrame, Option[CcStats]) = {
    // schema validation up front, IDENTICAL for both size-gated paths —
    // without it the same frame would succeed or throw depending only on
    // row count (the local path's ordering needs these types; the
    // distributed path would silently accept e.g. doubles)
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
        ShortType, StringType}
      val allowed: Set[org.apache.spark.sql.types.DataType] =
        Set(ByteType, ShortType, IntegerType, LongType, StringType)
      val Seq(st, dt) =
        edges.select(col(srcCol), col(dstCol)).schema.map(_.dataType)
      require(allowed.contains(st) && st == dt,
        s"connectedComponents needs integral or string node ids with " +
          s"matching endpoint types, got $srcCol: $st, $dstCol: $dt")
    }
    // null-endpoint edges identify nothing — dropped at the scan (a
    // plain filter, no extra pass); without this the local path NPEs in
    // the ordering while the distributed path emits a (null, null) row
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
    // symmetrize once. Partition count adapts to the edge count: the
    // per-round fixed cost is tasks × rounds, so a small pair graph (the
    // common case — verified near-dup pairs are a sliver of any corpus)
    // iterates in single-task rounds, while a huge one keeps full
    // parallelism. Pre-partitioned by the join side and persisted, so
    // each round shuffles only the label table, never the edges.
    // persisted BEFORE the size probe: the count and the branch taken
    // after it both consume this plan, and the upstream edge derivation
    // (e.g. a whole LSH-verify cascade) must run once, not twice. The
    // probe counts RAW edges — no symmetrize/distinct shuffle spent
    // before knowing which path runs; union-find is insensitive to
    // direction, duplicates, and self-loops, so the local path collects
    // the raw list as-is.
    val ep = e.persist(MEMORY_AND_DISK)
    val nEdges = ep.count()
    if (nEdges <= localThreshold) {
      val result = unionFindLocal(ep)
      ep.unpersist()
      return (result, None)
    }
    val sc = e.sparkSession.sparkContext
    val nPart = math.max(1, math.min((nEdges * 2 / 500000L).toInt,
      sc.defaultParallelism * 4))
    val und = ep
      .unionByName(ep.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .repartition(nPart, col("s")).persist(MEMORY_AND_DISK)
    und.count()
    ep.unpersist()
    var labels = und.select(col("s").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    val nNodes = if (collectStats) labels.count() else -1L

    // stage-completion listener accumulates shuffle volume; per-round
    // deltas are snapshotted around each round's count action
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val listener =
      if (!collectStats) None
      else Some(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    listener.foreach(sc.addSparkListener)
    val rounds = scala.collection.mutable.ArrayBuffer.empty[CcRound]

    var converged = false
    var iter = 0
    try {
      while (!converged && iter < maxIter) {
        val (r0, w0) = (shufRead.get(), shufWrite.get())
        val t0 = System.nanoTime()
        // neighbor labels flow along edges; min with the node's own label.
        // One wide union → hash min-agg: a single shuffle per round. The
        // node's own previous label rides along (min over flagged rows), so
        // convergence detection is a filter on the round's output — no
        // extra join.
        val viaEdges = und
          .join(labels.withColumnRenamed("id", "s"), "s")
          .select(col("d").as("id"), col("component"),
            lit(null: String).as("own"))
        val next = labels
          .select(col("id"), col("component"), lit("y").as("own"))
          .unionByName(viaEdges)
          .groupBy("id")
          .agg(min("component").as("component"),
            min(when(col("own").isNotNull, col("component"))).as("prev"))
          .localCheckpoint(true)
        // labels only ever decrease, so "any change" = "any strict decrease"
        val changed = next.filter(col("component") < col("prev")).count()
        labels = next.select(col("id"), col("component"))
        converged = changed == 0
        iter += 1
        if (collectStats)
          rounds += CcRound(iter, changed, (System.nanoTime() - t0) / 1e9,
            (shufRead.get() - r0) / 1e6, (shufWrite.get() - w0) / 1e6)
      }
    } finally listener.foreach(sc.removeSparkListener)
    und.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "graph diameter exceeds the bound; raise maxIter")
    (labels,
      if (collectStats) Some(CcStats(nNodes, nEdges, iter, rounds.toSeq))
      else None)
  }

  /** Exact driver-side union-find (path compression + arbitrary union)
    * for edge sets under `localThreshold`. Same output contract as the
    * distributed fixpoint: (id, component = min member). */
  private def unionFindLocal(und: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val spark = und.sparkSession
    // type + null validation already happened in ccImpl, identically
    // for both paths
    val dt = und.schema.head.dataType
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    und.collect().foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    implicit val ord: Ordering[Any] = dt match {
      case StringType =>
        // unsigned UTF-8 byte order, matching Spark's min()/DuckDB's
        // MIN() on strings — java's natural String order compares UTF-16
        // code units, which disagrees for supplementary characters
        // (surrogate pairs sort before U+E000..U+FFFF there), and the
        // local path must label clusters identically to the distributed
        // one
        new Ordering[Any] {
          def compare(a: Any, b: Any): Int = {
            val (x, y) = (
              a.asInstanceOf[String].getBytes(
                java.nio.charset.StandardCharsets.UTF_8),
              b.asInstanceOf[String].getBytes(
                java.nio.charset.StandardCharsets.UTF_8))
            var i = 0
            while (i < x.length && i < y.length) {
              val c = (x(i) & 0xff) - (y(i) & 0xff)
              if (c != 0) return c
              i += 1
            }
            x.length - y.length
          }
        }
      case _ => Ordering.Long.on[Any](_.asInstanceOf[Number].longValue())
    }
    val out = parent.keys.toSeq.groupBy(find).toSeq.flatMap {
      case (_, members) =>
        val m = members.min
        members.map(v => Row(v, m))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField("id", dt), StructField("component", dt))))
  }
}
