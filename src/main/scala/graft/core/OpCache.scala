package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Registry for operator-INTERNAL scratch persists.
  *
  * Several operators (the NearDup family) persist a multi-referenced
  * intermediate (shingle sets, token arrays, band frames) that the
  * returned lazy DataFrame still reads — unpersisting before returning
  * would force the caller's first action to recompute the whole lineage.
  * So the frames must outlive the call... and without bookkeeping they
  * outlive it FOREVER: CacheManager entries are never GC-collected, and
  * a long-lived library session accumulates one dead entry per past
  * invocation (Verify/Bench sidestep this with clearCache between
  * queries; embedding callers should not have to know to).
  *
  * The contract here: an operator persists its scratch frames, then
  * calls [[renew]] with a call-site key. renew drops (async-unpersists)
  * whatever the PREVIOUS invocation of that same call site registered —
  * by then its consumers have either run (frame dead) or will lazily
  * recompute (correct, slower). Repeated library calls therefore hold a
  * bounded cache: at most one generation of scratch per operator.
  *
  * Caveat (documented, accepted): composing two invocations of the same
  * operator into ONE lazily-evaluated plan recomputes the first
  * invocation's scratch when the composed plan finally runs — correct,
  * just unpersisted. Materialize between calls if that matters.
  */
object OpCache {
  private val reg = new ConcurrentHashMap[String, Seq[DataFrame]]()

  /** Register `dfs` (already persisted by the caller) as the scratch
    * caches of call site `owner`, dropping the previous generation —
    * EXCEPT frames computing the same result as a new frame. The
    * CacheManager dedups persists by canonicalized plan, so a repeat
    * invocation on identical input REUSES the previous materialization
    * (that is the second-rep fast path, and such entries never
    * accumulate — dedup collapses them to one); unpersisting the old
    * frame would evict the very entry the new frame is riding (measured:
    * the whole candidatePairs consumer family at ~2× when renew dropped
    * the shared entry between bench reps). Only DIFFERENT-plan
    * generations are the leak this registry exists to bound. */
  def renew(owner: String, dfs: DataFrame*): Unit = {
    val prev = reg.put(owner, dfs)
    if (prev != null) prev.foreach { old =>
      try {
        val shared = dfs.exists(df =>
          old.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
        if (!shared) old.unpersist(blocking = false)
        // a stopped session is not an error; fatal errors (OOM,
        // interrupt) must still propagate
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Drop every registered scratch cache (between unrelated jobs, or at
    * library shutdown). Safe anytime: lineage is intact, the worst case
    * for a still-live frame is recompute. */
  def releaseAll(): Unit = {
    import scala.jdk.CollectionConverters._
    reg.keySet.asScala.toSeq.foreach { k =>
      val prev = reg.remove(k)
      if (prev != null) prev.foreach(df =>
        try df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () })
    }
  }

  /** Registered generation count — spec surface. */
  def size: Int = reg.size
}
