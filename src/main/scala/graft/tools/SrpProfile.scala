package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Candidate-volume profiler for the SRP bucket join (q33/q246 family):
  * prints, per sf dir, the auto plane count, bucket-size distribution,
  * and Σ bucket² (= candidate pairs the bucket join materializes) so the
  * auto-sizing rule's linearity claim is measured, not asserted.
  *
  *   runMain graft.tools.SrpProfile dir1[:planes] [dir2[:planes] ...]
  */
object SrpProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { arg =>
      // split on the LAST ':' and only treat the suffix as a plane
      // override when it parses as an integer — "s3://bucket/dir" and
      // other colon-bearing paths fall through to (arg, None) instead
      // of throwing on "//bucket/dir".toInt
      val (dir, planeOverride) = arg.lastIndexOf(':') match {
        case i if i > 0 =>
          scala.util.Try(arg.substring(i + 1).toInt).toOption match {
            case Some(p) => (arg.substring(0, i), Some(p))
            case None    => (arg, None)
          }
        case _ => (arg, None)
      }
      val vecs = graft.core.Tables.embeddings(spark, dir)
      val n = vecs.count()
      val planes = planeOverride.getOrElse(VectorOps.autoPlaneCount(n))
      // the CENTERED signature — what srpNearDupPairs/mutualNeighbors
      // bucket on (srpSignatureCentered); profiling the raw signature
      // here would measure a bucket structure production never joins on
      val sig = vecs.select(
        VectorOps.srpSignatureCentered(vecs, "embedding", planes).as("sig"),
        col("label"))
      val buckets = sig.groupBy("sig").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_buckets"),
          max(col("sz")).as("max_sz"),
          avg(col("sz")).as("mean_sz"),
          sum(col("sz") * col("sz")).as("sum_sq"))
        .head()
      // cross-label candidates only (what q246 actually verifies)
      val cross = sig.groupBy("sig", "label").agg(count(lit(1)).as("c"))
        .groupBy("sig").agg(sum(col("c")).as("t"),
          sum(col("c") * col("c")).as("ss"))
        .agg(sum(col("t") * col("t") - col("ss")).as("cross_pairs"))
        .head()
      println(s"[srp] dir=$dir n=$n planes=$planes " +
        s"buckets=${buckets.getLong(0)} max=${buckets.getLong(1)} " +
        f"mean=${buckets.getDouble(2)}%.2f sumSq=${buckets.getLong(3)} " +
        s"crossPairs=${cross.getLong(0)}")
    }
    spark.stop()
  }
}
