package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Generative invariance checks for the kernels whose correctness
  * argument is "deterministic under ANY partitioning / input order" —
  * claims a fixed fixture can only sample. Cases are drawn from a
  * seeded RNG (reproducible failures); each case re-runs the operator
  * under a different physical layout and demands identical output. */
class InvariantsPropSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(20260814L)

  test("KMV sketch: bottom-k of the distinct set, any partitioning") {
    for (_ <- 1 to 10) {
      val vals = Seq.fill(1 + rng.nextInt(400))(rng.nextLong(5000L))
      val k = 2 + rng.nextInt(31)
      val parts = 1 + rng.nextInt(16)
      val df = vals.map(("g", _)).toDF("grp", "h").repartition(parts)
      val r = Sketches.kmvDistinct(df, "grp", col("h"), k).head()
      val distinct = vals.distinct.sorted
      if (distinct.size < k) {
        assert(r.isNullAt(1) && r.getInt(2) == distinct.size &&
          r.getLong(3) == distinct.size.toLong,
          s"k=$k parts=$parts n=${distinct.size}")
      } else {
        val kth = distinct(k - 1)
        assert(r.getLong(1) == kth && r.getInt(2) == k &&
          r.getLong(3) ==
            (k - 1).toLong * 1000000007L / math.max(kth, 1L),
          s"k=$k parts=$parts kth=$kth")
      }
    }
  }

  test("temperatureMix: allocations always sum exactly to total, " +
      "independent of input order") {
    for (_ <- 1 to 10) {
      val counts = Seq.fill(1 + rng.nextInt(8))(1 + rng.nextInt(500))
      val total = rng.nextLong(5000L)
      val rows = counts.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(s"s$i") }
      val got = Sampling.temperatureMix(rows.toDF("s"), col("s"), total)
        .collect().map(r => r.getString(0) -> r.getLong(3))
      assert(got.map(_._2).sum == total, got.mkString(","))
      assert(got.forall(_._2 >= 0))
      val again = Sampling.temperatureMix(
          rng.shuffle(rows).toDF("s"), col("s"), total)
        .collect().map(r => r.getString(0) -> r.getLong(3))
      assert(got.toMap == again.toMap)
    }
  }

  test("BPE merge fold: runs of one symbol halve, never chain") {
    for (n <- 1 to 12) {
      val word = "a" * n
      val merges = Seq(Bpe.Merge(1, "a", "a", 0L))
      val got = Bpe.encode(Seq((1L, word)).toDF("doc_id", "text"),
        "doc_id", "text", merges).head()
      // left-to-right non-overlapping: ceil(n/2) symbols survive
      assert(got.getLong(2) == (n + 1) / 2, s"n=$n got ${got.getLong(2)}")
    }
  }

  test("prefixDedup: group sizes partition the corpus exactly") {
    val pool = Seq("a b c d e", "a b c d e f g", "x y z", "x y z w")
    for (_ <- 1 to 10) {
      val texts = Seq.fill(1 + rng.nextInt(30))(pool(rng.nextInt(4)))
      val p = 1 + rng.nextInt(6)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.prefixDedup(docs, "doc_id", "text", p)
      assert(out.count() == texts.size)
      val bySize = out.select("prefix_hash", "group_n").distinct()
        .collect().map(_.getLong(1)).sum
      assert(bySize == texts.size, s"p=$p")
      assert(out.filter(col("is_kept")).count() ==
        out.select("prefix_hash").distinct().count())
    }
  }
}
