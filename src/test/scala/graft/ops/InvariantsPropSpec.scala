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

  test("rankAuc: label complement flips the AUC to 1 - auc exactly") {
    for (_ <- 1 to 8) {
      val rows = Seq.fill(20 + rng.nextInt(200))(
        ("g", rng.nextInt(15).toDouble, rng.nextInt(2)))
      // ensure both classes present
      val df = (rows :+ (("g", 1.0, 0)) :+ (("g", 2.0, 1)))
        .toDF("grp", "score", "y")
      val auc = Eval.rankAuc(df, "grp", "score", "y")
        .head().getAs[Double]("auc")
      val flipped = Eval.rankAuc(
        df.withColumn("y", lit(1) - col("y")), "grp", "score", "y")
        .head().getAs[Double]("auc")
      // 2U_flipped = 2PN − 2U exactly, so the rounded values complement
      assert(math.abs(auc + flipped - 1.0) < 2e-6, s"$auc $flipped")
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  test("cohenKappa is symmetric in its two annotators") {
    for (_ <- 1 to 8) {
      val labs = Seq("x", "y", "z")
      val rows = Seq.fill(30 + rng.nextInt(100))(
        (labs(rng.nextInt(3)), labs(rng.nextInt(3))))
      val df = rows.toDF("a", "b")
      val k1 = Eval.cohenKappa(df, "a", "b").head().getAs[Double]("kappa")
      val k2 = Eval.cohenKappa(
        df.select(col("b").as("a"), col("a").as("b")), "a", "b")
        .head().getAs[Double]("kappa")
      assert(k1 == k2, s"$k1 vs $k2")
    }
  }

  test("rboAtK: symmetric, bounded, and maximal on identical lists") {
    for (_ <- 1 to 8) {
      val k = 3 + rng.nextInt(8)
      val p = 0.5 + rng.nextDouble() * 0.45
      val ids = rng.shuffle((1L to 50L).toList)
      val a = ids.take(k).zipWithIndex.map { case (id, i) => (id, i + 1) }
        .toDF("id", "rank")
      val b = rng.shuffle(ids).take(k).zipWithIndex
        .map { case (id, i) => (id, i + 1) }.toDF("id", "rank")
      val ab = Eval.rboAtK(a, b, "id", "rank", k, p)
        .head().getAs[Double]("rbo")
      val ba = Eval.rboAtK(b, a, "id", "rank", k, p)
        .head().getAs[Double]("rbo")
      assert(ab == ba, s"k=$k p=$p")
      val aa = Eval.rboAtK(a, a, "id", "rank", k, p)
        .head().getAs[Double]("rbo")
      assert(ab <= aa + 1e-9 && ab >= 0.0, s"ab=$ab aa=$aa")
    }
  }

  test("tableDigest: additive over disjoint row sets (merge law)") {
    for (_ <- 1 to 8) {
      val n = 5 + rng.nextInt(50)
      val rows = (1 to n).map(i =>
        (i.toLong, if (rng.nextBoolean()) null
        else rng.alphanumeric.take(rng.nextInt(8)).mkString))
      val cut = 1 + rng.nextInt(n - 1)
      val (ra, rb) = rows.splitAt(cut)
      def dig(rs: Seq[(Long, String)]): Long =
        Diff.tableDigest(rs.toDF("id", "v"), Seq("id", "v"))
          .head().getAs[Long]("digest")
      val whole = dig(rows)
      val sum = (dig(ra) + dig(rb)) % 1000000007L
      assert(whole == sum, s"n=$n cut=$cut: $whole vs $sum")
    }
  }

  test("kaplanMeier: survival is non-increasing and inside [0, 1]") {
    for (_ <- 1 to 8) {
      val rows = Seq.fill(20 + rng.nextInt(100))(
        (rng.nextInt(12).toLong, rng.nextInt(2)))
      val curve = TimeSeries.kaplanMeier(rows.toDF("dur", "ev"),
        "dur", "ev")
        .orderBy("t").collect().map(_.getAs[Double]("survival"))
      assert(curve.forall(s => s >= 0.0 && s <= 1.0))
      // rounded at 6dp per step — allow one ulp of rounding slack
      curve.sliding(2).foreach {
        case Array(hi, lo) => assert(lo <= hi + 1e-6, curve.mkString(","))
        case _ =>
      }
    }
  }

  test("transitionMatrix: probabilities sum to 1 per source state") {
    for (_ <- 1 to 6) {
      val states = Seq("a", "b", "c", "d")
      val rows = Seq.fill(100 + rng.nextInt(200))(
        (rng.nextInt(10).toLong, rng.nextLong(1000000L),
          states(rng.nextInt(4))))
      val sums = Eval.transitionMatrix(
        rows.toDF("user_id", "seq", "state"), "user_id", "state",
        Seq("seq"))
        .groupBy("from_state").agg(sum("prob").as("p"))
        .collect().map(_.getAs[Double]("p"))
      // per-row 6dp rounding: tolerance scales with fan-out (≤ 4 rows)
      assert(sums.forall(p => math.abs(p - 1.0) < 1e-5), sums.mkString(","))
    }
  }
}
