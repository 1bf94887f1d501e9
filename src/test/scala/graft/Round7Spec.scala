package graft

import org.apache.spark.sql.functions._
import graft.ops.{Eval, Sketches, Stats, VectorOps}
import graft.queries.{VectorOracles, VectorQueries}

/** Round-7 regression pins: the round-6 behavior changes that shipped
  * without specs (sequenceLogLik's zero-prob NULL guard, weightedMedian's
  * ROWS-frame stability under non-unique sort keys), plus the new
  * deterministic relational HLL tier (q157) and the frozen q220
  * projection axes. */
class Round7Spec extends SparkSpecBase {

  // ---- Eval.sequenceLogLik zero-prob guard (round-6 change) ----

  test("sequenceLogLik: NULLs readouts when a transition's 6-rounded " +
      "prob underflows to 0") {
    import spark.implicits._
    // 1,000,000 keys each emit a->a->a (2M a->a transitions); key 0
    // emits a->b once. share(a->b) = 1/2,000,001 < 5e-7, so the model's
    // 6-rounded prob is 0.000000 — log(0) would silently drop the term;
    // the guard must NULL key 0's readouts instead, and leave every
    // other key's readouts non-NULL.
    val bulk = spark.range(1, 1000001L)
      .select(col("id").as("k"),
        explode(array(lit(0), lit(1), lit(2))).as("t"),
        lit("a").as("st"))
    val tail = Seq((0L, 0, "a"), (0L, 1, "b")).toDF("k", "t", "st")
    val out = Eval.sequenceLogLik(bulk.unionByName(tail), "k", "st",
      Seq("t")).persist()
    try {
      val bad = out.filter(col("k") === 0L).head()
      assert(bad.getAs[Long]("n_trans") == 1L)
      assert(bad.isNullAt(bad.fieldIndex("avg_ll")),
        "underflowed key must report NULL avg_ll, not a shrunken sum")
      assert(bad.isNullAt(bad.fieldIndex("perplexity")))
      // an unaffected key: prob(a->a) 6-rounds to 1.0 -> avg_ll = 0
      val ok = out.filter(col("k") === 1L).head()
      assert(!ok.isNullAt(ok.fieldIndex("avg_ll")))
      assert(math.abs(ok.getAs[Double]("avg_ll")) < 1e-12)
      assert(out.filter(col("avg_ll").isNull).count() == 1L,
        "exactly the one key with the underflowed transition is NULLed")
    } finally out.unpersist()
  }

  // ---- Stats.weightedMedian ROWS-frame pin (round-6 change) ----

  test("weightedMedian: deterministic under non-unique (value, tie) " +
      "keys, invariant to partitioning and input order") {
    import spark.implicits._
    // three identical (value=1.0, tie="x") rows + one (2.0, "x"): total
    // weight 6, cumulative mass reaches half at the third v=1 row under
    // the pinned ROWS frame -> lower median 1.0. Under the default
    // RANGE frame peers share the frame-end cumulative weight — the
    // pin makes the pick well-defined for ANY total order the sort
    // produces.
    val rows = Seq(
      ("g", 1.0, "x", 1L), ("g", 1.0, "x", 1L), ("g", 1.0, "x", 1L),
      ("g", 2.0, "x", 3L),
      // second group, unique ties: the boundary row is the 30-weight
      ("h", 5.0, "a", 10L), ("h", 7.0, "b", 30L), ("h", 9.0, "c", 10L))
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.weightedMedian(df, "g", "v", col("w"), "tie")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    val base = run(rows.toDF("g", "v", "tie", "w"))
    assert(base("g") == ((6L, 1.0)))
    assert(base("h") == ((50L, 7.0)))
    val shuffled = run(rows.reverse.toDF("g", "v", "tie", "w")
      .repartition(7))
    assert(shuffled == base, "frame must be stable across input order " +
      "and partitioning even with duplicate (value, tie) keys")
  }

  // ---- Sketches.hllRelational (q157's new deterministic tier) ----

  test("hllRelational: estimates within HLL error of exact; __all__ " +
      "union row obeys the merge law; partitioning-invariant") {
    import spark.implicits._
    // two overlapping groups: g1 = 1..3000, g2 = 2000..6000
    val df = spark.range(1, 6001L)
      .select(when(col("id") <= 3000, "g1").otherwise("g2").as("grp"),
        graft.ops.TextOps.polyHash(col("id").cast("string")).as("h"))
      .unionByName(spark.range(2000, 3001L)
        .select(lit("g2").as("grp"),
          graft.ops.TextOps.polyHash(col("id").cast("string")).as("h")))
    val got = Sketches.hllRelational(df, "grp", col("h"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // exact: g1 = 3000, g2 = 4001 (2000..6000), union = 6000
    val exact = Map("g1" -> 3000.0, "g2" -> 4001.0, "__all__" -> 6000.0)
    exact.foreach { case (g, n) =>
      val est = got(g)._3
      assert(math.abs(est - n) / n < 0.15,
        s"$g: est $est vs exact $n (3-sigma of 1.04/sqrt(512) = 14%)")
    }
    // merge law, relationally: the union row's integer register
    // summaries must equal the sketch built from the concatenated raw
    // stream under a single group label
    val direct = Sketches.hllRelational(
      df.withColumn("grp", lit("u")), "grp", col("h"))
      .filter(col("grp") === "u").head()
    assert((direct.getLong(1), direct.getLong(2), direct.getDouble(3))
      == got("__all__"),
      "union-of-sketches must equal sketch-of-union, register-exactly")
    // determinism: estimates are pure f(value set), not partition layout
    val re = Sketches.hllRelational(df.repartition(13), "grp", col("h"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(re == got)
  }

  test("hllRelational: linear-counting branch engages below 2.5m and " +
      "is exact-ish at tiny cardinalities") {
    import spark.implicits._
    val df = spark.range(1, 101L).select(lit("g").as("grp"),
      graft.ops.TextOps.polyHash(col("id").cast("string")).as("h"))
    val r = Sketches.hllRelational(df, "grp", col("h"))
      .filter(col("grp") === "g").head()
    val est = r.getDouble(3)
    // linear counting at n=100, m=512 has relative error ~ a few %
    assert(math.abs(est - 100.0) < 15.0, s"linear-counting est $est")
    assert(r.getLong(1) > 0, "tiny cardinality must leave zero registers")
  }

  test("hllRhoSql: integer rank CASE matches the leading-zeros law at " +
      "every power-of-two boundary") {
    import spark.implicits._
    val wBits = Sketches.HllWBits
    // w = 0 -> wBits+1; w in [2^(wBits-r), 2^(wBits-r+1)) -> r
    val cases = (0L +: (1 to wBits).flatMap(r => Seq(
      1L << (wBits - r), (1L << (wBits - r + 1)) - 1)).distinct)
      .map(w => (w, if (w == 0) wBits + 1
        else wBits - (63 - java.lang.Long.numberOfLeadingZeros(w))))
    val df = cases.toDF("__w", "expect")
    val bad = df.select(col("expect"),
        expr(Sketches.hllRhoSql("__w")).as("got"))
      .filter(col("expect") =!= col("got")).count()
    assert(bad == 0L)
  }

  // ---- q220 frozen axes: literal integrity ----

  test("q220 literal axes are orthonormal (pins the frozen literals " +
      "against corruption; the eigensolve itself is spec-gated in " +
      "SignificanceAndPcaSpec)") {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val (w1, w2) = (VectorQueries.PcaAxis1, VectorQueries.PcaAxis2)
    assert(w1.length == 64 && w2.length == 64 &&
      VectorQueries.PcaMean.length == 64)
    assert(math.abs(dot(w1, w1) - 1.0) < 1e-9, "axis 1 unit norm")
    assert(math.abs(dot(w2, w2) - 1.0) < 1e-9, "axis 2 unit norm")
    // the gate corpus' top-2 eigenvalues are nearly degenerate
    // (0.027568 vs 0.027221, ratio 1.013), so 300 power iterations
    // leave an orthogonality residual ~(λ2/λ1)^300 ≈ 2e-2 scaled by the
    // deflation — measured 1.1e-4 here. Any basis of the near-degenerate
    // 2-space is an equally good feature map; the pin guards against
    // literal corruption, not against the eigensolve's known residual.
    assert(math.abs(dot(w1, w2)) < 1e-3, "axes near-orthogonal")
  }

  // ---- auto-plane-count parity contract (ADVICE r6) ----

  test("planesCte defaults are the engine's autoPlaneCount defaults — " +
      "the sizing rule cannot drift between engine and oracle") {
    val cte = VectorOracles.planesCte("embeddings")
    assert(cte.contains(s"range(${VectorOps.DefaultMinPlanes}, 64)"),
      s"oracle minPlanes literal missing from: $cte")
    assert(cte.contains(s"< ${VectorOps.DefaultTargetBucket}"),
      s"oracle targetBucket literal missing from: $cte")
    // and the integer rule itself agrees with the engine across the
    // sizes that matter (around every power-of-two boundary)
    def sqlRule(n: Long): Int = (VectorOps.DefaultMinPlanes to 63)
      .find(p => ((n - 1) >> p) < VectorOps.DefaultTargetBucket)
      .getOrElse(63)
    val ns = Seq(1L, 2L, 7L, 8L, 9L, 127L, 128L, 129L, 500L, 4096L,
      4097L, 1000000L, (1L << 40) - 1, 1L << 40)
    ns.foreach(n => assert(VectorOps.autoPlaneCount(n) == sqlRule(n),
      s"divergence at n=$n"))
  }
}
