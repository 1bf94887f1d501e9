package graft

/** Smoke: every registered query runs at sf0.001 and the flagship returns
  * rows. Value-level correctness is the driver's DuckDB oracle gate
  * (tools/check.py locally). */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    // iterative-trainer queries: correctness is pinned by BpeSpec's
    // exact fixture sequences (there is no single-statement SQL form of
    // an argmax-per-round training loop); the driver records them as
    // rows-only checks. Anything else added without an oracle must
    // either join this documented list or carry the _noracle suffix.
    // (q157 moved to the deterministic relational HLL and q220 to
    // frozen literal axes in round 7 — both now carry full oracles;
    // the datasketches hllRollup tier stays gated by SketchesSpec and
    // the eigensolve by SignificanceAndPcaSpec.)
    val specGated = Set("q134_bpe_merges", "q137_bpe_encode")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = missing -- specGated
    assert(undocumented.isEmpty ||
        undocumented.forall(_.endsWith("_noracle")),
      s"queries without oracle SQL: $undocumented")
  }

  test("no orphan oracle SQL (oracle key without a registered query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
    // scale overrides must shadow an existing entry, never invent one:
    // an override without a default would make the sf1 board gate a
    // query the driver board never checks
    val freeOverrides =
      SparkEntry.oracleSqlScaleOverrides.keySet -- SparkEntry.oracleSql.keySet
    assert(freeOverrides.isEmpty,
      s"scale overrides with no default oracle: $freeOverrides")
    val freeQueryOverrides =
      SparkEntry.queriesScaleOverrides.keySet -- SparkEntry.queries.keySet
    assert(freeQueryOverrides.isEmpty,
      s"query scale overrides with no default query: $freeQueryOverrides")
    // a folded QUERY twin needs its folded ORACLE twin, or the sf1
    // board would compare the folded Spark shape to the full oracle
    val unmatched =
      SparkEntry.queriesScaleOverrides.keySet --
        SparkEntry.oracleSqlScaleOverrides.keySet
    assert(unmatched.isEmpty,
      s"query scale overrides with no oracle twin: $unmatched")
  }

  test("q111 source matrix accounts for every q28 verified pair") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("q28_neardup_verified")(spark, sf).count()
    val m = SparkEntry.queries("q111_dup_source_matrix")(spark, sf)
    val cells = m.collect()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == pairs)
    // orientation-normalized: one cell per unordered source pair
    cells.foreach(r => assert(
      r.getAs[String]("source_a") <= r.getAs[String]("source_b")))
    assert(m.groupBy("source_a", "source_b").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("q113 int8 codes stay in [-128, 127] and dequantize within bound") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val rows = SparkEntry.queries("q113_int8_quant")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qsum = r.getAs[Long]("q_sum")
      assert(qsum >= -128L * dim && qsum <= 127L * dim)
      // max per-component error is half a quantization step of the
      // widest dimension; L2 over dim components is bounded by sqrt(dim)
      // steps — loose but catches sign/offset bugs
      assert(r.getAs[Double]("l2_err") >= 0.0 &&
        r.getAs[Double]("l2_err") < math.sqrt(dim.toDouble))
    }
  }

  test("q114 outliers sit strictly more than 2 sigma below their label mean") {
    val out = SparkEntry.queries("q114_centroid_outliers")(spark, sf).collect()
    out.foreach(r => assert(r.getAs[Double]("z") < -2.0 + 1e-9))
  }

  test("q115 buckets are quartiles: monotone in n_chars, all four present") {
    import org.apache.spark.sql.functions._
    val b = SparkEntry.queries("q115_curriculum")(spark, sf)
    val perBucket = b.groupBy(col("bucket"))
      .agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"),
        count(lit(1)).as("n"))
      .orderBy(col("bucket")).collect()
    assert(perBucket.map(_.getAs[Int]("bucket")).toSeq == Seq(0, 1, 2, 3))
    // bucket ranges must not interleave
    perBucket.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("mx") <= hi.getAs[Long]("mn"))
    }
  }

  test("q116 keeps at most SourceCap docs per source, ranks contiguous") {
    import org.apache.spark.sql.functions._
    val m = SparkEntry.queries("q116_source_cap")(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"))
      .collect()
    m.foreach { r =>
      assert(r.getAs[Long]("n") <= graft.queries.TextQueries.SourceCap)
      assert(r.getAs[Int]("mx").toLong == r.getAs[Long]("n"))
    }
  }

  test("q148 grouped split: no verified near-dup pair straddles splits") {
    val split = SparkEntry.queries("q148_grouped_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = SparkEntry.queries("q28_neardup_verified")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles splits")
    }
    // and the split still lands near 80/10/10 overall
    val n = split.size.toDouble
    val train = split.values.count(_ == "train") / n
    assert(train > 0.6 && train < 0.95, s"train frac $train")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 and returns a sane schema") {
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
