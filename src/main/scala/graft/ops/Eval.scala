package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Classifier / experiment evaluation over a scored corpus — the readout
  * side of the curation loop (quality filters, lang-id, mix policies all
  * produce scores; these operators grade them). Reference analogue: the
  * reference's QC layer is row-count reconciliation
  * (`etl_pipeline/etl_main.py` verification queries); a training-data
  * pipeline additionally needs ranking metrics (AUC), calibration
  * diagnostics, and experiment significance readouts, so they are
  * first-class here.
  *
  * Everything is built to hold at 100 TB:
  *   - AUC never sorts rows globally: it aggregates to DISTINCT SCORES
  *     first (bounded by the score expression's value domain, ≪ corpus),
  *     then runs the rank arithmetic on that aggregate — the window
  *     scans score-domain-sized partitions, not the corpus.
  *   - All accumulation is integer or decimal (exact, order-invariant);
  *     doubles appear only in final per-group divisions, so results are
  *     bit-stable under any partitioning and match a single-threaded
  *     oracle.
  */
object Eval {

  /** Tie-aware Mann–Whitney AUC of `scoreCol` ranking `labelCol` (0/1)
    * within each `groupCol` stratum.
    *
    * Exact rank form: with P positives, N negatives, and for each
    * distinct score s: p_s positives, n_s negatives, and cumNBelow_s =
    * Σ n_t for t < s,
    *   2·U = Σ_s p_s · (2·cumNBelow_s + n_s)
    * (each positive beats every strictly-lower negative and half-beats
    * same-score negatives), AUC = 2U / (2·P·N). 2U stays integral, so
    * the only float op is the final division.
    *
    * Plan: hash-agg to (group, score) → window over distinct scores
    * (partitioned by group — never a global sort of raw rows) → hash-agg
    * to group. Strata with no positives or no negatives yield NULL auc
    * rather than a division error. */
  def rankAuc(df: DataFrame, groupCol: String, scoreCol: String,
              labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(groupCol), col(scoreCol))
      .agg(sum(col(labelCol)).cast("long").as("p"),
        (count(lit(1)) - sum(col(labelCol))).cast("long").as("n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum_n_below", coalesce(sum(col("n")).over(w), lit(0L)))
      .groupBy(col(groupCol))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("cum_n_below") + col("n"))).as("u2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u2").cast(DoubleType) /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)))
  }

  /** Reliability-diagram bins: split a [0,1] `scoreCol` into `k`
    * equal-width bins and report, per bin, the row count, the mean
    * score, and the empirical positive rate of `labelCol` — the
    * calibration readout for any probability-shaped quality signal.
    *
    * Mean-score accumulation goes through DECIMAL(18,6) (exact,
    * order-invariant sums); the per-bin divisions at the end are the
    * only float ops. One hash aggregation, k rows out. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      k: Int = 10): DataFrame =
    df.select(
        least(floor(col(scoreCol) * k), lit(k - 1)).cast("long").as("bin"),
        col(scoreCol).cast(DecimalType(18, 6)).as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        // cast the EXACT decimal sum to double BEFORE dividing: decimal
        // division rounding rules differ across engines, double division
        // of identical inputs doesn't
        round(sum(col("s")).cast(DoubleType) / count(lit(1)), 6)
          .as("avg_score"),
        round(sum(col("y")).cast(DoubleType) / count(lit(1)), 6)
          .as("pos_rate"))

  /** Isotonic calibration via pool-adjacent-violators over score bins —
    * the step that turns a monotone-in-truth quality score into an
    * actual probability (the reliability diagram from
    * [[calibrationBins]] shows the miscalibration; this fixes it).
    *
    * Scale split: the corpus-sized work is ONE hash aggregation to
    * (bin, n, positives); PAV itself runs driver-side on the ≤ `k`
    * bin rows (the same domain-sized-collect license as strata counts),
    * merging adjacent bins while any bin's rate drops below its
    * predecessor's — weighted by bin mass, the textbook algorithm.
    * Returns one row per original bin: n, raw pos_rate, and the
    * calibrated (non-decreasing) rate. Exact long arithmetic inside
    * PAV; rates divide once at the end. */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
                        k: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bins = df.select(
        least(floor(col(scoreCol) * k), lit(k - 1)).cast("long").as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // PAV: pools carry (bins, n, pos); merge while rate decreases.
    // Rate comparison in cross-multiplied longs — no float until output.
    val pools = scala.collection.mutable.ArrayBuffer
      .empty[(List[Long], Long, Long)]
    bins.foreach { case (b, n, pos) =>
      pools += ((List(b), n, pos))
      while (pools.length >= 2 && {
        val (_, n2, p2) = pools(pools.length - 1)
        val (_, n1, p1) = pools(pools.length - 2)
        p2 * n1 < p1 * n2 // rate2 < rate1 → violation
      }) {
        val (b2, n2, p2) = pools.remove(pools.length - 1)
        val (b1, n1, p1) = pools.remove(pools.length - 1)
        pools += ((b1 ++ b2, n1 + n2, p1 + p2))
      }
    }
    val rows = for {
      (bs, n, pos) <- pools.toSeq
      b <- bs
    } yield {
      val (_, rawN, rawPos) = bins.find(_._1 == b).get
      (b, rawN,
        BigDecimal(rawPos.toDouble / rawN)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(pos.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    rows.toDF("bin", "n", "pos_rate", "calibrated")
  }

  /** Welch's two-sample t statistic per `groupCol`, comparing
    * `metricCol` between the two arms of `armCol` (must be 0/1 — e.g. a
    * deterministic hash-split assignment). Returns per-group counts,
    * means, the mean difference (arm0 − arm1), and the t statistic with
    * Welch–Satterthwaite degrees of freedom.
    *
    * Sums and sums-of-squares accumulate as DECIMAL (exact at any
    * partitioning; the metric is cast to DECIMAL(18,4) first, the same
    * convention the relational money aggregates use), so mean/variance
    * inputs are bit-identical to a serial oracle before the final float
    * divisions. One hash aggregation; output is one row per group. */
  def welchTwoSample(df: DataFrame, groupCol: String, armCol: String,
                     metricCol: String): DataFrame = {
    val m = col(metricCol).cast(DecimalType(18, 4))
    def armAgg(arm: Int, out: String): Seq[(String, Column)] = Seq(
      s"n$out" -> count(when(col(armCol) === arm, lit(1))),
      s"sum$out" -> sum(when(col(armCol) === arm, m)),
      s"sq$out" -> sum(when(col(armCol) === arm, (m * m).cast(DecimalType(38, 8)))))
    val aggs = (armAgg(0, "0") ++ armAgg(1, "1")).map { case (n, c) => c.as(n) }
    val a = df.filter(col(metricCol).isNotNull)
      .groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    def mean(s: String, n: String) = col(s).cast(DoubleType) / col(n)
    // unbiased variance from exact sums: (Σx² − (Σx)²/n) / (n−1)
    def variance(s: String, q: String, n: String) =
      (col(q).cast(DoubleType) -
        col(s).cast(DoubleType) * col(s).cast(DoubleType) / col(n)) /
        (col(n) - 1)
    val v0 = variance("sum0", "sq0", "n0")
    val v1 = variance("sum1", "sq1", "n1")
    val se0 = v0 / col("n0")
    val se1 = v1 / col("n1")
    a.select(col(groupCol),
      col("n0"), col("n1"),
      round(mean("sum0", "n0"), 6).as("mean0"),
      round(mean("sum1", "n1"), 6).as("mean1"),
      round(mean("sum0", "n0") - mean("sum1", "n1"), 6).as("mean_diff"),
      round((mean("sum0", "n0") - mean("sum1", "n1")) / sqrt(se0 + se1), 4)
        .as("t_stat"),
      round(pow(se0 + se1, 2) /
        (pow(se0, 2) / (col("n0") - 1) + pow(se1, 2) / (col("n1") - 1)), 2)
        .as("welch_df"))
  }

  /** Cohen's kappa — chance-corrected agreement between two label
    * columns (two annotators, a classifier vs ground truth, a heuristic
    * vs a model). Returns ONE row: n, agree, observed agreement po,
    * chance agreement pe, and kappa.
    *
    * The whole statistic reduces over the LABEL-PAIR contingency table
    * (|A|·|B| cells, ≪ corpus): one hash aggregation builds the table,
    * everything after runs on label-domain-sized frames. Kappa is kept
    * integral to the last step: kappa = (n·agree − Σ row_a·col_a) /
    * (n² − Σ row_a·col_a) — exact BIGINT numerator and denominator, one
    * float division at the end. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ct = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = ct.agg(sum(col("c")).as("n"))
    val agree = ct.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("agree"))
    // products go through DECIMAL(38,0): n·agree and Σ ra·cb are ~n² and
    // overflow BIGINT past ~3e9 rows — exactly the corpus sizes this
    // targets (DuckDB computes the same products in HUGEINT; both exact)
    def d(c: Column) = c.cast(DecimalType(38, 0))
    val peNum = ct.groupBy(col("a")).agg(sum(col("c")).as("ra"))
      .join(ct.groupBy(col("b")).agg(sum(col("c")).as("cb")),
        col("a") === col("b"))
      .agg(coalesce(sum(d(col("ra")) * d(col("cb"))),
        lit(java.math.BigDecimal.ZERO)).as("pe_num"))
    n.crossJoin(broadcast(agree)).crossJoin(broadcast(peNum))
      .select(col("n"), col("agree"),
        round(col("agree").cast(DoubleType) / col("n"), 6).as("po"),
        round(col("pe_num").cast(DoubleType) /
          (d(col("n")) * d(col("n"))).cast(DoubleType), 6).as("pe"),
        round((d(col("n")) * d(col("agree")) - col("pe_num"))
          .cast(DoubleType) /
          (d(col("n")) * d(col("n")) - col("pe_num")).cast(DoubleType), 6)
          .as("kappa"))
  }

  /** NDCG@k of a ranked retrieval result against graded relevance.
    * `ranked` carries `rankCol` (1-based positions, ≤ k rows) and
    * `relCol` (small integer grades); `idealGrades` carries `relCol` for
    * EVERY candidate document — its top-k grades define the ideal DCG.
    *
    * Determinism: gains are integral ((2^rel − 1) via bit shift), and
    * the position discounts 1/log2(pos+1) are evaluated ONCE here in
    * Scala, rounded to 9 decimals, and joined in as a k-row literal
    * table — the oracle interpolates the SAME literals, so no
    * transcendental ever evaluates inside either engine. DCG/IDCG
    * accumulate as exact decimals; the one float division is the final
    * ratio. The ideal ranking is a TakeOrdered top-k, never a global
    * sort. Returns one row: (k, dcg, idcg, ndcg). */
  /** The NDCG position discounts 1/log2(pos+1), 9-dp — evaluated here
    * once so the engine-side literal table and any SQL oracle
    * interpolate the IDENTICAL decimals. */
  def ndcgDiscounts(k: Int): Seq[(Int, BigDecimal)] =
    (1 to k).map(p => (p,
      BigDecimal(1.0 / (math.log(p + 1) / math.log(2)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)))

  def ndcgAtK(ranked: DataFrame, rankCol: String, relCol: String,
              idealGrades: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = ranked.sparkSession
    import spark.implicits._
    val discounts = ndcgDiscounts(k).toDF("pos", "w")
    // (2^rel − 1) via bit shift — integral, no float pow (the Scala
    // shiftleft overload only takes a literal Int, so call by name)
    def gain(c: Column) =
      (call_function("shiftleft", lit(1L), c.cast("int")) - 1L)
        .cast(DecimalType(18, 0))
    val dcg = ranked.join(broadcast(discounts),
        ranked(rankCol) === col("pos"))
      .agg(sum(gain(col(relCol)) * col("w")).as("dcg"))
    // rank the top-k grades 1..k by grade desc: k rows, driver-scale
    val idealRanked = idealGrades.select(col(relCol))
      .orderBy(col(relCol).desc).limit(k)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(relCol).desc)))
    val idcg = idealRanked.join(broadcast(discounts), "pos")
      .agg(sum(gain(col(relCol)) * col("w")).as("idcg"))
    dcg.crossJoin(broadcast(idcg))
      .select(lit(k).as("k"),
        // decimal-first rounding: double-round ties diverge between
        // engines (the q110 class)
        round(col("dcg"), 6).cast(DoubleType).as("dcg"),
        round(col("idcg"), 6).cast(DoubleType).as("idcg"),
        when(col("idcg") > 0,
          round(col("dcg").cast(DoubleType) /
            col("idcg").cast(DoubleType), 6)).as("ndcg"))
  }

  /** Truncated rank-biased overlap (RBO@k, Webber et al.) between two
    * ranked lists — "how much do two retrieval strategies agree", with
    * geometric top-weighting p. Uses the closed reshuffle of the
    * truncated sum: RBO = (1−p) · Σ_pairs W_max(ra,rb), where
    * W_m = Σ_{d=m..k} p^(d−1)/d is a k-ENTRY LITERAL TABLE evaluated
    * here in Scala (9-dp decimals) — so the engines run one equi-join
    * of the two lists, one broadcast lookup on max-rank, and one
    * decimal sum. No per-depth recount, no transcendental engine-side,
    * and a SQL oracle interpolating the same literals matches exactly.
    * Returns one row: (k, p, n_common, rbo). */
  def rboAtK(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
             k: Int, p: Double): DataFrame = {
    require(k >= 1 && p > 0 && p < 1, s"need k >= 1, 0 < p < 1; got $k, $p")
    val spark = a.sparkSession
    import spark.implicits._
    val weights = rboTailWeights(k, p).toDF("m", "tail_w")
    val joined = a.select(col(idCol), col(rankCol).cast("int").as("__ra"))
      .join(b.select(col(idCol), col(rankCol).cast("int").as("__rb")),
        idCol)
      .select(greatest(col("__ra"), col("__rb")).as("m"))
    joined.join(broadcast(weights), "m")
      .agg(count(lit(1)).as("n_common"),
        coalesce(sum(col("tail_w")), lit(java.math.BigDecimal.ZERO))
          .as("wsum"))
      .select(lit(k).as("k"), lit(p).as("p"), col("n_common"),
        round(lit(1.0 - p) * col("wsum").cast(DoubleType), 6).as("rbo"))
  }

  /** W_m = Σ_{d=m..k} p^(d−1)/d, 9-dp — the literal tail-weight table
    * [[rboAtK]] joins on; public so oracles interpolate the same
    * values. */
  def rboTailWeights(k: Int, p: Double): Seq[(Int, BigDecimal)] = {
    val terms = (1 to k).map(d => math.pow(p, d - 1) / d)
    (1 to k).map(m => (m,
      BigDecimal(terms.drop(m - 1).sum)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * for each key's events ordered by `orderCols`, count (state → next
    * state) transitions and attach the per-source-state transition
    * probability. The window partitions by key — state never leaves its
    * key's partition, so the shape scales with keys, not with a global
    * sort. Probability = n / Σn over the source state, computed from two
    * hash aggregations (transition counts, then a window over the
    * STATE-DOMAIN-sized aggregate). */
  def transitionMatrix(df: DataFrame, keyCol: String, stateCol: String,
                       orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val trans = df
      .select(col(keyCol), col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val wSrc = Window.partitionBy(col("from_state"))
    trans.withColumn("prob",
      round(col("n").cast(DoubleType) / sum(col("n")).over(wSrc), 6))
  }

  /** Precision/recall/F1 sweep over a threshold grid — the operating-
    * point readout that turns a ranked score ([[rankAuc]] grades the
    * ranking; this picks the cutoff a filter will actually ship with).
    * One threshold-exploded hash aggregate (rows × |grid| collapses
    * map-side to |grid| rows); total positives ride the same pass via
    * a grid-independent conditional sum. Thresholds arrive as exact
    * double literals shared with the oracle; counts are exact, the
    * three ratios are the only float ops (order mirrored). */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "empty threshold grid")
    def d(c: Column) = c.cast(DoubleType)
    val exploded = df.select(col(scoreCol).as("__s"),
        col(labelCol).cast("long").as("__y"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
    exploded.groupBy(col("threshold"))
      .agg(
        count(when(col("__s") >= col("threshold") && col("__y") === 1, 1))
          .as("tp"),
        count(when(col("__s") >= col("threshold") && col("__y") === 0, 1))
          .as("fp"),
        count(when(col("__s") < col("threshold") && col("__y") === 1, 1))
          .as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          round(d(col("tp")) / d(col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          round(d(col("tp")) / d(col("tp") + col("fn")), 6))
          .as("recall"),
        when(col("tp") > 0,
          round(lit(2.0) * d(col("tp")) /
            (lit(2.0) * d(col("tp")) + d(col("fp")) + d(col("fn"))), 6))
          .otherwise(lit(0.0)).as("f1"))
  }

  /** Per-key sequence log-likelihood under the self-trained first-order
    * Markov model ([[transitionMatrix]]): avg_ll = Σ ln(p(from→to))/n
    * over the key's transitions, plus perplexity = exp(−avg_ll) — the
    * "how typical is this user's path" score (anomalous sessions rank
    * low). The model is a ≤|states|² frame broadcast into the pair
    * stream; ln terms are 9-rounded into DECIMAL before summing (the
    * dsum rule — raw double sums are partition-order-dependent). Uses
    * the model's 6-rounded probabilities so both engines take ln of
    * identical doubles. Every observed transition has nonzero COUNT in
    * a self-trained model, but its 6-rounded prob can still underflow
    * to 0.000000 (share < 5e-7 of its from-state) — which is exactly
    * why the aggregate below NULLs a key's readouts when any zero-prob
    * transition appears, instead of letting log(0) = NULL silently
    * shrink the sum. */
  def sequenceLogLik(df: DataFrame, keyCol: String, stateCol: String,
                     orderCols: Seq[String]): DataFrame = {
    val model = transitionMatrix(df, keyCol, stateCol, orderCols)
      .select(col("from_state"), col("to_state"), col("prob"))
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = df
      .select(col(keyCol), col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
    // guard against prob == 0: the model's prob is 6-rounded, so a
    // transition with share < 5e-7 of its from-state rounds to 0.000000
    // and log(0) = NULL in Spark — sum() would silently SKIP the term
    // and report avg_ll over fewer terms than n_trans. Instead count
    // zero-prob transitions and NULL the key's readouts when any exist:
    // an underflowed likelihood should fail loudly, not quietly shrink.
    pairs.join(broadcast(model), Seq("from_state", "to_state"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_trans"),
        count(when(col("prob") <= 0, 1)).as("__nzero"),
        sum(when(col("prob") > 0, round(log(col("prob")), 9))
          .otherwise(lit(0)).cast(DecimalType(18, 9)))
          .cast(DoubleType).as("__lls"))
      .select(col(keyCol), col("n_trans"),
        when(col("__nzero") === 0,
          round(col("__lls") / col("n_trans").cast(DoubleType), 6))
          .as("avg_ll"),
        when(col("__nzero") === 0,
          round(exp(-(col("__lls") / col("n_trans").cast(DoubleType))), 6))
          .as("perplexity"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher SIGIR'09) of two
    * rankings: score(id) = Σ_lists 1/(`k`+rank), absent-from-list
    * contributing 0 — the standard way to combine heterogeneous
    * retrieval signals (BM25 + ANN, revenue + frequency) without score
    * normalization. A full outer join on id plus pure arithmetic; each
    * input is already a top-N sliver, so the join is shortlist-sized
    * at any corpus scale. 1/(k+rank) divides identical integers on
    * any engine — the fused score is float-deterministic, rounded to
    * 9 for the ordering readout. Output: id, rank_a, rank_b, rrf. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankCol: String, k: Int = 60): DataFrame = {
    require(k >= 1, s"k < 1: $k")
    val fa = a.select(col(idCol), col(rankCol).cast("int").as("rank_a"))
    val fb = b.select(col(idCol), col(rankCol).cast("int").as("rank_b"))
    fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        round(
          coalesce(lit(1.0) / (lit(k) + col("rank_a")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(k) + col("rank_b")), lit(0.0)), 9)
          .as("rrf"))
  }

  /** Abramowitz–Stegun 7.1.26 complementary-error-function approximation
    * for x ≥ 0 (|abs error| < 1.5e-7 — plenty for a 6-decimal p-value
    * readout). Every operation is a plain double multiply/add/divide in
    * a FIXED order so a SQL oracle spelling the identical expression
    * evaluates bit-identically (exp() may differ by ≤ 1 ulp across
    * libm implementations; the 6-decimal rounding absorbs that). */
  def erfcApprox(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly =
      ((((lit(1.061405429) * t - lit(1.453152027)) * t + lit(1.421413741))
        * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    poly * exp(-(x * x))
  }

  /** Mann–Whitney U test of `metricCol` between the two arms of
    * `armCol` (0/1) within each stratum of `groupCols` — the
    * nonparametric companion of [[welchTwoSample]]: compares the whole
    * rank distribution, not means, so it survives heavy tails and
    * outliers that sink the t-test.
    *
    * Exactness: midranks are carried DOUBLED (2r = 2·rank + ties − 1,
    * an integer), their sums accumulate as DECIMAL(38,0), and the tie
    * correction Σ(t³−t) falls out of the SAME window pass — each row of
    * a t-way tie contributes t²−1, so one decimal row-sum gives the
    * value with no second aggregation. U itself is exact in half-units;
    * floats appear only in the final z/p formula. z uses the normal
    * approximation WITHOUT continuity correction (documented choice —
    * keeps the formula engine-portable); the two-sided p is
    * erfc(|z|/√2) via [[erfcApprox]].
    *
    * Plan: one window sort per stratum (rank + tie counts share the
    * partition) → one hash aggregation; output is stratum-domain-sized.
    * Strata with an empty arm or zero rank variance yield NULL z/p. */
  def mannWhitneyU(df: DataFrame, groupCols: Seq[String], armCol: String,
                   metricCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val dec = DecimalType(38, 0)
    def d(c: Column) = c.cast(DoubleType)
    val w = Window.partitionBy(gs: _*).orderBy(col(metricCol))
    val wTie = Window.partitionBy(gs :+ col(metricCol): _*)
    val ranked = df.filter(col(metricCol).isNotNull)
      .select(gs ++ Seq(col(armCol).as("__arm"),
        (rank().over(w) * 2 + count(lit(1)).over(wTie) - 1)
          .as("__r2"),
        count(lit(1)).over(wTie).as("__tc")): _*)
    val m = ranked.groupBy(gs: _*).agg(
      count(when(col("__arm") === 0, lit(1))).as("n0"),
      count(when(col("__arm") === 1, lit(1))).as("n1"),
      sum(when(col("__arm") === 0, col("__r2")).cast(dec)).as("__r0d"),
      // Σ_values t·(t²−1) = Σ_t (t³−t): each tied row contributes t²−1
      sum((col("__tc") * col("__tc") - 1).cast(dec)).as("__ties"))
    val n = col("n0") + col("n1")
    // 2·U0 = Σ(2r | arm0) − n0·(n0+1); U0 exact in half-units
    val u0 = (d(col("__r0d")) - d(col("n0")) * (d(col("n0")) + 1.0)) / 2.0
    val mu = d(col("n0")) * d(col("n1")) / 2.0
    val variance = d(col("n0")) * d(col("n1")) / 12.0 *
      ((d(n) + 1.0) - d(col("__ties")) / (d(n) * (d(n) - 1.0)))
    val z = (u0 - mu) / sqrt(variance)
    m.select(gs ++ Seq(col("n0"), col("n1"), u0.as("u"),
      when(col("n0") > 0 && col("n1") > 0 && variance > 0,
        round(z, 4)).as("z"),
      when(col("n0") > 0 && col("n1") > 0 && variance > 0,
        round(erfcApprox(abs(z) / sqrt(lit(2.0))), 6)).as("p_two")): _*)
  }

  /** Two-proportion z-test of a 0/1 `successCol` between the arms of
    * `armCol` per stratum — the conversion-rate A/B readout
    * ([[welchTwoSample]] compares means of a metric; this compares
    * rates of an outcome). Pooled-variance z:
    *   z = (p0 − p1) / √(p̂(1−p̂)(1/n0 + 1/n1)),  p̂ pooled.
    * Counts are exact longs; every float op is a fixed-order division/
    * sqrt so a SQL oracle matches bit-for-bit; two-sided p from
    * [[erfcApprox]]. One hash aggregation, stratum-domain output.
    * Degenerate strata (empty arm, all-success or all-failure pool)
    * yield NULL z/p. */
  def twoProportionZ(df: DataFrame, groupCols: Seq[String],
                     armCol: String, successCol: String): DataFrame = {
    val gs = groupCols.map(col)
    def d(c: Column) = c.cast(DoubleType)
    val m = df.groupBy(gs: _*).agg(
      count(when(col(armCol) === 0, lit(1))).as("n0"),
      sum(when(col(armCol) === 0, col(successCol)).otherwise(0))
        .cast("long").as("s0"),
      count(when(col(armCol) === 1, lit(1))).as("n1"),
      sum(when(col(armCol) === 1, col(successCol)).otherwise(0))
        .cast("long").as("s1"))
    val p0 = d(col("s0")) / col("n0")
    val p1 = d(col("s1")) / col("n1")
    val pp = (d(col("s0")) + d(col("s1"))) / (d(col("n0")) + d(col("n1")))
    val z = (p0 - p1) /
      sqrt((pp * (lit(1.0) - pp)) * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val ok = col("n0") > 0 && col("n1") > 0 &&
      col("s0") + col("s1") > 0 && col("s0") + col("s1") < col("n0") + col("n1")
    m.select(gs ++ Seq(col("n0"), col("s0"), col("n1"), col("s1"),
      round(p0, 6).as("p0"), round(p1, 6).as("p1"),
      when(ok, round(z, 4)).as("z"),
      when(ok, round(erfcApprox(abs(z) / sqrt(lit(2.0))), 6))
        .as("p_two")): _*)
  }

  /** Cochran–Mantel–Haenszel test: association between a 0/1 arm and a
    * 0/1 outcome POOLED ACROSS STRATA — the guard against Simpson's
    * paradox that a collapsed 2×2 (q221 on the whole table) walks into.
    * Per stratum h with arm-0 row (a, n0−a), arm-1 row (c, n1−c),
    * n = n0+n1, col0 = a+c:
    *   E_h = n0·col0/n,  V_h = n0·n1·col0·(n−col0) / (n²·(n−1)),
    * χ² = (ΣA − ΣE)² / ΣV (no continuity correction — documented
    * choice, same policy as [[mannWhitneyU]]).
    *
    * ΣA is an exact long; E/V are division-shaped per-stratum values →
    * round 9 → decimal sum (order-free, oracle-exact). One hash
    * aggregation to the stratum domain, one scalar aggregation.
    * Single-subject strata (n = 1) contribute zero V. Returns ONE row:
    * n_strata, o (=ΣA), e, chi2. */
  def cmhTest(df: DataFrame, strataCols: Seq[String], armCol: String,
              successCol: String): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val byStratum = df.groupBy(strataCols.map(col): _*).agg(
      count(when(col(armCol) === 0, lit(1))).as("n0"),
      sum(when(col(armCol) === 0, col(successCol)).otherwise(0))
        .cast("long").as("a"),
      count(when(col(armCol) === 1, lit(1))).as("n1"),
      sum(when(col(armCol) === 1, col(successCol)).otherwise(0))
        .cast("long").as("c"))
    val n = d(col("n0")) + d(col("n1"))
    val col0 = d(col("a")) + d(col("c"))
    val e = d(col("n0")) * col0 / n
    val v = (((d(col("n0")) * d(col("n1"))) * col0) * (n - col0)) /
      ((n * n) * (n - lit(1.0)))
    val terms = byStratum.select(col("a"),
      round(e, 9).cast("decimal(28,9)").as("__e"),
      when(col("n0") + col("n1") > 1, round(v, 9)).otherwise(lit(0.0))
        .cast("decimal(28,9)").as("__v"))
    terms.agg(count(lit(1)).as("n_strata"), sum(col("a")).as("o"),
        sum(col("__e")).as("__es"), sum(col("__v")).as("__vs"))
      .select(col("n_strata"), col("o"),
        round(col("__es"), 6).cast("double").as("e"),
        round((d(col("o")) - col("__es").cast("double")) *
          (d(col("o")) - col("__es").cast("double")) /
          col("__vs").cast("double"), 6).as("chi2"))
  }

  /** Minimum detectable effect for a two-proportion test at the
    * CURRENT sample sizes — the experiment-planning readout ("how small
    * a rate lift could this split even see"): for two-sided α = 0.05
    * and power 0.8,
    *   MDE = (z_{0.975} + z_{0.8})·√(p̂(1−p̂)(1/n0 + 1/n1)),
    * with the standard-normal quantiles as fixed literals (1.959964,
    * 0.841621 — Moivre quantiles to 6 places; no inverse-CDF needed at
    * runtime). Counts exact; one hash aggregation. */
  def minDetectableEffect(df: DataFrame, groupCols: Seq[String],
                          successCol: String): DataFrame = {
    val gs = groupCols.map(col)
    def d(c: Column) = c.cast(DoubleType)
    // both-arm pooled rate from the SAME table the test would run on;
    // arm sizes approximated as an even split of the stratum
    val m = df.groupBy(gs: _*).agg(count(lit(1)).as("n"),
      sum(col(successCol)).cast("long").as("s"))
    val p = d(col("s")) / col("n")
    val half = d(col("n")) / 2.0
    // single literal (1.959964 + 0.841621), NOT a runtime sum — the SQL
    // oracle parses the same decimal literal to the same double
    val mde = lit(2.801585) *
      sqrt((p * (lit(1.0) - p)) * (lit(1.0) / half + lit(1.0) / half))
    m.select(gs ++ Seq(col("n"), col("s"), round(p, 6).as("p_pool"),
      when(col("s") > 0 && col("s") < col("n"), round(mde, 6))
        .as("mde")): _*)
  }

  /** Sequential probability ratio test (SPRT) boundary crossing per
    * stratum: walk the events in time order accumulating the Bernoulli
    * log-likelihood ratio of H1: rate = p1 vs H0: rate = p0, and stop
    * at the first crossing of the Wald boundaries ln((1−β)/α) /
    * ln(β/(1−α)) — the "peeking-safe" alternative to running q221
    * daily. Returns one row per stratum: total n, n_seen at the
    * decision (total if no crossing), decided_at timestamp (null if
    * none), decision ('h1' | 'h0' | null).
    *
    * DETERMINISM: the two per-event LLR increments and both boundaries
    * are 9-decimal literals computed ONCE (no runtime ln at all), the
    * running sum is an exact decimal window over a TOTAL order
    * (tsCol, tieCol), and crossings compare decimals — bit-identical
    * on any engine, any partitioning. The window sorts within stratum
    * partitions (never global). */
  def sprtBoundary(df: DataFrame, groupCols: Seq[String], tsCol: String,
                   tieCol: String, successCol: String, p0: Double,
                   p1: Double, alpha: Double = 0.05,
                   beta: Double = 0.05): DataFrame = {
    val gs = groupCols.map(col)
    def dec9(x: Double): Column =
      lit(java.math.BigDecimal.valueOf(math.rint(x * 1e9).toLong, 9))
        .cast(DecimalType(28, 9))
    val l1 = dec9(math.log(p1 / p0))
    val l0 = dec9(math.log((1.0 - p1) / (1.0 - p0)))
    val a = dec9(math.log((1.0 - beta) / alpha))
    val b = dec9(math.log(beta / (1.0 - alpha)))
    val w = Window.partitionBy(gs: _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = df.select(gs ++ Seq(col(tsCol), col(tieCol),
      col(successCol).as("__c")): _*)
      .withColumn("__llr", sum(
        when(col("__c") === 1, l1).otherwise(l0)).over(w))
      .withColumn("__i", count(lit(1)).over(w))
    val crossings = walked
      .filter(col("__llr") >= a || col("__llr") <= b)
      .groupBy(gs: _*)
      .agg(min(struct(col("__i"), col(tsCol), col("__llr")))
        .as("__first"))
      .select(gs ++ Seq(col("__first.__i").as("n_seen"),
        col(s"__first.$tsCol").as("decided_at"),
        when(col("__first.__llr") >= a, lit("h1")).otherwise(lit("h0"))
          .as("decision")): _*)
    val totals = walked.groupBy(gs: _*).agg(count(lit(1)).as("n"))
    totals.join(crossings, groupCols, "left")
      .select(gs ++ Seq(col("n"),
        coalesce(col("n_seen"), col("n")).as("n_seen"),
        col("decided_at"), col("decision")): _*)
  }

  /** Split-conformal interval width per stratum: fit a point predictor
    * on the TRAIN split (here: the (stratum, binCol) mean), take the
    * ⌈(n+1)(1−α)⌉-th smallest absolute residual on the CALIBRATION
    * split — the distribution-free width w such that
    * "prediction ± w" covers ≥ 1−α of future points under
    * exchangeability. The modern ML answer to "how wrong is this score
    * allowed to be", with zero model assumptions.
    *
    * Exactness: an order statistic of deterministic doubles — no sums,
    * no rounding chains; the rank is computed from exact counts. The
    * model table is bin-domain-sized (broadcast join); the residual
    * rank runs in stratum-partitioned windows. Calibration rows whose
    * bin never occurs in train are dropped (no prediction to score).
    *
    * Scale note: the per-stratum rank sorts CALIBRATION rows — exact
    * by design (it is the oracle-gated definition). At corpus scale,
    * cap the calibration split (a conformal quantile stabilizes at
    * ~10⁴–10⁵ points; q54's deterministic sampler bounds it) rather
    * than sorting a full stratum. */
  def conformalWidth(df: DataFrame, groupCol: String, binCol: Column,
                     valueCol: String, splitCol: String,
                     alpha: Double = 0.1): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val src = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), binCol.as("__bin"),
        col(valueCol).as("__v"), col(splitCol).as("__split"))
    val model = src.filter(col("__split") === 0)
      .groupBy(col(groupCol), col("__bin"))
      .agg((sum(col("__v").cast(DecimalType(18, 4))).cast(DoubleType) /
        count(lit(1))).as("__mean"))
    val cal = src.filter(col("__split") === 1)
      .join(broadcast(model), Seq(groupCol, "__bin"))
      .withColumn("__r", abs(d(col("__v")) - col("__mean")))
    val w = Window.partitionBy(col(groupCol))
    val ranked = cal
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__r"))))
      .withColumn("__k",
        least(ceil((col("__n") + 1) * lit(1.0 - alpha)), col("__n")))
    ranked.filter(col("__rk") === col("__k"))
      .select(col(groupCol), col("__n").as("n_cal"),
        col("__k").cast("long").as("k"), round(col("__r"), 6).as("width"))
  }

  /** Leakage-free K-fold target encoding table: for every
    * (category, fold), the m-estimate-smoothed mean of `targetCol`
    * computed from the OTHER folds only —
    *   enc = (S_cat − S_fold + m·prior) / (N_cat − N_fold + m),
    * prior = the out-of-fold-agnostic global mean. The standard way to
    * feed a high-cardinality categorical to a model without the
    * encoding memorizing each row's own label.
    *
    * All sums are exact decimals; each output is one fixed-order
    * division (the prior itself divides once, then joins in as a
    * value). Two hash aggregations to the (category, fold) domain —
    * the encoding TABLE is emitted (join it back to rows at feature
    * time), so nothing row-sized leaves the aggregation. */
  def targetEncoding(df: DataFrame, catCol: String, foldCol: Column,
                     targetCol: String, m: Double = 20.0): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val dec = DecimalType(18, 4)
    val src = df.filter(col(targetCol).isNotNull)
      .select(col(catCol), foldCol.as("__fold"),
        col(targetCol).cast(dec).as("__t"))
    val byFold = src.groupBy(col(catCol), col("__fold"))
      .agg(count(lit(1)).as("__nf"), sum(col("__t")).as("__sf"))
    val byCat = byFold.groupBy(col(catCol))
      .agg(sum(col("__nf")).as("__nc"), sum(col("__sf")).as("__sc"))
    val prior = src.agg(
      (d(sum(col("__t"))) / count(lit(1))).as("__prior"))
    byFold.join(byCat, catCol).crossJoin(broadcast(prior))
      .select(col(catCol), col("__fold").as("fold"),
        (col("__nc") - col("__nf")).cast("long").as("n_oof"),
        round((d(col("__sc")) - d(col("__sf")) + lit(m) * col("__prior"))
          / (d(col("__nc")) - d(col("__nf")) + lit(m)), 6).as("encoded"))
  }

  /** Qini / uplift deciles per stratum: rank rows by a targeting score,
    * cut into `buckets` equal slices, and per slice report the arm-0 −
    * arm-1 conversion-rate lift plus the CUMULATIVE Qini value
    *   Q(d) = S0(≤d) − S1(≤d)·N0(≤d)/N1(≤d)
    * (incremental conversions attributable to treating the top-d
    * slices, control scaled to treatment size) — the standard uplift-
    * model acceptance curve; a useless score gives Q ≈ 0 everywhere.
    *
    * Counts are exact; bucket assignment is integer arithmetic over a
    * TOTAL (score, tie) order; the only float ops are the final
    * per-bucket divisions. One stratum-partitioned window sort (rank)
    * + two hash aggregations; the cumulative window runs on the
    * bucket-domain aggregate. */
  def qiniDeciles(df: DataFrame, groupCols: Seq[String], armCol: String,
                  successCol: String, scoreCol: String, tieCol: String,
                  buckets: Int = 10): DataFrame = {
    val gs = groupCols.map(col)
    def d(c: Column) = c.cast(DoubleType)
    val w = Window.partitionBy(gs: _*)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val wAll = Window.partitionBy(gs: _*)
    val bucketed = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nr", count(lit(1)).over(wAll))
      .withColumn("__b",
        expr(s"CAST(((__rn - 1) * $buckets) DIV __nr AS INT)"))
    val per = bucketed.groupBy(gs :+ col("__b"): _*).agg(
      count(when(col(armCol) === 0, lit(1))).as("n0"),
      sum(when(col(armCol) === 0, col(successCol)).otherwise(0))
        .cast("long").as("s0"),
      count(when(col(armCol) === 1, lit(1))).as("n1"),
      sum(when(col(armCol) === 1, col(successCol)).otherwise(0))
        .cast("long").as("s1"))
    val wCum = Window.partitionBy(gs: _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("__cn0", sum(col("n0")).over(wCum))
      .withColumn("__cs0", sum(col("s0")).over(wCum))
      .withColumn("__cn1", sum(col("n1")).over(wCum))
      .withColumn("__cs1", sum(col("s1")).over(wCum))
      .select(gs ++ Seq(col("__b").as("decile"), col("n0"), col("n1"),
        when(col("n0") > 0 && col("n1") > 0,
          round(d(col("s0")) / col("n0") - d(col("s1")) / col("n1"), 6))
          .as("uplift"),
        when(col("__cn1") > 0,
          round(d(col("__cs0")) -
            d(col("__cs1")) * (d(col("__cn0")) / col("__cn1")), 6))
          .as("qini")): _*)
  }

  /** Wilcoxon signed-rank test per stratum on a PAIRED table (one row
    * per subject with both measurements): ranks |after − before| with
    * midranks, W⁺ = Σ ranks of positive differences,
    * z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48) — the
    * paired companion of [[mannWhitneyU]] (same-subject before/after,
    * where the unpaired test wastes the pairing). Zero differences are
    * dropped (standard practice, symmetric on both engines).
    *
    * Same exactness machinery as mannWhitneyU: DOUBLED midranks stay
    * integral, sums accumulate as DECIMAL(38,0), the tie term rides
    * the same window (each t-tied row contributes t²−1), and the only
    * float ops are the final z formula and [[erfcApprox]] p. */
  def wilcoxonSignedRank(df: DataFrame, groupCols: Seq[String],
                         beforeCol: String, afterCol: String)
      : DataFrame = {
    val gs = groupCols.map(col)
    val dec = DecimalType(38, 0)
    def d(c: Column) = c.cast(DoubleType)
    val diffs = df
      .withColumn("__d", d(col(afterCol)) - d(col(beforeCol)))
      .filter(col("__d") =!= 0.0 && col("__d").isNotNull)
      .withColumn("__ad", abs(col("__d")))
    val w = Window.partitionBy(gs: _*).orderBy(col("__ad"))
    val wTie = Window.partitionBy(gs :+ col("__ad"): _*)
    val ranked = diffs.select(gs ++ Seq(col("__d"),
      (rank().over(w) * 2 + count(lit(1)).over(wTie) - 1).as("__r2"),
      count(lit(1)).over(wTie).as("__tc")): _*)
    val m = ranked.groupBy(gs: _*).agg(
      count(lit(1)).as("n"),
      sum(when(col("__d") > 0, col("__r2")).otherwise(0).cast(dec))
        .as("__wpd"),
      sum((col("__tc") * col("__tc") - 1).cast(dec)).as("__ties"))
    val n = d(col("n"))
    val wPlus = d(col("__wpd")) / 2.0
    val mu = n * (n + 1.0) / 4.0
    val variance = n * (n + 1.0) * (lit(2.0) * n + 1.0) / 24.0 -
      d(col("__ties")) / 48.0
    val z = (wPlus - mu) / sqrt(variance)
    m.select(gs ++ Seq(col("n"), wPlus.as("w_plus"),
      when(variance > 0, round(z, 4)).as("z"),
      when(variance > 0,
        round(erfcApprox(abs(z) / sqrt(lit(2.0))), 6)).as("p_two")): _*)
  }

  /** Cohen's d (and small-sample-corrected Hedges' g) per stratum:
    * the standardized mean difference between the two arms —
    * (m0 − m1) / s_pooled — the effect-size line every test readout
    * (q165's t, q215's z) should ship next to, since significance
    * without magnitude is how dashboards lie. Exact decimal moment
    * sums (the [[welchTwoSample]] discipline); pooled variance uses
    * the equal-variance form by definition. */
  def cohensD(df: DataFrame, groupCols: Seq[String], armCol: String,
              metricCol: String): DataFrame = {
    val gs = groupCols.map(col)
    def d(c: Column) = c.cast(DoubleType)
    val m = col(metricCol).cast(DecimalType(18, 4))
    val a = df.filter(col(metricCol).isNotNull).groupBy(gs: _*).agg(
      count(when(col(armCol) === 0, lit(1))).as("n0"),
      sum(when(col(armCol) === 0, m)).as("__s0"),
      sum(when(col(armCol) === 0, (m * m).cast(DecimalType(38, 8))))
        .as("__q0"),
      count(when(col(armCol) === 1, lit(1))).as("n1"),
      sum(when(col(armCol) === 1, m)).as("__s1"),
      sum(when(col(armCol) === 1, (m * m).cast(DecimalType(38, 8))))
        .as("__q1"))
    def ss(s: String, q: String, nn: String) =
      d(col(q)) - d(col(s)) * d(col(s)) / col(nn)
    val sp = sqrt((ss("__s0", "__q0", "n0") + ss("__s1", "__q1", "n1")) /
      (col("n0") + col("n1") - 2))
    val dEff = (d(col("__s0")) / col("n0") - d(col("__s1")) / col("n1")) / sp
    val g = dEff * (lit(1.0) -
      lit(3.0) / (lit(4.0) * (col("n0") + col("n1")) - 9.0))
    val ok = col("n0") > 1 && col("n1") > 1
    a.select(gs ++ Seq(col("n0"), col("n1"),
      when(ok, round(dEff, 4)).as("cohen_d"),
      when(ok, round(g, 4)).as("hedges_g")): _*)
  }

  /** Mantel–Haenszel pooled odds ratio across strata (the ESTIMATE
    * companion of [[cmhTest]]'s significance):
    * OR_MH = Σ_h(a_h·d_h/n_h) / Σ_h(b_h·c_h/n_h) — the
    * confounder-adjusted effect size a stratified 2×2 sweep reports.
    * Per-stratum terms are division-shaped → 9-rounded → decimal sums;
    * the final ratio divides two exact decimals. */
  def mhOddsRatio(df: DataFrame, strataCols: Seq[String],
                  armCol: String, successCol: String): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val byStratum = df.groupBy(strataCols.map(col): _*).agg(
      sum(when(col(armCol) === 0, col(successCol)).otherwise(0))
        .cast("long").as("a"),
      count(when(col(armCol) === 0, lit(1))).as("n0"),
      sum(when(col(armCol) === 1, col(successCol)).otherwise(0))
        .cast("long").as("c"),
      count(when(col(armCol) === 1, lit(1))).as("n1"))
    val n = d(col("n0")) + d(col("n1"))
    val b = col("n0") - col("a")
    val cc = col("n1") - col("c")
    val terms = byStratum.select(
      round(d(col("a")) * d(cc) / n, 9).cast("decimal(28,9)")
        .as("__num"),
      round(d(b) * d(col("c")) / n, 9).cast("decimal(28,9)")
        .as("__den"))
    terms.agg(count(lit(1)).as("n_strata"),
        sum(col("__num")).as("__ns"), sum(col("__den")).as("__ds"))
      .select(col("n_strata"),
        round(col("__ns"), 6).cast("double").as("num"),
        round(col("__ds"), 6).cast("double").as("den"),
        when(col("__ds") > 0,
          round(col("__ns").cast("double") /
            col("__ds").cast("double"), 4)).as("or_mh"))
  }

  /** McNemar's test per stratum on PAIRED binary outcomes (one row per
    * subject with a before/after 0-1 flag): only the DISCORDANT cells
    * matter — b = #(0→1), c = #(1→0) — and the continuity-corrected
    * statistic is χ²₁ = (|b−c|−1)²/(b+c). The binary companion of
    * [[wilcoxonSignedRank]] (paired metric → signed ranks; paired
    * FLAG → McNemar): "did the same users who didn't convert before
    * start converting after", with each user as their own control.
    *
    * Exactness: b and c are exact longs from one hash aggregation; the
    * statistic is two fixed-order float ops and the two-sided p is
    * P(χ²₁ > x) = erfc(√(x/2)) via [[erfcApprox]] — textually
    * mirrored in the oracle. Strata with b+c = 0 (no discordance)
    * yield NULL statistic/p. Output is stratum-domain-sized; the only
    * shuffle is the count aggregation. */
  def mcNemar(df: DataFrame, groupCols: Seq[String],
              beforeCol: String, afterCol: String): DataFrame = {
    val gs = groupCols.map(col)
    def d(c: Column) = c.cast(DoubleType)
    val m = df.groupBy(gs: _*).agg(
      count(when(col(beforeCol) === 0 && col(afterCol) === 1, lit(1)))
        .as("b"),
      count(when(col(beforeCol) === 1 && col(afterCol) === 0, lit(1)))
        .as("c"),
      count(lit(1)).as("n_pairs"))
    // continuity-corrected; clamp |b−c|−1 at 0 so b=c gives χ²=0, not 1
    val diff = greatest(abs(col("b") - col("c")) - 1, lit(0L))
    val chi = d(diff) * d(diff) / d(col("b") + col("c"))
    m.select(gs ++ Seq(col("n_pairs"), col("b"), col("c"),
      when(col("b") + col("c") > 0, round(chi, 4)).as("chi2"),
      when(col("b") + col("c") > 0,
        round(erfcApprox(sqrt(chi / 2.0)), 6)).as("p_two")): _*)
  }

  /** Cliff's delta per stratum: the nonparametric effect size behind
    * [[mannWhitneyU]]'s significance — δ = P(X₀ > X₁) − P(X₀ < X₁) =
    * 2·U₀/(n₀·n₁) − 1 ∈ [−1, 1], with ties splitting half-and-half via
    * midranks. [[cohensD]] standardizes a MEAN difference (parametric);
    * δ is pure dominance probability, immune to any monotone transform
    * of the metric. Same doubled-midrank machinery as mannWhitneyU, so
    * U₀ is exact in half-units; |δ| is labeled with Romano's
    * conventional thresholds (0.147/0.33/0.474) as literals. */
  def cliffsDelta(df: DataFrame, groupCols: Seq[String], armCol: String,
                  metricCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val dec = DecimalType(38, 0)
    def d(c: Column) = c.cast(DoubleType)
    val w = Window.partitionBy(gs: _*).orderBy(col(metricCol))
    val wTie = Window.partitionBy(gs :+ col(metricCol): _*)
    val ranked = df.filter(col(metricCol).isNotNull)
      .select(gs ++ Seq(col(armCol).as("__arm"),
        (rank().over(w) * 2 + count(lit(1)).over(wTie) - 1)
          .as("__r2")): _*)
    val m = ranked.groupBy(gs: _*).agg(
      count(when(col("__arm") === 0, lit(1))).as("n0"),
      count(when(col("__arm") === 1, lit(1))).as("n1"),
      sum(when(col("__arm") === 0, col("__r2")).cast(dec)).as("__r0d"))
    val u0 = (d(col("__r0d")) - d(col("n0")) * (d(col("n0")) + 1.0)) / 2.0
    val delta = lit(2.0) * u0 / (d(col("n0")) * d(col("n1"))) - 1.0
    val ad = abs(round(delta, 4))
    m.select(gs ++ Seq(col("n0"), col("n1"),
      when(col("n0") > 0 && col("n1") > 0, round(delta, 4)).as("delta"),
      when(col("n0") > 0 && col("n1") > 0,
        when(ad < 0.147, "negligible").when(ad < 0.33, "small")
          .when(ad < 0.474, "medium").otherwise("large"))
        .as("magnitude")): _*)
  }

  /** Nearest-neighbor covariate matching with a caliper (the matching
    * estimator of the causal tier): every treated row (arm = 1) is
    * paired to its nearest control (arm = 0) on `xCol` within
    * `caliper`, WITH replacement — the deterministic variant (greedy
    * without-replacement depends on processing order, which no
    * distributed engine should promise). Output: one row per matched
    * treated unit with its control, the covariate gap, and both
    * outcomes; feed to [[attEstimate]] for the treatment-effect line.
    *
    * Scale shape: SORT-MERGE, not a candidate join — the nearest
    * control of a treated unit is either the closest control at-or-
    * below or at-or-above it in the per-stratum x-order, so matching
    * is two window passes over the unioned point set (O(n log n)),
    * where a banded candidate join pays per-bucket density² and
    * detonates on clumped covariates (measured: 23 s → sub-second at
    * sf0.1 on the exponential-ish value column). Controls are first
    * deduped to the min-id row per EXACT x — lossless, because under
    * the (gap, control-id) argmin only that row can ever win (same
    * side + same gap ⇒ same x). The final pick compares the two
    * sides' (9-rounded gap, control id) lexicographically — a total
    * order, so the match is engine- and partitioning-invariant. */
  def nnMatch(df: DataFrame, groupCols: Seq[String], armCol: String,
              idCol: String, xCol: String, yCol: String,
              caliper: Double): DataFrame = {
    require(caliper > 0, s"caliper must be > 0, got $caliper")
    val gs = groupCols.map(col)
    val pts = df.filter(col(xCol).isNotNull).select(
      gs ++ Seq(col(armCol).as("__arm"), col(idCol).as("__id"),
        col(xCol).cast("double").as("__x"), col(yCol).as("__y")): _*)
    val ctrl = pts.filter(col("__arm") === 0)
      .groupBy(gs :+ col("__x"): _*)
      .agg(min(struct(col("__id"), col("__y"))).as("__c"))
      .select(gs ++ Seq(col("__x"), lit(0).as("__tag"),
        lit(null).cast("long").as("__id"),
        lit(null).cast("double").as("__ty"),
        col("__c.__id").as("__cid"),
        col("__c.__y").cast("double").as("__cy")): _*)
    val treat = pts.filter(col("__arm") === 1)
      .select(gs ++ Seq(col("__x"), lit(1).as("__tag"),
        col("__id"), col("__y").cast("double").as("__ty"),
        lit(null).cast("long").as("__cid"),
        lit(null).cast("double").as("__cy")): _*)
    val unioned = ctrl.unionByName(treat)
    val cpoint = when(col("__tag") === 0,
      struct(col("__x").as("cx"), col("__cid").as("cid"),
        col("__cy").as("cy")))
    def pass(w: org.apache.spark.sql.expressions.WindowSpec) =
      last(cpoint, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val scanned = unioned
      .withColumn("__prev", pass(Window.partitionBy(gs: _*)
        .orderBy(col("__x").asc, col("__tag").asc)))
      .withColumn("__next", pass(Window.partitionBy(gs: _*)
        .orderBy(col("__x").desc, col("__tag").asc)))
      .filter(col("__tag") === 1)
    def gapOf(s: String) = round(abs(col("__x") - col(s"$s.cx")), 9)
    val (gp, gn) = (gapOf("__prev"), gapOf("__next"))
    val pOk = col("__prev").isNotNull && gp <= caliper
    val nOk = col("__next").isNotNull && gn <= caliper
    val useNext = nOk && (!pOk || gn < gp ||
      (gn === gp && col("__next.cid") < col("__prev.cid")))
    scanned.filter(pOk || nOk)
      .select(gs ++ Seq(col("__id").as("treated_id"),
        when(useNext, col("__next.cid")).otherwise(col("__prev.cid"))
          .as("control_id"),
        when(useNext, gn).otherwise(gp).as("gap"),
        col("__ty").as("y_treated"),
        when(useNext, col("__next.cy")).otherwise(col("__prev.cy"))
          .as("y_control")): _*)
  }

  /** ATT from [[nnMatch]] pairs: mean(y_treated − y_control) per
    * stratum, with the matched count and the (treated-side) match rate
    * when `nTreated` is joined in by the caller. Differences are
    * 9-rounded into exact decimal sums. */
  def attEstimate(pairs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val d9 = round(col("y_treated").cast("double") -
      col("y_control").cast("double"), 9).cast(DecimalType(28, 9))
    pairs.groupBy(gs: _*).agg(
      count(lit(1)).as("n_matched"),
      // gap is already 9-rounded → the decimal cast is exact, so the
      // mean is partitioning-invariant (a raw double avg is not)
      round(sum(col("gap").cast(DecimalType(28, 9))).cast("double") /
        count(lit(1)), 6).as("mean_gap"),
      round(sum(d9).cast("double") / count(lit(1)), 6).as("att"))
  }

  /** 2×2 difference-in-differences: (ȳ_T,post − ȳ_T,pre) −
    * (ȳ_C,post − ȳ_C,pre) per stratum, with the large-sample SE from
    * the four cell variances — the pre-trend-adjusted effect estimate
    * when treatment switches on at a known time. `periodCol` is 0
    * (pre) / 1 (post); outcomes are decimal-summed per cell (exact
    * moments, the [[welchTwoSample]] discipline); the DiD and SE are
    * fixed-order float arithmetic over the 8 cell statistics. Strata
    * with any empty or degenerate (n ≤ 1) cell yield NULL. */
  def didEstimate(df: DataFrame, groupCols: Seq[String], armCol: String,
                  periodCol: String, yCol: String): DataFrame = {
    val gs = groupCols.map(col)
    def d(c: Column) = c.cast(DoubleType)
    val m = col(yCol).cast(DecimalType(18, 4))
    def cell(a: Int, p: Int, suf: String) = Seq(
      count(when(col(armCol) === a && col(periodCol) === p, lit(1)))
        .as(s"n$suf"),
      sum(when(col(armCol) === a && col(periodCol) === p, m))
        .as(s"__s$suf"),
      sum(when(col(armCol) === a && col(periodCol) === p,
        (m * m).cast(DecimalType(38, 8)))).as(s"__q$suf"))
    val agg = df.filter(col(yCol).isNotNull).groupBy(gs: _*).agg(
      cell(1, 0, "t0").head,
      (cell(1, 0, "t0").tail ++ cell(1, 1, "t1") ++ cell(0, 0, "c0") ++
        cell(0, 1, "c1")): _*)
    def mean(s: String) = d(col(s"__s$s")) / col(s"n$s")
    def varOverN(s: String) =
      (d(col(s"__q$s")) - d(col(s"__s$s")) * d(col(s"__s$s")) /
        col(s"n$s")) / (col(s"n$s") - 1) / col(s"n$s")
    val did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    val se = sqrt(varOverN("t1") + varOverN("t0") + varOverN("c1") +
      varOverN("c0"))
    val ok = Seq("t0", "t1", "c0", "c1")
      .map(s => col(s"n$s") > 1).reduce(_ && _)
    agg.select(gs ++ Seq(col("nt0"), col("nt1"), col("nc0"), col("nc1"),
      when(ok, round(did, 6)).as("did"),
      when(ok, round(se, 6)).as("se"),
      when(ok, round(did / se, 4)).as("z")): _*)
  }

  /** CUPED variance reduction (Deng et al., WSDM'13): adjust the
    * experiment metric with a PRE-period covariate, y' = y − θ(x − x̄),
    * θ = Cov(x,y)/Var(x) pooled over both arms — the industry-standard
    * sensitivity boost that shrinks metric variance by the squared
    * pre/post correlation without biasing the treatment difference
    * (θ is computed arm-blind). Input: one row per UNIT with metric
    * `yCol`, covariate `xCol`, and `armCol` 0/1. Output per stratum:
    * n0/n1, θ, the raw and CUPED-adjusted treatment differences, and
    * the achieved variance ratio Var(y')/Var(y) = 1 − ρ².
    *
    * Exactness: unit-level x/y are 9-rounded into DECIMAL sums (x, y,
    * xy, x², y²) — one hash aggregation to the stratum domain; θ, the
    * differences, and the ratio are fixed-order float arithmetic over
    * those eight sums. Degenerate strata (an empty arm or zero
    * covariate variance) return the raw difference with NULL θ —
    * CUPED silently degrades to the unadjusted test, never a blow-up. */
  def cupedAdjust(df: DataFrame, groupCols: Seq[String], armCol: String,
                  xCol: String, yCol: String): DataFrame = {
    val gs = groupCols.map(col)
    def d(c: Column) = c.cast(DoubleType)
    val dec = DecimalType(28, 9)
    def d9(c: Column) = round(c.cast(DoubleType), 9).cast(dec)
    val x = col(xCol); val y = col(yCol)
    val a = df.filter(x.isNotNull && y.isNotNull).groupBy(gs: _*).agg(
      count(when(col(armCol) === 0, lit(1))).as("n0"),
      count(when(col(armCol) === 1, lit(1))).as("n1"),
      sum(when(col(armCol) === 0, d9(x))).as("__sx0"),
      sum(when(col(armCol) === 0, d9(y))).as("__sy0"),
      sum(when(col(armCol) === 1, d9(x))).as("__sx1"),
      sum(when(col(armCol) === 1, d9(y))).as("__sy1"),
      sum(d9(x)).as("__sx"), sum(d9(y)).as("__sy"),
      sum(d9(x * y)).as("__sxy"), sum(d9(x * x)).as("__sxx"),
      sum(d9(y * y)).as("__syy"))
    val n = d(col("n0") + col("n1"))
    val sxx = d(col("__sxx")) - d(col("__sx")) * d(col("__sx")) / n
    val syy = d(col("__syy")) - d(col("__sy")) * d(col("__sy")) / n
    val sxy = d(col("__sxy")) - d(col("__sx")) * d(col("__sy")) / n
    val theta = sxy / sxx
    val diffRaw = d(col("__sy1")) / col("n1") - d(col("__sy0")) / col("n0")
    val diffX = d(col("__sx1")) / col("n1") - d(col("__sx0")) / col("n0")
    val diffCuped = diffRaw - theta * diffX
    val varRatio = (syy - sxy * sxy / sxx) / syy
    val ok = col("n0") > 0 && col("n1") > 0 && sxx > 0 && syy > 0
    a.select(gs ++ Seq(col("n0"), col("n1"),
      when(ok, round(theta, 6)).as("theta"),
      when(col("n0") > 0 && col("n1") > 0, round(diffRaw, 6))
        .as("diff_raw"),
      when(ok, round(diffCuped, 6)).as("diff_cuped"),
      when(ok, round(varRatio, 6)).as("var_ratio")): _*)
  }

  /** One-way ANOVA F across the groups of `groupCol`: does the mean of
    * `metricCol` differ across k groups — the k-arm generalization of
    * [[welchTwoSample]] (equal-variance form). Returns ONE row:
    * k, n, df1 = k−1, df2 = n−k, f, and the effect size
    * eta² = SSB/(SSB+SSW).
    *
    * Sum discipline: per-group Σx / Σx² accumulate as exact DECIMAL;
    * each group's between-term x̄ contribution rounds to 9 decimals and
    * decimal-sums (order-free across engines); the grand terms divide
    * exactly once. Two hash aggregations (corpus → group domain →
    * scalar); no windows, no shuffle beyond the group agg. */
  def anovaF(df: DataFrame, groupCol: String, metricCol: String)
      : DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val m = col(metricCol).cast(DecimalType(18, 4))
    val per = df.filter(col(metricCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__ng"), sum(m).as("__sg"),
        sum((m * m).cast(DecimalType(38, 8))).as("__qg"))
    val tot = per.agg(
      count(lit(1)).as("k"),
      sum(col("__ng")).as("n"),
      sum(col("__sg")).as("__s"),
      sum(col("__qg")).as("__q"),
      // Σ_g round(S_g²/n_g, 9): the between-group raw moment, exact
      sum(round(d(col("__sg")) * d(col("__sg")) / col("__ng"), 9)
        .cast(DecimalType(28, 9))).as("__b"))
    val ssb = d(col("__b")) - d(col("__s")) * d(col("__s")) / col("n")
    val ssw = d(col("__q")) - d(col("__b"))
    tot.select(col("k"), col("n").cast("long").as("n"),
      (col("k") - 1).cast("long").as("df1"),
      (col("n") - col("k")).cast("long").as("df2"),
      round((ssb / (col("k") - 1)) / (ssw / (col("n") - col("k"))), 4)
        .as("f"),
      round(ssb / (ssb + ssw), 6).as("eta_sq"))
  }
}
