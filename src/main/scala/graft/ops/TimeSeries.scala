package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completion operators: dense spines, forward fill, and
  * slowly-changing-dimension history — the shapes that turn an event log
  * into an analysis-ready series. All windows declare entity partitioning
  * (state per key is O(1) or O(values-per-hour)); spine expansion is
  * per-row `sequence` + explode, so nothing shuffles until the final
  * key-partitioned join/window, which all share one partitioning.
  */
object TimeSeries {

  /** Coverage gaps: consecutive-observation pairs per key separated by
    * more than `minGapSeconds` — the complement of [[gapFillForwardHourly]]
    * (where did the series go dark, rather than how to fill it). The
    * OMOP observation-period construction is this operator's inverse:
    * eras break exactly at these gaps. One lag window on the key
    * partitioning; gap arithmetic in integer MICROSECONDS end to end
    * (no float seconds), so the threshold compare is exact. */
  def coverageGaps(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, minGapSeconds: Long): DataFrame = {
    require(minGapSeconds >= 0, s"minGapSeconds < 0: $minGapSeconds")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__gap_us",
        unix_micros(col(tsCol)) - unix_micros(col("__prev")))
      .filter(col("__prev").isNotNull &&
        col("__gap_us") > minGapSeconds * 1000000L)
      .select(col(keyCol), col("__prev").as("gap_start"),
        col(tsCol).as("gap_end"),
        expr("__gap_us div 1000000").as("gap_s"))
  }

  /** Hourly spine per key from first to last observation, with the last
    * value in each hour (deterministic: max by (ts, tie)) forward-filled
    * across empty hours. Output: (key, hour, value, is_observed).
    *
    * Rows with a NULL value are NOT observations: they neither claim an
    * hour nor extend the spine. (Letting them claim the hour would make
    * a trailing null-valued row SHADOW a real value observed earlier in
    * the same hour — the window's struct-max picks the latest row — and
    * would void the no-leading-nulls guarantee below.)
    *
    * Scale: the spine explode is linear in output hours; the fill is one
    * window over the same (key)-partitioning the join already needs.
    * Leading nulls cannot occur — the spine starts at the first
    * observed hour. */
  def gapFillForwardHourly(df: DataFrame, keyCol: String, tsCol: String,
                           tieCol: String, valueCol: String): DataFrame = {
    val hour = date_trunc("hour", col(tsCol))
    val observed = df.filter(col(valueCol).isNotNull)
    // deterministic per-hour observation: latest (ts, tie) wins
    val obs = observed
      .groupBy(col(keyCol), hour.as("hour"))
      .agg(max(struct(col(tsCol), col(tieCol), col(valueCol)))
        .getField(valueCol).as("obs_value"))
    val spine = observed
      .groupBy(col(keyCol))
      .agg(min(hour).as("h0"), max(hour).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(obs, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("value"),
        col("obs_value").isNotNull.as("is_observed"))
  }

  /** Hourly spine per key with LINEAR interpolation across unobserved
    * hours — the numeric-series completion step (sensor feeds, metric
    * rollups) where forward-fill's step function biases downstream
    * aggregates. Output: (key, hour, value, is_observed).
    *
    * Per observed hour the deterministic value is the latest (ts, tie)
    * row's; unobserved hours get
    * prev + (next − prev) · elapsed/span, with elapsed/span computed on
    * exact integer hour indices. The spine spans first..last observed
    * hour per key, so both interpolation endpoints always exist.
    *
    * Scale: identical posture to [[gapFillForwardHourly]] — spine
    * explode is linear in output hours; BOTH direction passes (carry
    * prev forward, carry next backward) are windows over the same
    * (key)-partitioning, so the whole completion is one exchange. */
  def interpolateHourly(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, valueCol: String): DataFrame = {
    val hour = date_trunc("hour", col(tsCol))
    val observed = df.filter(col(valueCol).isNotNull)
    val obs = observed
      .groupBy(col(keyCol), hour.as("hour"))
      .agg(max(struct(col(tsCol), col(tieCol), col(valueCol)))
        .getField(valueCol).as("obs_value"))
    val spine = observed
      .groupBy(col(keyCol))
      .agg(min(hour).as("h0"), max(hour).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))
    val wBack = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val hIdx = (unix_micros(col("hour")) / 3600000000L).cast("long")
    val obsIdx = when(col("obs_value").isNotNull, hIdx)
    spine
      .join(obs, Seq(keyCol, "hour"), "left")
      .withColumn("__h", hIdx)
      .withColumn("__pv", last(col("obs_value"), ignoreNulls = true).over(wBack))
      .withColumn("__ph", last(obsIdx, ignoreNulls = true).over(wBack))
      .withColumn("__nv", first(col("obs_value"), ignoreNulls = true).over(wFwd))
      .withColumn("__nh", first(obsIdx, ignoreNulls = true).over(wFwd))
      .select(col(keyCol), col("hour"),
        // deliberately UNROUNDED: the four IEEE ops on identical inputs
        // are bit-identical across engines, while decimal ROUND
        // functions disagree exactly at the .5 ties midpoint
        // interpolation mass-produces (half-up on the decimal string vs
        // round of the scaled binary double)
        when(col("obs_value").isNotNull, col("obs_value"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col("__h") - col("__ph")).cast("double") /
              (col("__nh") - col("__ph")).cast("double"))).as("value"),
        col("obs_value").isNotNull.as("is_observed"))
  }

  /** Exponentially time-decayed sum/count per key — the "recency-
    * weighted activity" score behind freshness ranking and decayed
    * frequency caps. Each event's weight is 0.5^(age-in-whole-weeks at
    * `refTs`); whole-week integer exponents keep the weight an EXACT
    * binary double (2⁻ᵏ), so value·weight is a lossless scaling and the
    * per-term DECIMAL cast makes the aggregate partition-order-
    * independent — the same determinism contract as the engine's other
    * money sums.
    *
    * Mergeability (the 100 TB property): decayed sums with a shared
    * reference time merge by plain addition, and a sum referenced at t₁
    * re-references to t₂ by one multiplication by 0.5^((t₂−t₁)/hl) — so
    * per-shard/per-day partial sums roll up without reprocessing
    * history, the same maintenance shape as [[graft.streaming
    * .EventStreams.mergeRollups]]. */
  def decayedSum(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, refTs: org.apache.spark.sql.Column,
                 halfLifeWeeks: Int = 1): DataFrame = {
    val ageWeeks = ((unix_micros(refTs) - unix_micros(col(tsCol))) /
      (halfLifeWeeks * 604800000000L)).cast("int")
    val w = pow(lit(0.5), ageWeeks)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(w.cast(DecimalType28)).cast("double").as("decayed_n"),
        sum((col(valueCol) * w).cast(DecimalType28)).cast("double")
          .as("decayed_sum"))
  }

  private val DecimalType28 = org.apache.spark.sql.types.DecimalType(28, 10)

  /** Exact decimal EWMA weights for a trailing window of `k`
    * observations: position j (1 = newest) carries α(1−α)^(j−1), except
    * the OLDEST in-window observation, which carries the init mass
    * (1−α)^(m−1) so the truncated recursion y_t = αx_t + (1−α)y_{t−1}
    * with y_1 = x_1 is reproduced exactly over the last m = min(n, k)
    * points. Weights are exact powers of a decimal α (unlimited
    * BigDecimal, then ONE half-up rounding to 18 fractional digits) and
    * are emitted as literal strings — the Spark plan and the DuckDB
    * oracle both consume the same text, so the arithmetic is
    * decimal-exact on both engines with zero float-pow involvement.
    * Returns (baseWeight, initWeight) per position 1..k. */
  def ewmaWeights(alpha: BigDecimal, k: Int): Seq[(String, String)] = {
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    require(k >= 1 && k <= 64, s"window out of [1,64]: $k")
    val one = BigDecimal(1)
    (1 to k).map { j =>
      val decay = (one - alpha).pow(j - 1)
      def s(x: BigDecimal) =
        x.setScale(18, BigDecimal.RoundingMode.HALF_UP)
          .underlying.toPlainString
      (s(alpha * decay), s(decay))
    }
  }

  /** Trailing-window EWMA per key: the last value of the exponentially
    * weighted moving average over each key's final min(n, `k`)
    * observations — the smoothed "current level" readout of a metric
    * stream. One descending window rank per key partition plus one hash
    * aggregate; nothing beyond the key partitioning shuffles, and the
    * window never materializes more than `k` weighted terms per key.
    *
    * Truncating at `k` is what makes the result exact and portable:
    * weights beyond position 16 at α = ¼ are < 1e-4·α and the infinite
    * form would force float `pow` (whose last ulp differs across
    * engines); here every weight is a shared decimal literal
    * ([[ewmaWeights]]) and the sum is exact decimal at any
    * partitioning. */
  def ewmaTrailing(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueCol: String,
                   alpha: BigDecimal = BigDecimal("0.25"),
                   k: Int = 16): DataFrame = {
    val wDesc = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val wAll = Window.partitionBy(col(keyCol))
    val weights = ewmaWeights(alpha, k)
    def caseOf(pick: ((String, String)) => String): Column =
      weights.zipWithIndex.foldLeft(lit(null).cast("decimal(19,18)")) {
        case (acc, (ws, i)) =>
          when(col("__j") === (i + 1),
            lit(new java.math.BigDecimal(pick(ws)))).otherwise(acc)
      }
    df.select(col(keyCol), col(tsCol), col(tieCol),
        col(valueCol).cast("decimal(14,4)").as("__v"))
      .withColumn("__j", row_number().over(wDesc))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__j") <= k)
      .withColumn("__w",
        when(col("__j") === least(col("__n"), lit(k)), caseOf(_._2))
          .otherwise(caseOf(_._1)))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_events"),
        round(sum(col("__v") * col("__w")).cast("double"), 6).as("ewma"))
  }

  /** Time-weighted average per key: each observation's value is weighted
    * by the duration until the NEXT observation (the standard TWAP /
    * time-in-state average — a plain AVG over an irregular series
    * over-weights bursts). The last observation per key carries no
    * duration and is excluded. Durations in exact integer microseconds,
    * values in exact decimal; one lead window on the key partitioning +
    * one hash aggregate. */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.select(col(keyCol), col(tsCol), col(tieCol),
        col(valueCol).cast("decimal(14,4)").as("__v"))
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__dur",
        (lead(col("__us"), 1).over(w) - col("__us")).cast("decimal(18,0)"))
      .filter(col("__dur").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__v") * col("__dur")).as("__svd"),
        sum(col("__dur")).as("__sd"))
      .select(col(keyCol), col("n_segments"),
        when(col("__sd") > 0,
          round(col("__svd").cast("double") / col("__sd").cast("double"), 6))
          .as("twap"))
  }

  /** SCD2 history from an event log: consecutive runs of the same state
    * per key compress to one row with [valid_from, valid_to) bounds;
    * the current state has a NULL valid_to. Deterministic (ts, tie)
    * ordering; both windows share the key partitioning (one exchange). */
  def scd2History(df: DataFrame, keyCol: String, stateCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    // first row per key is always a change; later rows only when the
    // state null-safely differs (a bare __prev IS NULL test would treat
    // every row after a null STATE as a change too)
    val changes = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
      .drop("__rn")
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Kaplan–Meier survival curve over (duration, event) observations —
    * the churn/retention readout that handles CENSORING correctly
    * (a subject still active at the study frontier must not count as a
    * death, only as at-risk time; naive retention curves get this
    * wrong). `durationCol`: non-negative integer durations; `eventCol`:
    * 1 = the terminal event was observed, 0 = censored.
    *
    * Returns one row per distinct EVENT time t: n_risk (subjects with
    * duration ≥ t), n_events (events AT t), and the product-limit
    * estimate S(t) = Π_{t_i ≤ t} (1 − d_i/n_i).
    *
    * Scale shape: one hash aggregation to (duration, d, c) — the
    * DURATION-DOMAIN-sized table — then windows over that aggregate
    * (cumulative at-risk from the tail, log-space running product).
    * The product is exp of a running sum of ROUND(ln(1−d/n), 9) decimal
    * terms (the q98 discipline: per-term rounding makes the sum
    * order-free and oracle-exact); a time where everyone at risk dies
    * (d = n) forces S = 0 from there on, handled explicitly since
    * ln(0) must never evaluate. */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String)
      : DataFrame = {
    val byT = df.groupBy(col(durationCol).as("t"))
      .agg(sum(col(eventCol)).cast("long").as("d"),
        count(lit(1)).as("all_at_t"))
    val wAsc = Window.orderBy(col("t"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT
      // at-risk at t = subjects with duration >= t: suffix sum
      .withColumn("n_risk", sum(col("all_at_t")).over(wDesc))
    val terms = risk.filter(col("d") > 0)
      .withColumn("__lnterm",
        when(col("d") === col("n_risk"), lit(null))
          .otherwise(round(log(lit(1.0) -
            col("d").cast("double") / col("n_risk")), 9)
            .cast("decimal(18,9)")))
      // S = 0 once any prefix factor is 0: track with a running min flag
      .withColumn("__zero",
        max(when(col("d") === col("n_risk"), 1).otherwise(0))
          .over(wAsc.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .withColumn("__lnsum",
        sum(col("__lnterm")).over(wAsc.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
    terms.select(col("t"), col("n_risk"), col("d").as("n_events"),
      when(col("__zero") === 1, lit(0.0))
        .otherwise(round(exp(col("__lnsum").cast("double")), 6))
        .as("survival"))
  }

  /** Nelson–Aalen cumulative hazard (and the Fleming–Harrington
    * survival exp(−H)) — the estimator dual of [[kaplanMeier]]: KM
    * multiplies survival factors, NA sums hazard increments d/n, which
    * is the better-behaved quantity in small risk sets and the one
    * hazard-ratio readouts build on. Same single-aggregation + two
    * window passes over the DURATION DOMAIN as KM (never corpus rows);
    * per-time increments are division-shaped → 9-rounded → exact
    * decimal cumulative sums, so the curve is partitioning-invariant
    * and oracle-exact. Rows at event times only. */
  def nelsonAalen(df: DataFrame, durationCol: String, eventCol: String)
      : DataFrame = {
    val byT = df.groupBy(col(durationCol).as("t"))
      .agg(sum(col(eventCol)).cast("long").as("d"),
        count(lit(1)).as("all_at_t"))
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.withColumn("n_risk", sum(col("all_at_t")).over(wDesc))
      .filter(col("d") > 0)
      .withColumn("__h",
        round(col("d").cast("double") / col("n_risk"), 9)
          .cast("decimal(18,9)"))
      .withColumn("__H", sum(col("__h")).over(wAsc))
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        round(col("__H"), 6).cast("double").as("cum_hazard"),
        round(exp(-col("__H").cast("double")), 6).as("survival"))
  }

  /** Holt linear (double-exponential) smoothing per key: level + trend,
    * the one-parameter-richer sibling of [[ewmaTrailing]] that can
    * FORECAST (ŷ_{t+h} = l_t + h·b_t). Textbook recursion, made exact:
    *   l_t = round9(α·x_t + (1−α)·(l_{t−1} + b_{t−1}))
    *   b_t = round9(β·(l_t − l_{t−1}) + (1−β)·b_{t−1})
    * with α, β decimal literals and every state a DECIMAL(18,9) — the
    * recursion is pure decimal arithmetic, so any engine that follows
    * the same fold (the DuckDB oracle does, via list_reduce) reproduces
    * it bit-for-bit. Init: l₂ = x₂, b₂ = x₂ − x₁ (n = 1 → level x₁,
    * trend 0).
    *
    * SCALE CONTRACT: the per-key series is collected and folded as an
    * array inside one codegen'd `aggregate` higher-order function — the
    * same bounded-series posture as [[ewmaTrailing]]'s window (per-user
    * event runs, not corpus-length sequences). One hash aggregation,
    * key-domain output: key, n, level, trend, forecast (h = `horizon`).
    *
    * The fold's accumulator is an ARRAY of two decimals, not a struct,
    * on BOTH engines: DuckDB 1.0's list_reduce writes struct fields
    * in place, so a struct accumulator lets field 2's expression read
    * field 1's NEW value (verified; the array form evaluates both
    * elements before constructing). */
  def holtLinear(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valueCol: String,
                 alpha: BigDecimal = BigDecimal("0.3"),
                 beta: BigDecimal = BigDecimal("0.1"),
                 horizon: Int = 7): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 9)
    // smoothing constants at scale (10,9): a (18,9)-typed constant would
    // push the (1−α)·(l+b) product past decimal precision 38
    val cdec = org.apache.spark.sql.types.DecimalType(10, 9)
    def d9(c: Column) = round(c, 9).cast(dec)
    val al = lit(alpha.bigDecimal).cast(cdec)
    val be = lit(beta.bigDecimal).cast(cdec)
    val one = lit(java.math.BigDecimal.ONE).cast(cdec)
    val sorted = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol),
        struct(col(tsCol), col(tieCol),
          col(valueCol).cast("decimal(14,4)").cast(dec).as("__v"))
          .as("__s"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col("__s"))).as("__xs"))
      .select(col(keyCol),
        transform(col("__xs"), s => s.getField("__v")).as("__xs"))
    val xs = col("__xs")
    val n = size(xs)
    val x1 = element_at(xs, 1)
    // try_: a 1-element series must not trip ANSI bounds in the (unused
    // for that row) init expression
    val x2 = try_element_at(xs, lit(2))
    val init = array(x2.cast(dec), (x2 - x1).cast(dec))
    val folded = aggregate(
      when(n >= 3, slice(xs, lit(3), n - 2))
        .otherwise(slice(xs, lit(1), lit(0))),
      init,
      (acc, x) => {
        val l = element_at(acc, 1)
        val b = element_at(acc, 2)
        val lNew = d9(al * x + (one - al) * (l + b))
        array(lNew, d9(be * (lNew - l) + (one - be) * b))
      })
    val level = when(n === 1, x1.cast(dec))
      .otherwise(element_at(folded, 1))
    val trend = when(n === 1, lit(java.math.BigDecimal.ZERO).cast(dec))
      .otherwise(element_at(folded, 2))
    sorted.select(col(keyCol), n.cast("long").as("n"),
      round(level, 6).cast("double").as("level"),
      round(trend, 6).cast("double").as("trend"),
      round(level + lit(horizon) * trend, 6).cast("double")
        .as("forecast"))
  }

  /** Seasonal-naive forecast evaluation (MASE) per group over a DAILY
    * mean series: score "this day looks like the same weekday last
    * week" (lag 7) against the naive "like yesterday" scale (lag 1) —
    * MASE < 1 means weekly seasonality beats persistence, the
    * go/no-go check before any fancier forecaster. Row-lags over the
    * day-domain aggregate; only days where BOTH references exist are
    * scored. Per-day absolute errors are division-shaped doubles →
    * round 9 → decimal mean (order-free, oracle-exact). Output:
    * group, n_days, mae_naive, mae_seasonal, mase. */
  def maseEval(df: DataFrame, groupCol: String, dayCol: Column,
               valueCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val daily = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), dayCol.as("__day"))
      .agg((sum(col(valueCol).cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("__m"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__day"))
    val lagged = daily
      .withColumn("__p1", lag(col("__m"), 1).over(w))
      .withColumn("__p7", lag(col("__m"), 7).over(w))
      .filter(col("__p1").isNotNull && col("__p7").isNotNull)
    lagged
      .select(col(groupCol),
        round(abs(col("__m") - col("__p1")), 9).cast("decimal(28,9)")
          .as("__e1"),
        round(abs(col("__m") - col("__p7")), 9).cast("decimal(28,9)")
          .as("__e7"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_days"), sum(col("__e1")).as("__s1"),
        sum(col("__e7")).as("__s7"))
      .select(col(groupCol), col("n_days"),
        round(d(col("__s1")) / col("n_days"), 6).as("mae_naive"),
        round(d(col("__s7")) / col("n_days"), 6).as("mae_seasonal"),
        round((d(col("__s7")) / col("n_days")) /
          (d(col("__s1")) / col("n_days")), 6).as("mase"))
  }

  /** Two-group log-rank test: do the survival curves of `armCol`'s two
    * arms (0/1) differ — the significance companion of [[kaplanMeier]]
    * (which only draws the curves). Same duration/censor input contract.
    *
    * At each distinct event time t with d_t total events, n_t subjects
    * at risk and n0_t of them in arm 0:
    *   E0_t = d_t·n0_t/n_t,
    *   V_t  = (d_t·n0_t/n_t)·(n1_t/n_t)·((n_t−d_t)/(n_t−1)),
    * χ² = (O0 − ΣE0)² / ΣV with O0 = Σd0_t (exact integer). E0/V are
    * division-shaped per-time values, so each rounds to 9 decimals and
    * decimal-sums (order-free, oracle-exact); single-subject times
    * (n_t = 1) contribute zero variance and are excluded from V.
    *
    * Plan: one hash aggregation to the DURATION domain (d0/d1/at-risk
    * counts per t), suffix-sum windows over that aggregate for the two
    * at-risk series, one scalar aggregation. Returns ONE row:
    * n_times, o0, e0, chi2. */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
              armCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val byT = df.groupBy(col(durationCol).as("t"))
      .agg(
        sum(when(col(armCol) === 0, col(eventCol)).otherwise(0))
          .cast("long").as("d0"),
        sum(when(col(armCol) === 1, col(eventCol)).otherwise(0))
          .cast("long").as("d1"),
        count(when(col(armCol) === 0, lit(1))).as("c0"),
        count(when(col(armCol) === 1, lit(1))).as("c1"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT
      .withColumn("n0_risk", sum(col("c0")).over(wDesc))
      .withColumn("n1_risk", sum(col("c1")).over(wDesc))
      .filter(col("d0") + col("d1") > 0)
    val dAll = d(col("d0")) + d(col("d1"))
    val nAll = d(col("n0_risk")) + d(col("n1_risk"))
    val e0 = dAll * d(col("n0_risk")) / nAll
    val v = (dAll * d(col("n0_risk")) / nAll) *
      (d(col("n1_risk")) / nAll) * ((nAll - dAll) / (nAll - lit(1.0)))
    val terms = risk.select(col("d0"),
      round(e0, 9).cast("decimal(28,9)").as("__e0"),
      when(col("n0_risk") + col("n1_risk") > 1, round(v, 9))
        .otherwise(lit(0.0)).cast("decimal(28,9)").as("__v"))
    terms.agg(count(lit(1)).as("n_times"),
        sum(col("d0")).as("o0"), sum(col("__e0")).as("__e0s"),
        sum(col("__v")).as("__vs"))
      .select(col("n_times"), col("o0"),
        // decimal-sourced → round as DECIMAL then cast (rounding-mode
        // parity with the oracle; see q107's lesson)
        round(col("__e0s"), 6).cast("double").as("e0"),
        round((d(col("o0")) - col("__e0s").cast("double")) *
          (d(col("o0")) - col("__e0s").cast("double")) /
          col("__vs").cast("double"), 6).as("chi2"))
  }

  /** Rolling active users — DAU / trailing-N-day AU / stickiness per
    * day, the engagement headline every event log gets asked for. The
    * naive form (per-day COUNT(DISTINCT user) over a sliding range
    * window) re-scans N days of raw events per output day; this one
    * dedups to the (day, user) SLIVER first (≪ events — the only
    * corpus-sized shuffle), then fans each sliver row out to the ≤ N
    * report days it supports and distinct-counts per day — cost
    * N·|day-user|, independent of per-user event volume. Report days
    * are restricted to days with actual activity (the trailing window
    * after the last observed day is a phantom). */
  def rollingActive(df: DataFrame, tsCol: String, userCol: String,
                    windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val du = df.select(to_date(col(tsCol)).as("day"),
      col(userCol).as("__u")).distinct()
    // ONE pass over the sliver: the offset-0 fan-out rows ARE the
    // original (day, user) pairs, so DAU is a conditional distinct in
    // the same aggregate as WAU — a separate dau branch would scan and
    // dedup the corpus twice (caught in plan review)
    du.select(explode(sequence(lit(0), lit(windowDays - 1))).as("__o"),
        col("day"), col("__u"))
      .select(date_add(col("day"), col("__o")).as("day"), col("__u"),
        col("__o"))
      .groupBy(col("day"))
      .agg(countDistinct(when(col("__o") === 0, col("__u"))).as("dau"),
        countDistinct(col("__u")).as("wau"))
      .filter(col("dau") > 0) // the trailing window past the last
      // observed day is a phantom; only days with own activity report
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6)
          .as("stickiness"))
  }

  /** Classical additive seasonal decomposition of a daily series per
    * key: y = trend + seasonal + residual — [[holtLinear]] forecasts
    * the series; this EXPLAINS it (is Monday structurally low, or was
    * that week a real dip?). Trend = centered 7-day moving average
    * (only full windows — the series' 3-day edges get NULL trend, the
    * standard convention); seasonal = mean detrended deviation per
    * day-of-week, so the seasonal row sums to ≈0 by construction;
    * residual = what neither explains.
    *
    * Contract: the daily spine must be DENSE per key (gap-fill first
    * if the log can go dark — [[gapFillForwardHourly]] is the hourly
    * tool); a missing day would silently misalign the rows-window.
    * Exactness: daily mean and trend are division-shaped doubles
    * (fixed op order); deviations are 9-rounded into exact decimal
    * sums before the per-dow mean, so the group aggregation is
    * partitioning-invariant (the window frame itself sums in frame
    * order — deterministic on both engines).
    *
    * Plan: one key-partitioned window pass (the daily agg and the
    * moving average share the key partitioning) + one dow-domain
    * aggregate broadcast back; nothing corpus-sized shuffles twice. */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    val daily = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"),
        (sum(col(valueCol).cast(dec)).cast("double") / count(lit(1)))
          .as("__y"))
    val w7 = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trended = daily.withColumn("__trend",
      when(count(lit(1)).over(w7) === 7,
        sum(round(col("__y"), 9).cast("decimal(28,9)")).over(w7)
          .cast("double") / 7.0))
    val dev = trended.withColumn("__dow", dayofweek(col("day")))
      .withColumn("__dev", col("__y") - col("__trend"))
    val seasonal = dev.filter(col("__dev").isNotNull)
      .groupBy(col(keyCol), col("__dow"))
      .agg((sum(round(col("__dev"), 9).cast("decimal(28,9)"))
        .cast("double") / count(lit(1))).as("__seasonal"))
    dev.join(seasonal, Seq(keyCol, "__dow"), "left")
      .select(col(keyCol), col("day"), col("n"),
        round(col("__y"), 6).as("y"),
        round(col("__trend"), 6).as("trend"),
        round(col("__seasonal"), 6).as("seasonal"),
        round(col("__y") - col("__trend") - col("__seasonal"), 6)
          .as("resid"))
  }
}
