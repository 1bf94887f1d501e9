package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.ops.{ConceptMap, Dedup, DenseId, Eval, Ivm, SafeCast, Sharding, Stats, Sweep, TimeSeries}

/** Relational operator suite over the driver test tables (TESTDATA.md).
  *
  * Each query exercises one row-cluster of SURVEY.md §2's operator inventory
  * and has a DuckDB oracle in [[graft.SparkEntry.oracleSql]]. Aggregates over
  * doubles are rounded in BOTH engines so FP summation order can't flip the
  * hash compare.
  *
  * Scale notes are inline per query: every plan here is shuffle-minimal —
  * small dims broadcast, aggregations partial-agg map-side, filters reach the
  * parquet scan (checked via .explain in RelationalSpec).
  */
object Relational {

  /** Order-independent double sum: per-row cast to DECIMAL(18,4) (bit-exact
    * same value in any engine), exact decimal accumulation (immune to FP
    * summation order across partitions), cast back to double. This is what
    * makes sums hash-match the DuckDB oracle without rounding tricks, and at
    * scale it's a deterministic alternative to plain double sums. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** A1-A4 grouped aggregation (reference's count/min/max/conditional aggs,
    * e.g. enhanced_synthea_to_omop.py:2167-2203). TPC-H Q1 shape: one scan,
    * map-side partial agg, tiny shuffle (|groups| rows per partition). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** J1/J2 star join: fact⋈orders⋈customer⋈nation⋈region with the dims
    * broadcast (maps/lookups in the reference are exactly this shape,
    * enhanced_synthea_to_omop.py:853-854). At 100 TB: lineitem⋈orders is the
    * only real shuffle; customer/nation/region broadcast. */
  def q02RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
             .as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** J3 anti join (reference `NOT IN (subquery)` idempotence guard,
    * enhanced_synthea_to_omop.py:775). left_anti is exact here because the
    * keys are non-null (SURVEY.md §7.4 risk 3). The filter on the right side
    * is pushed below the join build. */
  def q03CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** J5 semi join (reference `IN (subquery)` LOINC restriction,
    * populate_concept_map_v2_batched.sql:155-161). */
  def q04OrdersWithBigLineitem(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir).filter(col("l_quantity") >= 49)
              .select(col("l_orderkey")),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  /** J6/W1 first-row-per-group (Postgres DISTINCT ON,
    * enhanced_synthea_to_omop.py:786-811): latest order per customer,
    * deterministic tiebreak on smallest orderkey. One shuffle on the
    * partition key; no global sort. */
  def q05LatestOrderPerCustomer(s: SparkSession, dir: String): DataFrame =
    Dedup.firstRowPerGroup(
      Tables.orders(s, dir),
      Seq(col("o_custkey")),
      Seq(col("o_orderdate").desc, col("o_orderkey").asc))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))

  /** W2 deterministic dense-id assignment (Postgres sequences,
    * enhanced_synthea_to_omop.py:770-777) via the scalable per-bucket
    * offset path — no single-partition global window at ANY scale:
    * c_custkey is already dense 1..n, so the closed-form monotone bucket
    * ([[DenseId.denseLeadingIdBucket]], the same fast path the ETL's
    * person-leading id assignments ride) replaces even the
    * bounds-sampling pass, and the plan keeps its partitioned window
    * regardless of how small the scale factor is. */
  def q06DenseIdCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val parts = math.min(1024, s.sessionState.conf.numShufflePartitions)
    DenseId.withDenseIdScalable(
      cust, Seq(col("c_custkey")), "person_id",
      bucketBy = Some(DenseId.denseLeadingIdBucket(col("c_custkey"),
        cust.count(), parts)))
  }

  /** U1+A2 union sweep → span per key (observation_period,
    * create_observation_period_v2.sql:10-45): min/max event time per user
    * over a 2-way UNION ALL of per-domain projections. Union is shuffle-free;
    * the groupBy carries one row per (user, map-partition). */
  def q07EventSpanPerUser(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val a = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("start_ts"), col("ts").as("end_ts"))
    val b = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("start_ts"), col("ts").as("end_ts"))
    Sweep.spanPerKey(Sweep.unionSweep(Seq(a, b)), "user_id",
                     "start_ts", "end_ts")
  }

  /** A4/A5 conditional aggregation (`SUM(CASE WHEN …)`, `FILTER (WHERE …)`,
    * enhanced_synthea_to_omop.py:2418-2453). */
  def q08EventTypeStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 100, 1).otherwise(0)).as("n_big"),
        count(when(col("value").isNull, 1)).as("n_null_value"),
        dsum(col("value")).as("sum_value"),
        (dsum(col("value")) / count(col("value"))).as("avg_value"))

  /** P1-P4 regex-guarded safe casts (the typing layer,
    * synthea-typedtables-transformation.sql:33-61): extract the numeric
    * payload out of the props JSON-ish string, guard-cast it, guard-cast a
    * date rendered as string. Pure codegen'd when/rlike/cast — no UDFs. */
  def q09SafeCastProps(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(s, dir)
      .withColumn("k_str", regexp_extract(col("props"), "[0-9]+", 0))
      .withColumn("date_str", date_format(col("ts"), "yyyy-MM-dd"))
    raw.select(
      col("event_id"),
      SafeCast.safeInt(col("k_str")).as("k_int"),
      SafeCast.isNumericString(col("k_str")).as("k_is_numeric"),
      SafeCast.safeDate(col("date_str")).as("event_date"),
      SafeCast.enumCast(col("event_type"),
        Seq("signup", "purchase", "click")).as("event_type_enum"))
  }

  /** P10 CASE code mapping (encounter class → visit concept,
    * transform_visit_occurrence_v2.sql:29-40) + P8 COALESCE-to-0. */
  def q10CaseMapping(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        when(col("event_type") === "purchase", 9201)
          .when(col("event_type") === "signup", 9202)
          .when(col("event_type") === "click", 9203)
          .otherwise(0).as("type_concept_id"))
      .groupBy(col("type_concept_id"))
      .agg(count(lit(1)).as("n"))

  /** W4 top-N (achilles top-concept displays,
    * query_achilles_results.sh:182-226): TakeOrderedAndProject — no global
    * sort materialization. */
  def q11TopUsersByEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           dsum(col("value")).as("total_value"))
      .orderBy(col("n_events").desc, col("user_id").asc)
      .limit(10)

  /** A9 exact percentile distributions (Achilles analysis 211,
    * query_achilles_results.sh:228-230). Exact `percentile` (linear
    * interpolation — same definition as DuckDB quantile_cont) for oracle
    * parity; at 100 TB swap to percentile_approx or t-digest. */
  def q12QuantityPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(min(col("l_quantity")), 4).as("q_min"),
        round(expr("percentile(l_quantity, 0.10)"), 4).as("q_p10"),
        round(expr("percentile(l_quantity, 0.25)"), 4).as("q_p25"),
        round(expr("percentile(l_quantity, 0.50)"), 4).as("q_median"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("q_p75"),
        round(expr("percentile(l_quantity, 0.90)"), 4).as("q_p90"),
        round(max(col("l_quantity")), 4).as("q_max"))

  /** A7 DISTINCT projection (populate_visit_map_v2.sql:9-14). */
  def q13DistinctOrderDims(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_orderpriority")).distinct()

  /** J9/M2 staged update-join concept mapping
    * (etl_pipeline/etl_concept_mapping.py:136-180): two literal lookup
    * stages applied in order, unmapped → 0. Stage lookups broadcast. */
  def q14StagedMapping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stage1 = Seq(("purchase", 100L), ("refund", 101L))
      .toDF("event_type", "concept_id")
    val stage2 = Seq(("signup", 200L), ("error", 201L))
      .toDF("event_type", "concept_id")
    ConceptMap.stagedMapping(
      Tables.events(s, dir).select(col("event_id"), col("event_type")),
      Seq((stage1, Seq("event_type"), "concept_id"),
          (stage2, Seq("event_type"), "concept_id")),
      "mapped_concept_id")
      .groupBy(col("event_type"), col("mapped_concept_id"))
      .agg(count(lit(1)).as("n"))
  }

  /** J10 orphan / referential-integrity check
    * (etl_pipeline/etl_validation.py:236-246): child keys missing from the
    * parent, per child table, stacked U2-style into one report. */
  def q15OrphanReport(s: SparkSession, dir: String): DataFrame = {
    val orphanLi = Tables.lineitem(s, dir).select(col("l_orderkey").as("k"))
      .join(Tables.orders(s, dir).select(col("o_orderkey").as("k")),
            Seq("k"), "left_anti").count()
    val orphanOrd = Tables.orders(s, dir).select(col("o_custkey").as("k"))
      .join(Tables.customer(s, dir).select(col("c_custkey").as("k")),
            Seq("k"), "left_anti").count()
    import s.implicits._
    Seq(("lineitem_orphans", orphanLi), ("orders_orphans", orphanOrd))
      .toDF("check_name", "orphan_count")
  }

  /** M5 measurement/observation two-phase split
    * (transfer_non_numeric_to_observation.sql:51-120): route rows by the
    * numeric-string detector into two branches off one parent DF — pure
    * filtered projections, no mutation — then stack branch counts. */
  def q16NumericSplit(s: SparkSession, dir: String): DataFrame = {
    val parent = Tables.events(s, dir)
      .withColumn("payload",
        when(col("event_type") === "purchase", col("value").cast(StringType))
          .otherwise(concat(lit("code-"), col("event_type"))))
    val isNum = SafeCast.isSignedNumericString(col("payload"))
    val meas = parent.filter(isNum)
      .select(lit("measurement").as("branch"), col("event_id"))
    val obs = parent.filter(!isNum)
      .select(lit("observation").as("branch"), col("event_id"))
    meas.unionByName(obs).groupBy(col("branch"))
      .agg(count(lit(1)).as("n"))
  }

  /** P7 date arithmetic (reference: +30 days default med end,
    * enhanced_synthea_to_omop.py:1236-1238; +1 year −1 day payer period,
    * synthea-omop-ETL.sql:550) + P5 date-part extraction. */
  def q18DateArithmetic(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_orderdate").cast("date").as("order_date"),
      date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
      date_sub(add_months(col("o_orderdate").cast("date"), 12), 1)
        .as("coverage_end"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      dayofmonth(col("o_orderdate")).as("order_day"))

  /** P12/P13/P14 string scalar functions (composite source values,
    * synthea-omop-ETL.sql:158; SUBSTRING truncation,
    * transform_measurement_and_observation.sql:54; ROUND). */
  def q19StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      concat(col("p_brand"), lit(": "), col("p_type")).as("brand_type"),
      substring(col("p_name"), 1, 12).as("name_trunc"),
      round(col("p_retailprice") * 1.1, 2).as("marked_up"),
      lower(col("p_type")).contains("brass").as("is_brass"))

  /** W3 keyset pagination (ORDER BY id LIMIT batch OFFSET n,
    * transfer_population_to_staging.sql:140-142) — expressed as a
    * row_number filter; at scale, keyset predicates (id > last) replace
    * OFFSET entirely. */
  def q42Pagination(s: SparkSession, dir: String): DataFrame =
    Dedup.firstRowPerGroupN(
      Tables.orders(s, dir), Seq(lit(1)), Seq(col("o_orderkey").asc), 150)
      .filter(col("__rn") > 100)
      .select(col("o_orderkey"), col("o_custkey"),
        col("__rn").cast("long").as("row_pos"))

  /** Beyond the reference: ROLLUP hierarchical aggregation (the
    * Achilles-style report shape generalized; Catalyst expands grouping
    * sets in one pass). */
  def q43Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))

  /** CUBE over two dimensions — all four grouping combinations in one
    * pass (Catalyst expands the grouping sets; each row is aggregated
    * once per set, map-side combinable). */
  def q49Cube(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("day", dayofweek(col("ts")))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day").cast("string"), lit("ALL")).as("day"),
        col("n"), col("total"))

  /** A7+ exact distinct counts across several columns in one pass. */
  def q44DistinctCounts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))

  /** Beyond the reference: general window analytics (rank/lag/running
    * aggregates) — the per-entity sequence analysis a complete engine
    * owes its users. One shuffle on the partition key; running sums use
    * the exact-decimal pattern so frame accumulation is order-exact. */
  def q46WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("ts"), col("value"),
      row_number().over(w).as("seq"),
      rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))).as("value_rank"),
      (unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(w))).as("micros_since_prev"),
      sum(col("value").cast("decimal(18,4)"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0))
        .cast("double").as("running_value"))
  }

  /** §2.6 completion beyond the reference: INTERSECT / EXCEPT between two
    * per-type user sets (the reference emulates except-semantics with
    * anti joins; these are the declarative forms). */
  def q47SetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"))
    val both = users("purchase").intersect(users("error"))
      .agg(count(lit(1)).as("n")).select(lit("purchase_and_error").as("set_op"),
        col("n"))
    val only = users("purchase").except(users("error"))
      .agg(count(lit(1)).as("n")).select(lit("purchase_not_error").as("set_op"),
        col("n"))
    both.unionByName(only)
  }

  /** As-of join (the canonical event-stream operator Spark lacks
    * natively; composed via [[graft.ops.AsOf]] — one shuffle+sort): for
    * every purchase, the latest signup at or before it per user. */
  def q48AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_event_id"), col("user_id"),
        col("ts"))
    graft.ops.AsOf.asofJoin(purchases, signups, "user_id", "ts",
        Seq("signup_event_id"))
      .select(col("event_id"), col("user_id"),
        col("asof_signup_event_id").as("signup_event_id"),
        col("asof_ts"))
  }

  /** J7/J8 two-hop "Maps to" vocabulary traversal
    * (etl_pipeline/etl_concept_mapping.py:153-165), emulated on the star
    * schema: customer --(nation as relationship)--> region as the standard
    * target; counts per hop target. Same join topology: big⋈small⋈small. */
  def q17TwoHopTraversal(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(countDistinct(col("n_nationkey")).as("n_nations"),
           count(lit(1)).as("n_customers"))

  /** Era building (OMOP drug_era/condition_era semantics — gap-tolerant
    * interval merge the reference's observation-period min/max sweep
    * approximates, create_observation_period_v2.sql:46-55): per supplier,
    * coalesce 7-day shipping windows into busy eras via
    * [[graft.ops.Intervals.mergeIntervals]] — one shuffle on the key,
    * gaps-and-islands window, no self-join. */
  def q52IntervalMerge(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.lineitem(s, dir).select(
      col("l_suppkey"), col("l_shipdate").as("s"),
      (col("l_shipdate") + expr("INTERVAL 7 DAYS")).as("e"))
    graft.ops.Intervals.mergeIntervals(iv, Seq(col("l_suppkey")),
        col("s"), col("e"), expr("INTERVAL 0 SECONDS"))
      .select(col("l_suppkey"), col("era_start"), col("era_end"),
        col("n_merged"))
  }

  /** Banded range join (the general form of the as-of join family): for
    * each error event, how many clicks by the same user within ±2 h.
    * [[graft.ops.Intervals.bandedRangeJoin]] plans an equi hash join on
    * (user, time-band) + exact µs filter — NOT the O(n²) nested-loop a
    * raw range predicate gets. */
  def q53RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    graft.ops.Intervals.bandedRangeJoin(errors, clicks, Seq("user_id"),
        "err_ts", "click_ts", -7200, 7200)
      .groupBy(col("err_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"))
  }

  /** Bloom-pruned selective semi join ([[graft.ops.Sketches.bloomPrune]]):
    * the fact side is filtered by a bloom over the dim keys BEFORE its
    * shuffle. The bloom admits false positives only, and the residual
    * semi join removes those, so the result is bit-identical to the plain
    * semi join the oracle runs — the sketch changes shuffle I/O, never
    * the answer. That identity is exactly what this gate proves. */
  def q59BloomPrunedSemi(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = graft.ops.Sketches.bloomPrune(
      Tables.lineitem(s, dir), col("l_orderkey"), urgent,
      expectedDim = 200000L)
    pruned.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"))
  }

  /** Salted skew join ([[graft.ops.Skew.saltedJoin]]): each order key is
    * spread over 4 reducers via a deterministic salt on the lineitem
    * side while orders explode 4×. Salting redistributes the SHUFFLE —
    * the join output is row-identical to the plain join the oracle runs,
    * which is exactly what this gate proves (like q59 for bloom prune). */
  def q63SaltedJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedJoin(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber")),
        Tables.orders(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        "l_orderkey", discriminator = col("l_linenumber"), factor = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"))

  /** Burst debounce: drop events that follow the PREVIOUS event of the
    * same (user, type) within 60 s — the lag-based adjacent throttle
    * (telemetry/duplicate-click cleanup). One shuffle on the partition
    * key; deterministic tiebreak on event_id for equal timestamps. (A
    * keep-chain debounce — measure from the last KEPT event — is
    * sequential state, [[graft.streaming.EventStreams.dedupStream]]'s
    * territory; this is the declarative batch form.) */
  /** Trailing-hour per-user window over a RANGE frame keyed on integer
    * epoch-micros — a genuinely different frame than q46's ROWS frames:
    * the boundary is a value offset, so ties and gaps behave like the
    * stream-processing "last hour" semantics. Integer frame bounds keep
    * both engines bit-identical (no interval/float drift). */
  def q76TrailingWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L) // trailing hour in µs, inclusive
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("value").cast("decimal(18,4)")).over(w)
          .cast("double").as("sum_trailing"))
  }

  /** Full outer join of two per-user aggregates (purchases vs errors) —
    * the one join shape the reference never uses; rows survive from
    * either side with zero-defaulted counts. */
  def q77FullOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
    val e = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_errors"))
    p.join(e, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"))
  }

  /** Pivot (long→wide): per-user event-type counts as columns. The value
    * list is explicit — with it, Spark plans ONE pass (no values-discovery
    * job) and the output schema is static, which is the only pivot shape
    * that scales: discovery-pivot over high-cardinality keys is a driver
    * OOM by design. Absent cells → 0. */
  def q78Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** Unpivot (wide→long, the reference's measurement/observation column
    * re-mapping shape M5 generalized): three lineitem measures melt into
    * (measure, value) rows — pure per-row Expand, no shuffle until the
    * summarizing aggregate. */
  def q79Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))

  /** Distribution-rank window functions (percent_rank / cume_dist /
    * ntile) — the remaining window family q46 doesn't cover. Deterministic
    * (value, event_id) order; ranks are pure integer-ratio doubles, so
    * both engines agree bit-for-bit. */
  def q80RankFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"),
      ntile(4).over(w).as("quartile"))
  }

  /** Exact moments per group from decimal power sums: Σv and Σv² are
    * summed as decimals (order-independent — the parallel-sum property
    * plain double aggregation lacks), then mean/variance/stddev derive in
    * one final double step per GROUP, so the result is identical on any
    * partitioning and any engine. The built-in stddev/var aggregates are
    * streaming-double and would hash-flake; this is the scale-safe way to
    * get exact second moments. */
  def q81Moments(s: SparkSession, dir: String): DataFrame = {
    val d = col("value").cast("decimal(18,4)")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(d).cast("double").as("s"),
        sum(d * d).cast("double").as("ss"))
      .select(col("event_type"), col("n"),
        round(col("s") / col("n"), 6).as("mean"),
        round((col("ss") - col("s") * col("s") / col("n")) / col("n"), 6)
          .as("variance"),
        round(sqrt((col("ss") - col("s") * col("s") / col("n")) / col("n")), 6)
          .as("stddev"))
  }

  /** Ordered string aggregation: sorted-distinct statuses per priority as
    * one delimited string (the GROUP_CONCAT / string_agg shape). Set
    * semantics + explicit sort keep it deterministic under parallelism. */
  def q82StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
        .as("statuses"),
        count(lit(1)).as("n"))

  /** JSON extraction from the semi-structured props column (the dynamic-
    * schema corner of the reference's data model, §1.3): path-extract a
    * field, type it, aggregate. get_json_object is codegen'd — no UDF,
    * no full-document parse into a map. */
  def q83Json(s: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(k).as("n_with_k"),
        sum(k).as("sum_k"),
        max(k).as("max_k"))
  }

  /** Hourly gap-fill with forward fill ([[TimeSeries
    * .gapFillForwardHourly]]): dense per-user spine, deterministic
    * per-hour pick, carry-forward across empty hours — the event-log →
    * analysis-series transform. */
  def q86GapFill(s: SparkSession, dir: String): DataFrame =
    TimeSeries.gapFillForwardHourly(Tables.events(s, dir),
      "user_id", "ts", "event_id", "value")

  /** SCD2 state history ([[TimeSeries.scd2History]]): consecutive
    * same-state runs compress to [valid_from, valid_to) rows, NULL
    * valid_to = current — the functional re-expression of the
    * reference's UPDATE-maintained history tables (M2). */
  def q87Scd2(s: SparkSession, dir: String): DataFrame =
    TimeSeries.scd2History(Tables.events(s, dir),
      "user_id", "event_type", "ts", "event_id")

  /** Dense day×type activity matrix: spine cross join + left join +
    * zero-default — the densification pattern over a sparse aggregate
    * (absent (day, type) cells must exist with n=0). */
  def q88ZeroFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val days = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.groupBy(date_trunc("day", col("ts")).as("day"),
      col("event_type")).agg(count(lit(1)).as("n"))
    days.crossJoin(types)
      .join(counts, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Z-score outlier detection per group, built on q81's exact-moment
    * machinery: mean/std derive from order-independent decimal power
    * sums, broadcast back onto the rows (the stats side is
    * groups-sized), flag |z| > 3. The filter-stage of a quality
    * pipeline — at scale this is one aggregate + one broadcast join, the
    * corpus streams through once. */
  def q90Outliers(s: SparkSession, dir: String): DataFrame = {
    val d = col("value").cast("decimal(18,4)")
    val stats = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(d).cast("double").as("s"),
        sum(d * d).cast("double").as("ss"))
      .select(col("event_type"),
        (col("s") / col("n")).as("mean"),
        sqrt((col("ss") - col("s") * col("s") / col("n")) / col("n"))
          .as("std"))
    val z = abs(col("value") - col("mean")) / col("std")
    Tables.events(s, dir)
      .join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        count(when(z > 3, 1)).as("n_outliers"),
        round(max(z), 6).as("max_abs_z"))
  }

  /** Winsorization: clamp a measure into its per-group [p05, p95] band
    * (exact interpolated percentiles — bit-identical across engines on
    * the same doubles), report the clamp counts and the exact clamped
    * sum. The tail-taming step before averaging heavy-tailed metrics. */
  def q91Winsorize(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.05)").as("p05"),
        expr("percentile(l_quantity, 0.95)").as("p95"))
    val clamped = least(greatest(col("l_quantity"), col("p05")), col("p95"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(col("l_quantity") < col("p05"), 1)).as("n_lo"),
        count(when(col("l_quantity") > col("p95"), 1)).as("n_hi"),
        sum(clamped.cast("decimal(18,4)")).cast("double")
          .as("winsorized_sum"))
  }

  /** Deterministic train/val/test split (80/10/10) from the corpus
    * sample hash — membership is a pure function of (doc_id, seed), so
    * the split is reproducible forever and consistent across any
    * partitioning (the property a training pipeline cannot live
    * without). Reported as per-split counts + char volume. */
  def q92Split(s: SparkSession, dir: String): DataFrame = {
    val h = graft.ops.Sampling.sampleHash(col("doc_id"), seed = 7)
    Tables.documents(s, dir)
      .withColumn("split",
        when(h < 800000, "train").when(h < 900000, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** regexp_extract_all → explode (one row per match): the generator
    * form of the P1/P3 regex family — pull every numeric token out of
    * the semi-structured props payload and aggregate the stream. */
  def q93ExtractAll(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        explode(expr("regexp_extract_all(props, '[0-9]+', 0)")).as("num"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_matches"),
        sum(col("num").cast("long")).as("sum_nums"),
        countDistinct(col("num")).as("n_distinct"))

  /** UNION (distinct) — completes the §2.6 set-op family next to q47's
    * INTERSECT/EXCEPT: one distinct-aggregate over the concatenation,
    * not a join. */
  def q89UnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase").select(col("user_id"))
    val e = ev.filter(col("event_type") === "error").select(col("user_id"))
    p.union(e).distinct()
      .agg(count(lit(1)).as("n_union_users"))
  }

  /** Cross join of two tiny dimensions (the densification shape: every
    * region × every order status, e.g. to left-join sparse aggregates
    * into a dense matrix). Both sides are small scans → Spark plans a
    * broadcast nested-loop; a cross join is only ever safe when one side
    * is broadcast-sized, which this demonstrates. */
  def q84Cross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select(col("r_name"))
      .crossJoin(Tables.orders(s, dir).select(col("o_orderstatus")).distinct())

  /** Deterministic arg-min/arg-max per group via struct ordering:
    * min/max of (value, event_id) structs compare lexicographically, so
    * ties on value resolve by event_id — unlike bare min_by/arg_min,
    * which pick an arbitrary row under parallel merge. One hash
    * aggregate; the shuffle carries two structs per group. */
  def q85ArgExtremes(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      // NULL values carry no arg-extreme information AND order
      // differently across engines (Spark sorts null struct fields
      // FIRST, DuckDB LAST — min would diverge the moment the data
      // contains one); excluded identically in the oracle
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(min(struct(col("value"), col("event_id"))).as("mn"),
        max(struct(col("value"), col("event_id"))).as("mx"))
      .select(col("event_type"),
        col("mn.value").as("lo_value"), col("mn.event_id").as("lo_event"),
        col("mx.value").as("hi_value"), col("mx.event_id").as("hi_event"))

  /** Fixed-width price histogram ([[Stats.histogram]]): one hash
    * aggregate over ≤21 bins — the shuffle is O(nbins), independent of
    * data size, so the same plan profiles a 100 TB column. Bin math is
    * pure IEEE arithmetic the oracle reproduces bit-for-bit. */
  def q74Histogram(s: SparkSession, dir: String): DataFrame =
    Stats.histogram(Tables.lineitem(s, dir), col("l_extendedprice"),
      lo = 900.0, hi = 105900.0, nbins = 21)

  def q67Debounce(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNull ||
        col("ts").cast("long") - col("prev_ts").cast("long") > 60)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
  }

  /** Hierarchy rollup through [[graft.etl.Vocab.rollupByAncestor]] — the
    * OMOP concept_ancestor join shape (drug → ATC class), oracle-gated by
    * casting TPC-H's region⊃nation as the class tier: ancestor rows
    * (region+1000, nation) + self rows, class-tier concepts = regions,
    * facts = customers keyed by nation. The hierarchy slice broadcasts;
    * the fact table's only shuffle is the class-count agg. */
  def q97AncestorRollup(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(s, dir)
    val region = Tables.region(s, dir)
    val ancestor = nation.select(
        (col("n_regionkey") + 1000L).as("ancestor_concept_id"),
        col("n_nationkey").cast("long").as("descendant_concept_id"))
      .unionByName(nation.select(
        col("n_nationkey").cast("long").as("ancestor_concept_id"),
        col("n_nationkey").cast("long").as("descendant_concept_id")))
    val concept = region.select(
        (col("r_regionkey") + 1000L).as("concept_id"),
        col("r_name").as("concept_name"),
        lit("Region").as("concept_class_id"))
      .unionByName(nation.select(
        col("n_nationkey").cast("long").as("concept_id"),
        col("n_name").as("concept_name"),
        lit("Nation").as("concept_class_id")))
    val facts = Tables.customer(s, dir).select(
      col("c_custkey").as("person_id"),
      col("c_nationkey").cast("long").as("nation_concept_id"))
    graft.etl.Vocab.rollupByAncestor(facts, "nation_concept_id",
      ancestor, concept, "Region")
  }

  /** Ordered conversion funnel signup → click → purchase: per user, the
    * first signup, the first click strictly AFTER it, the first purchase
    * strictly after that — per-stage converted-user counts and rates.
    * Stage-wise conditional-min aggregation (each stage scans one
    * event-type sliver, aggregates map-side to per-user minima, and
    * joins user-keyed on a monotonically SHRINKING stage table —
    * broadcast-able as the funnel narrows), never a per-user event-list
    * collect or a global sort. */
  def q119Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def stageMin(tpe: String) =
      ev.filter(col("event_type") === tpe)
    val t1 = stageMin("signup").groupBy(col("user_id"))
      .agg(min(col("ts")).as("ts1"))
    val t2 = stageMin("click").join(t1, "user_id")
      .filter(col("ts") > col("ts1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts2"))
    val t3 = stageMin("purchase").join(t2, "user_id")
      .filter(col("ts") > col("ts2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts3"))
    val n1 = t1.agg(count(lit(1)).as("n_users"))
    val stages = n1.withColumn("stage", lit(1))
      .withColumn("step", lit("signup"))
      .unionByName(t2.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(2)).withColumn("step", lit("click")))
      .unionByName(t3.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(3)).withColumn("step", lit("purchase")))
    stages.crossJoin(broadcast(n1.select(col("n_users").as("base"))))
      .select(col("stage"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("base"), 6)
          .as("conv_rate"))
  }

  /** Retention cohort matrix: cohort = the user's first active epoch week
    * (calendar-free `sec div 604800` — identical integer arithmetic in
    * both engines), cell = distinct users of that cohort active at each
    * week offset, plus the retention rate against the cohort base.
    * Per-user min is one map-side-combinable aggregate; the activity
    * join is user-keyed; the matrix is weeks²-bounded (schema-sized). */
  def q120Retention(s: SparkSession, dir: String): DataFrame = {
    val wk = expr("cast(ts as long) div 604800").cast("int")
    val ev = Tables.events(s, dir).select(col("user_id"), wk.as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val cells = ev.join(first, "user_id")
      .select(col("user_id"), col("cw"), (col("wk") - col("cw")).as("off"))
      .distinct()
      .groupBy(col("cw"), col("off"))
      .agg(count(lit(1)).as("n_users"))
    val base = cells.filter(col("off") === 0)
      .select(col("cw"), col("n_users").as("base"))
    cells.join(broadcast(base), "cw")
      .select(col("cw").as("cohort_week"), col("off").as("week_offset"),
        col("n_users"),
        round(col("n_users").cast("double") / col("base"), 6)
          .as("retention"))
  }

  /** Explicit GROUPING SETS (the general form behind q43's ROLLUP and
    * q49's CUBE): chosen aggregation levels only, one pass — Spark plans
    * a single Expand + hash aggregate, not one scan per level. */
  def q62GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))

  /** K-anonymity risk audit ([[graft.ops.Privacy.anonymityAudit]]) over
    * a quasi-identifier projection of the event stream: equivalence-
    * class-size histogram (capped at 10) — how many (type, day,
    * value-bucket) combinations are shared by so few rows that they
    * re-identify. The release-gating read before
    * [[graft.ops.Privacy.kAnonymize]] suppresses. */
  def q135KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val qi = graft.core.Tables.events(s, dir)
      .select(col("event_type"),
        date_trunc("day", col("ts")).as("day"),
        floor(col("value") / 100).cast("long").as("vbucket"))
    graft.ops.Privacy.anonymityAudit(qi,
      Seq("event_type", "day", "vbucket"), cap = 10)
  }

  /** Coverage gaps ([[graft.ops.TimeSeries.coverageGaps]]): per-user
    * dark periods longer than 6 h between consecutive events — the
    * era-break detector (OMOP observation periods split exactly at
    * these). Integer-microsecond arithmetic end to end. */
  def q140CoverageGaps(s: SparkSession, dir: String): DataFrame =
    graft.ops.TimeSeries.coverageGaps(graft.core.Tables.events(s, dir),
        "user_id", "ts", "event_id", minGapSeconds = 21600L)
      .select(col("user_id"), col("gap_start"), col("gap_end"),
        col("gap_s"))

  /** Incremental rollup maintenance
    * ([[graft.streaming.EventStreams.mergeRollups]]): two half-month
    * rollups merged — gated against the full recompute (the q40 oracle),
    * proving partial-aggregate maintenance is exact, not approximate. */
  def q147IncrementalRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(s, dir)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    graft.streaming.EventStreams.mergeRollups(Seq(
      graft.streaming.EventStreams.hourlyRollup(ev.filter(col("ts") < cut)),
      graft.streaming.EventStreams.hourlyRollup(
        ev.filter(col("ts") >= cut))))
  }

  /** Z-order layout keys ([[graft.functions.InterleaveBits]], native
    * codegen expression `zorder2`): Morton-interleave the two join/filter
    * dimensions of lineitem into one clustering key, plus the file-bucket
    * a z-range writer would route each row to. Sorting the table by
    * `zval` before the parquet sink gives min/max pruning on BOTH
    * l_orderkey and l_partkey at once — the multi-dimensional layout
    * optimization a single-column sort cannot provide. Pure per-row bit
    * math, zero shuffle; the expression stays inside whole-stage
    * codegen. */
  def q149ZorderKey(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        call_function("zorder2",
          pmod(col("l_orderkey"), lit(65536)).cast("long"),
          pmod(col("l_partkey"), lit(65536)).cast("long")).as("zval"))
      .withColumn("zbucket", shiftright(col("zval"), 24))

  /** Blocked fuzzy self-join ([[graft.ops.FuzzyJoin.nearNames]]): part
    * names within Levenshtein distance 2, blocked on the name's last
    * token + length band — the record-linkage primitive, O(block²) not
    * O(n²). The oracle replicates the declared blocking contract (same
    * last token) with a plain dominance join. */
  def q150FuzzyNames(s: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin.nearNames(
      Tables.part(s, dir).select(col("p_partkey"), col("p_name")),
      "p_partkey", "p_name", maxDist = 2)

  /** 2-D skyline ([[graft.ops.Stats.skyline2d]]): per p_type Pareto
    * frontier of parts — no other part of the same type is both cheaper
    * (p_retailprice) and larger (p_size). Sort-scan over distinct cost
    * points vs the oracle's O(n²) NOT EXISTS dominance formulation. */
  def q151Skyline(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.skyline2d(
      Tables.part(s, dir).select(col("p_partkey"), col("p_type"),
        col("p_retailprice"), col("p_size")),
      "p_type", "p_retailprice", "p_size")

  /** Join-view incremental maintenance ([[graft.ops.Ivm.joinDelta]]):
    * the revenue-per-priority join view is maintained under an
    * orders-delta AND a lineitem-delta at once; the query aggregates
    * exactly the NEW join rows. Oracle = full-recompute aggregate minus
    * base aggregate — the algebraic ground truth the delta must equal,
    * bag-exactly. Both delta joins are |Δ|-driven (broadcastable). */
  def q152JoinDelta(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val items = Tables.lineitem(s, dir)
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val cutO = lit("2000-01-01").cast(TimestampType)
    val cutL = lit("2000-06-01").cast(TimestampType)
    graft.ops.Ivm.joinDelta(
        orders.filter(col("o_orderdate") < cutO),
        orders.filter(col("o_orderdate") >= cutO),
        items.filter(col("l_shipdate") < cutL),
        items.filter(col("l_shipdate") >= cutL),
        Seq("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_new"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_new"))
  }

  /** Linear gap interpolation
    * ([[graft.ops.TimeSeries.interpolateHourly]]): per-user hourly
    * series with unobserved hours linearly interpolated between the
    * surrounding observations — the numeric completion q86's forward
    * fill approximates with a step function. */
  def q153Interpolate(s: SparkSession, dir: String): DataFrame =
    graft.ops.TimeSeries.interpolateHourly(
      graft.core.Tables.events(s, dir), "user_id", "ts", "event_id",
      "value")

  /** Bitmap-index exact distinct ([[graft.ops.Sketches.bitmapDistinct]]):
    * distinct users per event type via 64-key bucket bitmasks — the
    * first shuffle carries one long per (type, bucket) instead of every
    * key, and the masks merge across shards by bit_or (exact incremental
    * distinct maintenance). */
  def q154BitmapDistinct(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.bitmapDistinct(
      graft.core.Tables.events(s, dir), "event_type", "user_id")

  /** Exact equi-depth histogram ([[graft.ops.Stats.equiDepthHistogram]]):
    * 8 NTILE buckets over l_extendedprice with bounds — global ranks
    * from the range-partitioned dense-id path, never a single-partition
    * window. */
  def q155EquidepthHist(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.equiDepthHistogram(
      Tables.lineitem(s, dir)
        .select(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber")),
      "l_extendedprice", Seq("l_orderkey", "l_linenumber"), k = 8)

  /** Exponentially decayed activity ([[graft.ops.TimeSeries.decayedSum]]):
    * per-type event mass weighted by 0.5^(age-in-weeks) at the stream's
    * frontier — whole-week exponents keep every weight an exact binary
    * double, and decimal term accumulation keeps the sums partition-
    * order-independent. */
  def q156DecayedSum(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(s, dir)
    // stream frontier as the reference instant — one driver scalar
    val ref = ev.agg(max(col("ts"))).head().getTimestamp(0)
    graft.ops.TimeSeries.decayedSum(ev, "event_type", "ts", "value",
      lit(ref.toString).cast(TimestampType))
  }

  /** Deterministic HLL distinct rollup
    * ([[graft.ops.Sketches.hllRelational]]): per-type user-count register
    * sketches plus their "__all__" union via per-register MAX — the HLL
    * merge law expressed relationally, so the DuckDB oracle replays the
    * WHOLE estimator (registers, harmonic sum, linear-counting branch)
    * value-exactly. The datasketches tier ([[graft.ops.Sketches.hllRollup]],
    * binary 6-bit registers) remains the production spelling and stays
    * gated by HllSketchSpec (error bound vs exact; merge law). */
  def q157HllRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(s, dir)
      .select(col("event_type"),
        graft.ops.TextOps.polyHash(col("user_id").cast("string")).as("__h"))
    graft.ops.Sketches.hllRelational(ev, "event_type", col("__h"))
  }

  /** q160: first-order Markov transition matrix over per-user event
    * sequences ([[graft.ops.Eval.transitionMatrix]]) — the "what happens
    * next" readout behind funnel design and bot detection. Windows
    * partition by user; the probability normalization runs on the
    * state-domain-sized aggregate. */
  def q160Transitions(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.transitionMatrix(
      graft.core.Tables.events(s, dir), "user_id", "event_type",
      Seq("ts", "event_id"))

  /** q171: l-diversity audit ([[graft.ops.Privacy.lDiversityAudit]]) —
    * the attribute-disclosure complement of q135's k-anonymity: per
    * (day, value-bucket) equivalence class, how many DISTINCT event
    * types appear and their entropy-l (effective diversity). A class
    * can be k-anonymous and still leak if every row shares one
    * sensitive value. */
  def q171LDiversity(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.lDiversityAudit(
      graft.core.Tables.events(s, dir)
        .select(date_trunc("day", col("ts")).as("day"),
          floor(col("value") / 100).cast("long").as("vbucket"),
          col("event_type")),
      Seq("day", "vbucket"), "event_type")

  /** q172: Kaplan–Meier user-retention curve
    * ([[graft.ops.TimeSeries.kaplanMeier]]). Duration = whole days
    * between a user's first and last event (integer-microsecond
    * arithmetic); users whose last event is within 1 day of the
    * stream frontier are CENSORED (still active), not churned — the
    * distinction naive retention curves miss. (Horizon 1 day: the
    * synthetic stream keeps every user active to within ~1.7 days of
    * the frontier, so longer horizons censor everyone and the curve
    * would be vacuously empty.) */
  def q172Survival(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val spans = ev.groupBy(col("user_id"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .crossJoin(broadcast(ev.agg(max(col("us")).as("frontier_us"))))
      .select(
        expr("(last_us - first_us) div 86400000000").as("duration"),
        when(col("last_us") > col("frontier_us") - lit(86400000000L),
          0).otherwise(1).as("event"))
    graft.ops.TimeSeries.kaplanMeier(spans, "duration", "event")
  }

  /** q173: top user paths — the 10 most common per-(user, day) ordered
    * event-type sequences. The sequence builds in ONE aggregation via
    * collect_list + array_sort on (ts, event_id, type) structs (order
    * imposed inside the group, no window sort over the corpus); the
    * path table then aggregates to path-domain size and TakeOrdered
    * picks the head. */
  def q173TopPaths(s: SparkSession, dir: String): DataFrame =
    graft.ops.Attribution.topPaths(graft.core.Tables.events(s, dir),
        Seq(col("user_id"), date_trunc("day", col("ts")).as("day")),
        "ts", "event_id", "event_type", 10)
      .select(col("path"), col("n_sessions").as("n"))

  /** q174: order-invariant table digest
    * ([[graft.ops.Diff.tableDigest]]) over the orders table's
    * formatter-stable columns — the one-pass migration-reconciliation
    * check (Σ rowhash mod p; commutative, so identical under any
    * partitioning or engine). */
  def q174TableDigest(s: SparkSession, dir: String): DataFrame =
    graft.ops.Diff.tableDigest(Tables.orders(s, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  /** q175: CUSUM changepoint peak per event type over daily counts
    * ([[graft.ops.Stats.cusumPeak]]) — integral scaled deviations, the
    * level-shift monitor for ingest streams. */
  def q175CusumPeak(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.cusumPeak(
      graft.core.Tables.events(s, dir)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day")),
      "event_type", "day")

  /** q176: Benford first-digit audit of l_extendedprice
    * ([[graft.ops.Stats.benfordAudit]]) — decade-ladder digit
    * extraction (no engine-side log10), literal expected shares. */
  def q176Benford(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.benfordAudit(Tables.lineitem(s, dir),
      "l_extendedprice")

  /** q177: Gini concentration of documents over sources
    * ([[graft.ops.Stats.giniIndex]]) — the data-mix inequality
    * diagnostic; exact integer Lorenz arithmetic. */
  def q177Gini(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.giniIndex(
      graft.core.Tables.documents(s, dir), "source")

  /** q180: Mann–Kendall trend per event type over daily counts
    * ([[graft.ops.Stats.mannKendall]]) — sign-only, outlier-robust
    * trend monitor; exact integer S. */
  def q180Trend(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.mannKendall(
      graft.core.Tables.events(s, dir)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day")),
      "event_type", "day")

  /** q181: 1-D Wasserstein distance between src0's and src1's document
    * length distributions ([[graft.ops.Stats.wasserstein1]]) — "how
    * much mass must move", the drift readout with units (chars),
    * complementing q146's TV mass. */
  def q181Wasserstein(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.wasserstein1(
      graft.core.Tables.documents(s, dir), "source", "n_chars",
      "src0", "src1")

  /** q182: pairwise Pearson correlation between event types over hourly
    * count series ([[graft.ops.Stats.pairwiseCorrelation]]) — exact
    * integer moment sums over a dense hour×type grid. */
  def q182Correlation(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.pairwiseCorrelation(
      graft.core.Tables.events(s, dir)
        .select(date_trunc("hour", col("ts")).as("hour"),
          col("event_type")),
      "hour", "event_type")

  /** q183: lag-1 autocorrelation of each event type's daily count
    * series ([[graft.ops.Stats.lag1Autocorr]]). */
  def q183Autocorr(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.lag1Autocorr(
      graft.core.Tables.events(s, dir)
        .select(date_trunc("day", col("ts")).as("day"),
          col("event_type")),
      "day", "event_type")

  /** q178: association rules over user event baskets
    * ([[graft.ops.Assoc.basketRules]]) — support / confidence / lift
    * per ordered event-type pair, the co-visitation readout. */
  def q178BasketRules(s: SparkSession, dir: String): DataFrame =
    graft.ops.Assoc.basketRules(
      graft.core.Tables.events(s, dir), "user_id", "event_type")

  /** q165: A/B experiment readout — deterministic hash-split of users
    * into two arms (the q92 split-hash convention, seed 13), then
    * Welch's t per event type on `value`
    * ([[graft.ops.Eval.welchTwoSample]]; decimal-exact sums, one hash
    * aggregation). The synthetic metric is arm-independent by
    * construction, so |t| should hover near 0 — the gate is the exact
    * arithmetic, and the spec covers a planted true effect. */
  def q165WelchAb(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(s, dir)
      .withColumn("arm",
        when(graft.ops.Sampling.sampleHash(col("user_id"), 13L) <
          500000L, 0).otherwise(1))
    graft.ops.Eval.welchTwoSample(ev, "event_type", "arm", "value")
  }

  /** q184: trailing-window EWMA level per user
    * ([[TimeSeries.ewmaTrailing]], α = ¼ over the last 16 events) —
    * exact decimal weights shared as literals with the oracle. */
  def q184Ewma(s: SparkSession, dir: String): DataFrame =
    TimeSeries.ewmaTrailing(Tables.events(s, dir),
      "user_id", "ts", "event_id", "value")

  /** q185: time-weighted average value per user
    * ([[TimeSeries.timeWeightedAvg]]) — duration-weighted in exact
    * integer microseconds. */
  def q185Twap(s: SparkSession, dir: String): DataFrame =
    TimeSeries.timeWeightedAvg(Tables.events(s, dir),
      "user_id", "ts", "event_id", "value")

  /** q186: per-event-type OLS trend of `value` on event time
    * ([[Stats.groupOls]]; x = epoch seconds, slope per day) — the
    * metric-drift readout with exact decimal normal-equation sums. */
  def q186Ols(s: SparkSession, dir: String): DataFrame =
    Stats.groupOls(Tables.events(s, dir), "event_type",
      expr("unix_micros(ts) div 1000000"), col("value"),
      slopeUnit = 86400.0)

  /** q187: day-of-week seasonal profile per event type
    * ([[Stats.dowProfile]]) — count share, mean value, and deviation
    * from the type's overall mean, per (type, dow). */
  def q187DowProfile(s: SparkSession, dir: String): DataFrame =
    Stats.dowProfile(Tables.events(s, dir), "event_type",
      (dayofweek(col("ts")) - 1).as("dow"), col("value"))

  /** q188: Jaro–Winkler near-name pairs over distinct part names
    * ([[graft.ops.FuzzyJoin.jaroNearNames]], native codegen
    * expression, first-character blocking, 6-rounded threshold). */
  def q188JaroNames(s: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin.jaroNearNames(
      Tables.part(s, dir).select(col("p_name")), "p_name", 0.8)

  /** q189: count–min sketch audit over user event counts
    * ([[graft.ops.Sketches.countMinEstimate]], depth 4 × width 64) —
    * per-user exact count, CMS estimate, and the (always ≥ 0)
    * overcount; the sketch itself is a 256-row frame. */
  def q189CountMin(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.countMinEstimate(
      Tables.events(s, dir), col("user_id"))

  /** q190: reciprocal-rank fusion of the revenue-top-100 and
    * order-count-top-100 customer rankings
    * ([[graft.ops.Eval.rrfFuse]], k = 60) — rank joins on exact
    * decimal revenue; ties broken by custkey on both engines. */
  def q190Rrf(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    // top-100 via distributed TakeOrderedAndProject FIRST; the
    // single-partition rank window then runs over 100 rows, not the
    // customer domain — the bounded-window shape that survives scale
    def top100(df: DataFrame, metric: Column, rankName: String) =
      df.orderBy(metric.desc, col("c_custkey").asc).limit(100)
        .withColumn(rankName, row_number().over(
          Window.orderBy(metric.desc, col("c_custkey").asc)))
    val rev = top100(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("rev")),
      col("rev"), "rank")
    val cnt = top100(
      ord.groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders")),
      col("n_orders"), "rank")
    graft.ops.Eval.rrfFuse(rev, cnt, "c_custkey", "rank", 60)
  }

  /** q191: ordered event-type co-occurrence per user
    * ([[graft.ops.Assoc.orderedPairReach]]) — for each type pair, how
    * many users have both, and for how many the first A preceded the
    * last B. */
  def q191SeqPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Assoc.orderedPairReach(Tables.events(s, dir),
      "user_id", "event_type", "ts")

  /** q192: top-5 seasonal residual anomalies per event type
    * ([[Stats.dowAnomalies]]) — rows furthest from their (type, dow)
    * expected level. */
  def q192DowAnomalies(s: SparkSession, dir: String): DataFrame =
    Stats.dowAnomalies(Tables.events(s, dir), "event_type",
      (dayofweek(col("ts")) - 1).as("dow"), "event_id", "value", 5)

  /** q193: Theil–Sen robust trend per event type over the daily count
    * series ([[Stats.theilSen]]) — the outlier-immune complement of
    * q186's OLS slope. */
  def q193TheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('day', ts)) div 86400000000")
          .as("day"))
      .agg(count(lit(1)).as("c"))
    Stats.theilSen(daily, "event_type", "day", "c")
  }

  /** q194: event-mix Shannon entropy per user
    * ([[Stats.groupEntropy]]) — behavioral-diversity score. */
  def q194Entropy(s: SparkSession, dir: String): DataFrame =
    Stats.groupEntropy(Tables.events(s, dir), "user_id", "event_type")

  /** q195: sequence log-likelihood per user under the self-trained
    * Markov transition model ([[graft.ops.Eval.sequenceLogLik]]) —
    * path-typicality / session-anomaly score. */
  def q195SeqLogLik(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.sequenceLogLik(Tables.events(s, dir),
      "user_id", "event_type", Seq("ts", "event_id"))

  /** q196: differentially-private event-type counts
    * ([[graft.ops.Privacy.dpNoisyCounts]], ε = 0.5, seeded
    * deterministic Laplace). */
  def q196DpCounts(s: SparkSession, dir: String): DataFrame =
    graft.ops.Privacy.dpNoisyCounts(Tables.events(s, dir),
      "event_type", 0.5, 99L)

  /** q201: co-occurring event pairs within 5 minutes, written as the
    * NAIVE abs-difference self-join — no manual banding. The
    * [[graft.plans.ProximityJoinRewrite]] optimizer rule turns it into
    * the banded equi-join q53 builds by hand (plan-pinned: no nested
    * loop), so the natural spelling is also the scalable one. */
  def q201AutoRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val a = e.select(col("event_id").as("id_a"),
      col("event_type").as("type_a"), col("us").as("us_a"))
    val b = e.select(col("event_id").as("id_b"),
      col("event_type").as("type_b"), col("us").as("us_b"))
    a.join(b, abs(col("us_a") - col("us_b")) <= lit(300000000L) &&
        col("id_a") < col("id_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** q203: duration-free weighted median of `value` per event type,
    * weighted by the payload's integer k ([[Stats.weightedMedian]]) —
    * exact integer half-mass boundary, no float percentile. */
  def q203WeightedMedian(s: SparkSession, dir: String): DataFrame =
    Stats.weightedMedian(Tables.events(s, dir), "event_type", "value",
      get_json_object(col("props"), "$.k").cast("long"), "event_id")

  /** q205: mutual information between event type and day-of-week
    * ([[Stats.mutualInformation]]) — the categorical dependence
    * readout behind "does the event mix shift by weekday". */
  def q205MutualInfo(s: SparkSession, dir: String): DataFrame =
    Stats.mutualInformation(Tables.events(s, dir),
      col("event_type"), dayofweek(col("ts")) - 1)

  /** q206: Poisson-bootstrap CI for each event type's mean value
    * ([[Stats.bootstrapMeanCI]], 32 deterministic replicates) —
    * uncertainty quantification without materializing resamples. */
  def q206BootstrapCI(s: SparkSession, dir: String): DataFrame =
    Stats.bootstrapMeanCI(Tables.events(s, dir), "event_type", "value",
      col("event_id"), b = 32, seed = 7L)

  /** q207: pairwise audience overlap between event types
    * ([[Stats.audienceOverlap]]) — exact distinct-user intersections
    * and Jaccard per type pair. */
  def q207AudienceOverlap(s: SparkSession, dir: String): DataFrame =
    Stats.audienceOverlap(Tables.events(s, dir),
      "event_type", "user_id")

  /** q208: last-touch attribution — each purchase credits the latest
    * prior click/view by the same user within a 24 h lookback, else
    * `direct`; per-channel purchase counts, exact-decimal revenue, and
    * share. Composes [[graft.ops.AsOf.asofJoin]] (one key-partitioned
    * window, no per-user collect) with pure arithmetic — the marketing
    * readout and the OMOP visit-linkage shape are the same operator. */
  def q208Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val touches = ev
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"), col("event_type"))
    val att = graft.ops.AsOf.asofJoin(purchases, touches,
      "user_id", "ts", Seq("event_type"))
    val channel = when(col("asof_ts").isNotNull &&
      unix_micros(col("ts")) - unix_micros(col("asof_ts"))
        <= lit(86400000000L),
      col("asof_event_type")).otherwise(lit("direct"))
    val w = Window.partitionBy()
    att.select(channel.as("channel"),
        col("value").cast(DecimalType(14, 4)).as("__v"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("__v")).cast("double"), 4).as("revenue"))
      .withColumn("share",
        round(col("n_purchases").cast("double") /
          sum(col("n_purchases")).over(w).cast("double"), 6))
  }

  /** q209: time-bounded funnel — signup → first click within 24 h →
    * first purchase within 24 h of that click (the q119 shape with the
    * conversion-window constraint real funnels carry). Stage-wise
    * conditional-min aggregation on monotonically shrinking user
    * tables; no per-user event collect. */
  def q209BoundedFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val dayUs = 86400000000L
    def stage(tpe: String) = ev.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts"))
    val t1 = stage("signup").groupBy(col("user_id"))
      .agg(min(col("ts")).as("ts1"))
    val t2 = stage("click").join(t1, "user_id")
      .filter(col("ts") > col("ts1") &&
        unix_micros(col("ts")) - unix_micros(col("ts1")) <= dayUs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts2"))
    val t3 = stage("purchase").join(t2, "user_id")
      .filter(col("ts") > col("ts2") &&
        unix_micros(col("ts")) - unix_micros(col("ts2")) <= dayUs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts3"))
    val n1 = t1.agg(count(lit(1)).as("n_users"))
    val stages = n1.withColumn("stage", lit(1))
      .withColumn("step", lit("signup"))
      .unionByName(t2.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(2)).withColumn("step", lit("click_24h")))
      .unionByName(t3.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(3))
        .withColumn("step", lit("purchase_24h")))
    stages.crossJoin(broadcast(n1.select(col("n_users").as("__base"))))
      .select(col("stage"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("__base").cast("double"),
          6).as("rate"))
  }

  /** q210: NAIVE edit-distance self-join over distinct part names —
    * `levenshtein(a, b) <= 2` with no manual blocking. The
    * [[graft.plans.ProximityJoinRewrite]] levenshtein pattern bands it
    * on string LENGTH automatically (edit distance ≤ k bounds the
    * length gap by k), so the exact-recall spelling also hash-
    * partitions — where q150's hand blocking trades recall for its
    * block key, this keeps every true pair. */
  def q210AutoFuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir).select(col("p_name")).distinct()
    val a = names.select(col("p_name").as("name_a"))
    val b = names.select(col("p_name").as("name_b"))
    a.join(b, levenshtein(col("name_a"), col("name_b")) <= lit(2) &&
        col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
  }

  /** q211: two-sample Kolmogorov–Smirnov distance between the click
    * and error value distributions ([[Stats.ksTwoSample]]) — the
    * any-difference shift test beside q181's magnitude and q146's
    * bucketed drift. */
  def q211Ks(s: SparkSession, dir: String): DataFrame =
    Stats.ksTwoSample(Tables.events(s, dir), "event_type", "value",
      "click", "error")

  /** q212: chi-square independence of event type × day-of-week
    * ([[Stats.chiSquare]]) — the significance companion of q205's
    * mutual information. */
  def q212ChiSquare(s: SparkSession, dir: String): DataFrame =
    Stats.chiSquare(Tables.events(s, dir),
      col("event_type"), dayofweek(col("ts")) - 1)

  /** q213: Spearman rank correlation of quantity vs extended price per
    * return flag ([[Stats.spearman]]) — the monotone-association
    * companion of q182's Pearson, exact midrank moments. */
  def q213Spearman(s: SparkSession, dir: String): DataFrame =
    Stats.spearman(Tables.lineitem(s, dir),
      "l_returnflag", "l_quantity", "l_extendedprice")

  /** q214: Cramér's V of event type × hour-of-day
    * ([[Stats.cramersV]]) — the effect-size companion of q212's
    * significance: is the event mix time-of-day dependent, and by
    * how much on a [0,1] scale. */
  def q214CramersV(s: SparkSession, dir: String): DataFrame =
    Stats.cramersV(Tables.events(s, dir),
      col("event_type"), hour(col("ts")))

  /** The q92/q165 deterministic A/B arm: hash-split on user id, seed 13. */
  private def withArm(ev: DataFrame): DataFrame =
    ev.withColumn("arm",
      when(graft.ops.Sampling.sampleHash(col("user_id"), 13L) <
        500000L, 0).otherwise(1))

  /** q215: Mann–Whitney U test of `value` between the q165 hash-split
    * arms per event type ([[Eval.mannWhitneyU]]) — the nonparametric
    * twin of q165's Welch t: rank-based, so heavy tails can't fake or
    * mask a treatment effect. */
  def q215MannWhitney(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.mannWhitneyU(withArm(Tables.events(s, dir)),
      Seq("event_type"), "arm", "value")

  /** q216: Benjamini–Hochberg FDR adjustment ([[Stats.bhFdr]]) over the
    * q215 test run per (event_type, hour) stratum — the multiple-
    * comparisons discipline every per-stratum significance sweep needs
    * before anyone acts on its "discoveries". */
  def q216BhFdr(s: SparkSession, dir: String): DataFrame = {
    val tests = graft.ops.Eval.mannWhitneyU(
      withArm(Tables.events(s, dir)).withColumn("hr", hour(col("ts"))),
      Seq("event_type", "hr"), "arm", "value")
    Stats.bhFdr(tests.select(col("event_type"), col("hr"), col("p_two")),
      "p_two", Seq("event_type", "hr"))
  }

  /** q217: one-way ANOVA F across event types ([[Eval.anovaF]]) — does
    * mean `value` differ by type at all, the k-group gate run before
    * any pairwise test sweep. */
  def q217AnovaF(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.anovaF(Tables.events(s, dir), "event_type", "value")

  /** q218: two-group log-rank test ([[TimeSeries.logRank]]) on the q172
    * user-span construction, arms from the q165 hash split — are the
    * two cohorts' churn curves different, with significance (q172 only
    * draws the curves). */
  def q218LogRank(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val spans = ev.groupBy(col("user_id"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .crossJoin(broadcast(ev.agg(max(col("us")).as("frontier_us"))))
      .select(col("user_id"),
        expr("(last_us - first_us) div 86400000000").as("duration"),
        when(col("last_us") > col("frontier_us") - lit(86400000000L),
          lit(0)).otherwise(lit(1)).as("event"))
    graft.ops.TimeSeries.logRank(withArm(spans), "duration", "event",
      "arm")
  }

  /** The q221/q222 outcome: a high-value event (value > 50 ≈ top
    * quartile of the synthetic distribution), NULL-value rows excluded
    * (the q165 convention). */
  private def withConversion(ev: DataFrame): DataFrame =
    withArm(ev).filter(col("value").isNotNull)
      .withColumn("conv", when(col("value") > 50.0, 1).otherwise(0))

  /** q221: two-proportion z-test per event type
    * ([[Eval.twoProportionZ]]) — does the high-value-event RATE differ
    * between the hash-split arms (q165 compares means; this is the
    * conversion readout). */
  def q221TwoProportion(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.twoProportionZ(withConversion(Tables.events(s, dir)),
      Seq("event_type"), "arm", "conv")

  /** q222: Cochran–Mantel–Haenszel test of arm × conversion pooled
    * over hour-of-day strata ([[Eval.cmhTest]]) — the
    * Simpson's-paradox-proof version of q221's collapsed 2×2. */
  def q222Cmh(s: SparkSession, dir: String): DataFrame =
    graft.ops.Eval.cmhTest(
      withConversion(Tables.events(s, dir))
        .withColumn("hr", hour(col("ts"))),
      Seq("hr"), "arm", "conv")

  /** q223: Jensen–Shannon divergence of the arms' event-type mixes per
    * day-of-week ([[Stats.jsDivergence]]) — a bounded, symmetric
    * drift score (a correct split should sit at ≈ 0 every day). */
  def q223Jsd(s: SparkSession, dir: String): DataFrame =
    Stats.jsDivergence(
      withArm(Tables.events(s, dir))
        // Spark dayofweek is 1-based Sunday; −1 matches DuckDB's 0-based
        .withColumn("dow", dayofweek(col("ts")) - 1),
      Seq("dow"), "arm", "event_type")

  /** q224: Kendall τ-b between hourly click and purchase volumes
    * ([[Stats.kendallTauB]]) — exact concordance counts over the
    * hour-domain series (720 points; the corpus reduces first, per the
    * operator's scale contract). */
  def q224KendallTau(s: SparkSession, dir: String): DataFrame = {
    val series = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(when(col("event_type") === "click", lit(1))).as("x"),
        count(when(col("event_type") === "purchase", lit(1))).as("y"))
    Stats.kendallTauB(series, "h", "x", "y")
  }

  /** q225: adjusted standardized residuals of event type × day-of-week
    * ([[Stats.chiResiduals]]) — WHICH cells drive q212's chi-square,
    * |resid| > 2 ≈ significant at the cell level. */
  def q225ChiResiduals(s: SparkSession, dir: String): DataFrame =
    Stats.chiResiduals(Tables.events(s, dir),
      col("event_type"), dayofweek(col("ts")) - 1)

  /** q226: minimum detectable effect per event type at current volume
    * ([[Eval.minDetectableEffect]]) — experiment planning: the
    * smallest conversion-rate lift an even split could resolve at
    * α=0.05 / power 0.8. */
  def q226Mde(s: SparkSession, dir: String): DataFrame =
    Eval.minDetectableEffect(
      withConversion(Tables.events(s, dir)), Seq("event_type"), "conv")

  /** q227: SPRT boundary walk per event type
    * ([[Eval.sprtBoundary]], H0 rate 0.2 vs H1 rate 0.3, α=β=0.05) —
    * the peeking-safe sequential test: first timestamp where the
    * evidence crosses a Wald boundary. */
  def q227Sprt(s: SparkSession, dir: String): DataFrame =
    Eval.sprtBoundary(withConversion(Tables.events(s, dir)),
      Seq("event_type"), "ts", "event_id", "conv", p0 = 0.2, p1 = 0.3)

  /** q228: Holt linear level + trend + 7-step forecast per user
    * ([[TimeSeries.holtLinear]], α=0.3, β=0.1) — the forecasting
    * extension of q184's EWMA level, bit-exact decimal recursion on
    * both engines. */
  def q228Holt(s: SparkSession, dir: String): DataFrame =
    TimeSeries.holtLinear(Tables.events(s, dir),
      "user_id", "ts", "event_id", "value")

  /** q229: seasonal-naive forecast evaluation per event type
    * ([[TimeSeries.maseEval]]) — MASE of "same weekday last week"
    * against the "like yesterday" scale over the daily mean series. */
  def q229Mase(s: SparkSession, dir: String): DataFrame =
    TimeSeries.maseEval(Tables.events(s, dir), "event_type",
      date_trunc("day", col("ts")), "value")

  /** q230: split-conformal 90% interval width per event type
    * ([[Eval.conformalWidth]]) — train/cal split on a seed-21 event
    * hash, predictor = (type, hour) train mean, width = the
    * ⌈(n+1)·0.9⌉-th smallest calibration residual. */
  def q230Conformal(s: SparkSession, dir: String): DataFrame =
    Eval.conformalWidth(
      Tables.events(s, dir).withColumn("split",
        when(graft.ops.Sampling.sampleHash(col("event_id"), 21L) <
          500000L, 0).otherwise(1)),
      "event_type", hour(col("ts")), "value", "split")

  /** q231: one-pass column profile of `orders`
    * ([[Stats.profileColumns]]) — null counts, exact distincts,
    * min/max per column, the ingest-audit summary. */
  def q231Profile(s: SparkSession, dir: String): DataFrame =
    Stats.profileColumns(Tables.orders(s, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))

  /** q232: leakage-free 5-fold target encoding of order priority →
    * mean total price ([[Eval.targetEncoding]], m = 20 smoothing) —
    * the (category, fold) table a feature join consumes, each value
    * computed without its own fold's labels. */
  def q232TargetEncoding(s: SparkSession, dir: String): DataFrame =
    Eval.targetEncoding(Tables.orders(s, dir), "o_orderpriority",
      graft.ops.Sampling.sampleHash(col("o_orderkey"), 31L) % 5,
      "o_totalprice")

  /** q233: word2vec-style negative-sampling table over part
    * popularity ([[Sampling.negativeSamplingTable]], count^¾ via
    * exact sqrt composition) — deterministic cumulative ranges a
    * sampler inverts with one uniform draw. */
  def q233NegSampling(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.negativeSamplingTable(
      Tables.lineitem(s, dir), "l_partkey")

  /** q234: Qini / uplift deciles per event type
    * ([[Eval.qiniDeciles]]) — value as the targeting score, the q165
    * hash arms, high-value conversion as the outcome; the acceptance
    * curve uplift modeling is judged on. */
  def q234Qini(s: SparkSession, dir: String): DataFrame =
    Eval.qiniDeciles(withConversion(Tables.events(s, dir)),
      Seq("event_type"), "arm", "conv", "value", "event_id")

  /** q237: Wilcoxon signed-rank per event type
    * ([[Eval.wilcoxonSignedRank]]) — paired before/after: each user's
    * mean value in the first vs second half of the month; did the
    * typical user's level SHIFT, pairing out between-user variance. */
  def q237Wilcoxon(s: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast("decimal(18,4)")
    val firstHalf = dayofmonth(col("ts")) <= 15
    val halves = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(firstHalf, dec)).as("__s1"),
        count(when(firstHalf, lit(1))).as("__c1"),
        sum(when(!firstHalf, dec)).as("__s2"),
        count(when(!firstHalf, lit(1))).as("__c2"))
      .filter(col("__c1") > 0 && col("__c2") > 0)
      .select(col("event_type"),
        (col("__s1").cast("double") / col("__c1")).as("m1"),
        (col("__s2").cast("double") / col("__c2")).as("m2"))
    Eval.wilcoxonSignedRank(halves, Seq("event_type"), "m1", "m2")
  }

  /** q238: Cohen's d / Hedges' g per event type ([[Eval.cohensD]]) —
    * the standardized-magnitude line next to q165's t and q215's z. */
  def q238CohensD(s: SparkSession, dir: String): DataFrame =
    Eval.cohensD(withArm(Tables.events(s, dir))
      .filter(col("value").isNotNull), Seq("event_type"), "arm",
      "value")

  /** q239: Mantel–Haenszel pooled odds ratio over hour strata
    * ([[Eval.mhOddsRatio]]) — the adjusted effect ESTIMATE beside
    * q222's significance. */
  def q239MhOdds(s: SparkSession, dir: String): DataFrame =
    Eval.mhOddsRatio(
      withConversion(Tables.events(s, dir))
        .withColumn("hr", hour(col("ts"))),
      Seq("hr"), "arm", "conv")

  /** q240: McNemar's paired-proportion test per event type
    * ([[Eval.mcNemar]]): each user's "ever converted" flag in the first
    * vs second half of the month — the binary twin of q237's
    * signed-rank (did users who weren't converting START, pairing out
    * user identity). Only users active in both halves pair. */
  def q240McNemar(s: SparkSession, dir: String): DataFrame = {
    val firstHalf = dayofmonth(col("ts")) <= 15
    val paired = withConversion(Tables.events(s, dir))
      .groupBy(col("event_type"), col("user_id"))
      .agg(max(when(firstHalf, col("conv"))).as("before"),
        max(when(!firstHalf, col("conv"))).as("after"))
      .filter(col("before").isNotNull && col("after").isNotNull)
    Eval.mcNemar(paired, Seq("event_type"), "before", "after")
  }

  /** q241: incremental aggregate maintenance ([[Ivm.aggState]] /
    * [[Ivm.mergeAggState]]): the standing per-type (count, sum) rollup
    * built from days 1–19, maintained with a delta batch of inserts
    * (days 20+) AND retractions (days 1–2 erased, weight −1 — the
    * GDPR-purge shape) — the oracle recomputes days 3+ from scratch,
    * so the gate IS the maintenance-equals-recompute contract. */
  def q241IvmAggState(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val day = dayofmonth(col("ts"))
    val state = Ivm.aggState(ev.filter(day < 20),
      Seq("event_type"), "value", lit(1L))
    val delta = Ivm.aggState(
      ev.filter(day >= 20).withColumn("__w", lit(1L))
        .unionByName(ev.filter(day <= 2).withColumn("__w", lit(-1L))),
      Seq("event_type"), "value", col("__w"))
    Ivm.mergeAggState(state, delta, Seq("event_type"))
      .select(col("event_type"), col("cnt"),
        col("total").cast("double").as("total"))
  }

  /** q243: zone-map prunability under two layouts of the SAME rows
    * ([[Sharding.zoneMap]] / [[Sharding.prunedShards]]): events hash-
    * sharded by user (32 shards) vs clustered by event day; a 3-day
    * ts-range predicate prunes ~90% of the clustered layout's shards
    * and ZERO of the hashed one — the data-layout decision that
    * governs what fraction of a 100 TB scan ever touches disk,
    * measured as a number. */
  def q243ZonePrune(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val micros = unix_micros(col("ts"))
    val stats = Seq("ts_micros" -> micros)
    val hashed = Sharding.zoneMap(
      ev, pmod(col("user_id"), lit(32)).cast("int"), stats)
    val clustered = Sharding.zoneMap(
      ev, (dayofmonth(col("ts")) - 1).cast("int"), stats)
    // predicate: days 10-12 of 2024-01 (UTC), bounds in epoch micros
    val lo = 1704844800000000L
    val hi = 1705104000000000L - 1L
    Sharding.prunedShards(hashed, "ts_micros", lo, hi, "hash_by_user")
      .unionByName(Sharding.prunedShards(
        clustered, "ts_micros", lo, hi, "clustered_by_day"))
  }

  /** q244: Cliff's delta per event type ([[Eval.cliffsDelta]]) — the
    * dominance-probability effect size beside q215's Mann–Whitney
    * significance and q238's parametric d. */
  def q244CliffsDelta(s: SparkSession, dir: String): DataFrame =
    Eval.cliffsDelta(withArm(Tables.events(s, dir)), Seq("event_type"),
      "arm", "value")

  /** q245: additive seasonal decomposition of the daily mean value per
    * event type ([[TimeSeries.seasonalDecompose]]): trend (centered
    * 7-day MA) + day-of-week seasonal + residual — q228 forecasts the
    * series, this explains it. The events spine is dense (every type
    * fires daily), satisfying the operator's contract. */
  def q245SeasonalDecomp(s: SparkSession, dir: String): DataFrame =
    TimeSeries.seasonalDecompose(Tables.events(s, dir), "event_type",
      "ts", "value")

  /** q247: multi-touch attribution ([[Attribution.touchCredit]] →
    * [[Attribution.channelCredit]]): purchases credited to the
    * view/click touches of the same user in the preceding 24 h, rolled
    * up per channel under first/last/linear models — which acquisition
    * channel gets paid, with the three models' disagreement visible in
    * one row per channel. */
  def q247Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val credits = graft.ops.Attribution.touchCredit(
      ev.filter(col("event_type").isin("view", "click")),
      ev.filter(col("event_type") === "purchase"),
      "user_id", "ts", "event_id", "event_type",
      windowSeconds = 86400L)
    graft.ops.Attribution.channelCredit(credits)
  }

  /** q248: monthly revenue accrual ([[graft.ops.Intervals
    * .allocateMonthly]]): each order's contract interval (orderdate +
    * deterministic 0–44-day term) pro-rated across the calendar months
    * it touches — the accrual readout a plain date_trunc GROUP BY gets
    * wrong at every month boundary. */
  def q248MonthlyAccrual(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val start = to_date(col("o_orderdate"))
    val end = date_add(start, (col("o_orderkey") % 45).cast("int"))
    graft.ops.Intervals.allocateMonthly(o, Seq(col("o_orderkey")),
        start, end, col("o_totalprice"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_slices"),
        round(sum(col("alloc")), 6).cast("double").as("accrued"))
  }

  /** q249: cohort LTV curves — q120's retention matrix with VALUE on
    * it: cumulative purchase revenue per cohort user by week offset
    * (the "when does a cohort pay back" readout). Same epoch-week
    * construction; revenue decimal-summed, cumulated over the
    * cohort-domain offset window. */
  def q249CohortLtv(s: SparkSession, dir: String): DataFrame = {
    val wk = expr("cast(ts as long) div 604800").cast("int")
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        wk.as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val withOff = ev.join(first, "user_id")
      .withColumn("off", col("wk") - col("cw"))
    val cells = withOff.groupBy(col("cw"), col("off")).agg(
      sum(when(col("event_type") === "purchase",
        col("value").cast(DecimalType(18, 4)))).as("__rev"))
    val base = first.groupBy(col("cw")).agg(count(lit(1)).as("base"))
    val wCum = Window.partitionBy(col("cw")).orderBy(col("off"))
    cells.withColumn("__cum",
        sum(coalesce(col("__rev"),
          lit(BigDecimal(0)).cast(DecimalType(18, 4)))).over(wCum))
      .join(broadcast(base), "cw")
      .select(col("cw").as("cohort_week"), col("off").as("week_offset"),
        col("base").as("cohort_users"),
        round(col("__cum"), 6).cast("double").as("cum_revenue"),
        round(col("__cum").cast("double") / col("base"), 6)
          .as("ltv_per_user"))
  }

  /** q250: empirical-Bayes shrunk conversion rates per (event type,
    * user) ([[Stats.ebShrinkRates]]) — the small-sample ranking fix: a
    * user's rate pulled toward the type prior with strength learned
    * from the across-user rate variance. */
  def q250EbShrink(s: SparkSession, dir: String): DataFrame =
    Stats.ebShrinkRates(withConversion(Tables.events(s, dir)),
      Seq("event_type"), "user_id", col("conv"))

  /** q251: rolling engagement ([[TimeSeries.rollingActive]]): DAU,
    * trailing-7-day AU, and DAU/WAU stickiness per day, computed on
    * the deduped (day, user) sliver — never a sliding re-scan of raw
    * events. */
  def q251RollingActive(s: SparkSession, dir: String): DataFrame =
    TimeSeries.rollingActive(Tables.events(s, dir), "ts", "user_id", 7)

  /** q252: CMS join-cardinality estimate ([[graft.ops.Sketches
    * .cmsJoinSize]]): |events ⋈ orders| on user↔cust key predicted
    * from two depth-4 × width-8192 sketches (inner products need wide
    * sketches — see the op's sizing note), with the exact size for
    * audit — the planner statistic that prices a join without running
    * it. */
  def q252CmsJoinSize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val o = Tables.orders(s, dir)
    val est = graft.ops.Sketches.cmsJoinSize(
      ev, col("user_id"), o, col("o_custkey"), depth = 4, width = 8192)
    val exact = ev.groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("__na"))
      .join(o.groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("__nb")), "k")
      .agg(sum(col("__na") * col("__nb")).cast("long").as("exact"))
    est.crossJoin(exact)
      .select(col("n_rows"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
  }

  /** q253: declarative expectations suite
    * ([[graft.etl.Expectations]]): not-null / range / domain / pattern
    * / unique over orders in ONE aggregate pass, plus the
    * lineitem→orders referential check — the generic publish gate the
    * reference's row-count QC doesn't have. The range check carries a
    * 5% tolerance so both threshold branches are exercised. */
  def q253Expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.Expectations
    val o = Tables.orders(s, dir)
    Expectations.run(o, Seq(
        Expectations.notNull("o_custkey"),
        Expectations.inRange("o_totalprice", 0.0, 480000.0,
          maxFrac = 0.05),
        Expectations.accepted("o_orderstatus", Seq("O", "F", "P")),
        Expectations.matches("o_orderpriority", "^[1-5]-")),
      unique = Seq("o_orderkey"))
      .unionByName(Expectations.fkCovered(
        Tables.lineitem(s, dir), "l_orderkey", o, "o_orderkey"))
  }

  /** q255: nearest-neighbor matched treatment effect
    * ([[Eval.nnMatch]] → [[Eval.attEstimate]]): each treated event
    * matched with replacement to the nearest control on the value
    * covariate (caliper 1.0, banded-bucket join), ATT on the
    * conversion outcome per event type — the matching estimator of
    * the causal tier beside q234's uplift deciles. */
  def q255MatchedAtt(s: SparkSession, dir: String): DataFrame = {
    val ev = withConversion(Tables.events(s, dir))
    val pairs = Eval.nnMatch(ev, Seq("event_type"), "arm", "event_id",
      "value", "conv", caliper = 1.0)
    Eval.attEstimate(pairs, Seq("event_type"))
  }

  /** q256: difference-in-differences ([[Eval.didEstimate]]): arm ×
    * (first/second half of month) 2×2 on value per event type —
    * the pre-trend-adjusted effect line (q165's t assumes no
    * pre-period; DiD subtracts it). */
  def q256Did(s: SparkSession, dir: String): DataFrame =
    Eval.didEstimate(
      withArm(Tables.events(s, dir))
        .withColumn("period", (dayofmonth(col("ts")) > 15).cast("int")),
      Seq("event_type"), "arm", "period", "value")

  /** q257: CUPED-adjusted treatment difference ([[Eval.cupedAdjust]]):
    * per (event_type, user), the first-half mean value is the
    * pre-period covariate and the second-half mean the experiment
    * metric (the q237 pairing re-used for variance REDUCTION instead
    * of a paired test); θ pooled arm-blind, variance ratio reported. */
  def q257Cuped(s: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast(DecimalType(18, 4))
    val firstHalf = dayofmonth(col("ts")) <= 15
    val units = withArm(Tables.events(s, dir))
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("user_id"), col("arm"))
      .agg(sum(when(firstHalf, dec)).as("__s1"),
        count(when(firstHalf, lit(1))).as("__c1"),
        sum(when(!firstHalf, dec)).as("__s2"),
        count(when(!firstHalf, lit(1))).as("__c2"))
      .filter(col("__c1") > 0 && col("__c2") > 0)
      .select(col("event_type"), col("arm"),
        (col("__s1").cast("double") / col("__c1")).as("x"),
        (col("__s2").cast("double") / col("__c2")).as("y"))
    Eval.cupedAdjust(units, Seq("event_type"), "arm", "x", "y")
  }

  /** q258: Nelson–Aalen cumulative hazard ([[TimeSeries.nelsonAalen]])
    * on the q172 span construction — the hazard-sum dual of q172's KM
    * product, sharing one duration-domain machinery. */
  def q258NelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val spans = ev.groupBy(col("user_id"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .crossJoin(broadcast(ev.agg(max(col("us")).as("frontier_us"))))
      .select(
        expr("(last_us - first_us) div 86400000000").as("duration"),
        when(col("last_us") > col("frontier_us") - lit(86400000000L),
          0).otherwise(1).as("event"))
    TimeSeries.nelsonAalen(spans, "duration", "event")
  }

  /** q259: RFM segmentation ([[Stats.rfmScores]]) over purchase
    * transactions — recency/frequency/monetary quintiles per user,
    * tiebreak-total ntiles, 5 = best on every axis. */
  def q259Rfm(s: SparkSession, dir: String): DataFrame =
    Stats.rfmScores(
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          col("value").isNotNull),
      "user_id", "ts", col("value"))

  /** q260: ABC / Pareto classification ([[Stats.abcClassify]]) of
    * parts by lineitem revenue — cumulative-share classes over the
    * item domain (the inventory-prioritization readout). */
  def q260Abc(s: SparkSession, dir: String): DataFrame =
    Stats.abcClassify(Tables.lineitem(s, dir), "l_partkey",
      col("l_extendedprice") * (lit(1) - col("l_discount")))

  /** q261: daily session-quality metrics over the q41 sessionization
    * ([[graft.streaming.EventStreams.sessionizeBatch]]): sessions
    * started, bounce rate (single-event sessions), mean events and
    * mean/median duration — the product-analytics rollup a session
    * table exists to feed. Duration percentile is the exact
    * `percentile` aggregate (the q12-proven portable form); means ride
    * decimal sums. */
  def q261SessionMetrics(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.streaming.EventStreams
      .sessionizeBatch(Tables.events(s, dir))
      .select(to_date(col("session_start")).as("day"),
        col("n_events"),
        ((unix_micros(col("session_end")) -
          unix_micros(col("session_start"))) / lit(1000000L))
          .cast("long").as("dur_sec"))
    sess.groupBy(col("day")).agg(
      count(lit(1)).as("n_sessions"),
      round(count(when(col("n_events") === 1, lit(1)))
        .cast("double") / count(lit(1)), 6).as("bounce_rate"),
      round(sum(col("n_events").cast(DecimalType(18, 4)))
        .cast("double") / count(lit(1)), 6).as("mean_events"),
      round(sum(col("dur_sec").cast(DecimalType(18, 4)))
        .cast("double") / count(lit(1)), 6).as("mean_dur_sec"),
      round(percentile(col("dur_sec"), lit(0.5)), 4)
        .as("median_dur_sec"))
  }

  /** q262: time-constrained funnel — q119's signup→click→purchase
    * where each step must follow the previous within ONE HOUR (the
    * conversion-window semantics of real funnel products; the
    * unconstrained q119 counts a purchase weeks later). Same
    * stage-wise conditional-min joins on monotonically shrinking user
    * tables — the constraint is one extra band predicate per stage. */
  def q262ConstrainedFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val hourUs = 3600L * 1000000L
    def stage(tpe: String) = ev.filter(col("event_type") === tpe)
    val t1 = stage("signup").groupBy(col("user_id"))
      .agg(min(col("ts")).as("ts1"))
    val t2 = stage("click").join(t1, "user_id")
      .filter(col("ts") > col("ts1") &&
        unix_micros(col("ts")) <= unix_micros(col("ts1")) + hourUs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts2"))
    val t3 = stage("purchase").join(t2, "user_id")
      .filter(col("ts") > col("ts2") &&
        unix_micros(col("ts")) <= unix_micros(col("ts2")) + hourUs)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts3"))
    val n1 = t1.agg(count(lit(1)).as("n_users"))
    val stages = n1.withColumn("stage", lit(1))
      .withColumn("step", lit("signup"))
      .unionByName(t2.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(2)).withColumn("step", lit("click")))
      .unionByName(t3.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit(3)).withColumn("step", lit("purchase")))
    stages.crossJoin(broadcast(n1.select(col("n_users").as("base"))))
      .select(col("stage"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("base"), 6)
          .as("conv_rate"))
  }
}
