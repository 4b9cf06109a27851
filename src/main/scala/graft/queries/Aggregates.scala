package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation / window / reshape breadth (SURVEY.md §2.4, 2.5, 2.9).
  *
  * Scale notes (100 TB): every groupBy below is a two-phase hash agg
  * (map-side partial → shuffle on the group key → final); countDistinct
  * adds Spark's standard expand+two-pass plan. Windows are partitioned by
  * a key wherever they run over fact-sized data; the only unpartitioned
  * windows run over already-aggregated per-day frames (≤ a few thousand
  * rows). Double sums route through DECIMAL(18,6) so results are
  * order-independent (exact integer arithmetic) — required for parity and
  * for deterministic re-runs under AQE re-partitioning.
  */
object Aggregates {

  /** A1: count distinct per group — the reference's universal metric. */
  val qAggCountDistinct = Q("q_agg_count_distinct",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |       count(DISTINCT o_custkey) AS n_customers,
           |       count(*) AS n_orders
           |FROM orders GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** A2: MIN/MAX per key (first/last event dates). */
  val qAggMinFirst = Q("q_agg_min_first",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .groupBy($"o_custkey")
        .agg(to_date(min($"o_orderdate")).as("first_order"),
          to_date(max($"o_orderdate")).as("last_order"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey,
           |       CAST(min(o_orderdate) AS DATE) AS first_order,
           |       CAST(max(o_orderdate) AS DATE) AS last_order,
           |       count(*) AS n_orders
           |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin))

  /** A3: AVG/STDEV + log-stats — the Labs.csv statistical shape (TPC-H
    * Q1 flavored). stddev of 1 sample: Spark NaN → normalized to NULL to
    * match ANSI/DuckDB. */
  val qAggStats = Q("q_agg_stats",
    (spark, sfDir) => {
      import spark.implicits._
      def noNaN(c: org.apache.spark.sql.Column) =
        when(isnan(c), lit(null)).otherwise(c)
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum($"l_quantity".cast("decimal(18,6)")), 6)
            .cast("double").as("sum_qty"),
          round(avg($"l_extendedprice"), 6).as("avg_price"),
          round(noNaN(stddev_samp($"l_extendedprice")), 6)
            .as("stdev_price"),
          round(avg(log($"l_extendedprice" + 0.5)), 6).as("avg_log_price"),
          round(noNaN(stddev_samp(log($"l_extendedprice" + 0.5))), 6)
            .as("stdev_log_price"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |       count(*) AS n_rows,
           |       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS sum_qty,
           |       round(avg(l_extendedprice), 6) AS avg_price,
           |       round(stddev_samp(l_extendedprice), 6) AS stdev_price,
           |       round(avg(ln(l_extendedprice + 0.5)), 6)
           |         AS avg_log_price,
           |       round(stddev_samp(ln(l_extendedprice + 0.5)), 6)
           |         AS stdev_log_price
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** A4: conditional aggregation — the severe-vs-all split columns. */
  val qAggConditional = Q("q_agg_conditional",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val o = Tables.read(spark, sfDir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(
          count(when($"o_orderstatus" === "F", 1)).as("n_finished"),
          count(when($"o_orderstatus" === "O", 1)).as("n_open"),
          countDistinct(when($"o_totalprice" > 100000, $"o_custkey"))
            .as("n_big_spenders"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
           |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           |  count(DISTINCT CASE WHEN o_totalprice > 100000
           |    THEN o_custkey END) AS n_big_spenders
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** A5: grouping sets / cube with `'all'` relabeling — the Demographics
    * output shape (counts per (segment × nation) plus `all` rows per
    * dimension), the reference's most distinctive aggregation. */
  val qAggGroupingSets = Q("q_agg_grouping_sets",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val n = Tables.read(spark, sfDir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .cube($"c_mktsegment", $"n_name")
        .agg(countDistinct($"c_custkey").as("n_customers"),
          grouping($"c_mktsegment").as("g_seg"),
          grouping($"n_name").as("g_nat"))
        .select(
          when($"g_seg" === 1, "all").otherwise($"c_mktsegment")
            .as("segment"),
          when($"g_nat" === 1, "all").otherwise($"n_name").as("nation"),
          $"n_customers")
        .orderBy($"segment", $"nation")
    },
    Some("""SELECT
           |  CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'all'
           |       ELSE c_mktsegment END AS segment,
           |  CASE WHEN GROUPING(n_name) = 1 THEN 'all'
           |       ELSE n_name END AS nation,
           |  count(DISTINCT c_custkey) AS n_customers
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY CUBE (c_mktsegment, n_name)
           |ORDER BY segment, nation""".stripMargin))

  /** A7: scalar (global, no-group) aggregation. */
  val qAggGlobal = Q("q_agg_global",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders").agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"),
        to_date(min($"o_orderdate")).as("first_date"),
        to_date(max($"o_orderdate")).as("last_date"),
        round(sum($"o_totalprice".cast("decimal(18,6)")), 6)
          .cast("double").as("total_price"))
    },
    Some("""SELECT count(*) AS n_orders,
           |       count(DISTINCT o_custkey) AS n_customers,
           |       CAST(min(o_orderdate) AS DATE) AS first_date,
           |       CAST(max(o_orderdate) AS DATE) AS last_date,
           |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS total_price
           |FROM orders""".stripMargin))

  /** W1: cumulative window over ordered dates, partitioned by priority so
    * the window shuffles on the partition key (never single-partition
    * over fact-sized data; the per-key frames are small daily rows). */
  val qWindowCumulative = Q("q_window_cumulative",
    (spark, sfDir) => {
      import spark.implicits._
      val daily = Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority", to_date($"o_orderdate").as("d"))
        .agg(round(sum($"o_totalprice".cast("decimal(18,6)")), 6)
          .cast("double").as("day_rev"))
      val w = Window.partitionBy($"o_orderpriority").orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select($"o_orderpriority", $"d",
          round(sum($"day_rev".cast("decimal(18,6)")).over(w), 6)
            .cast("double").as("cum_rev"))
        .orderBy($"o_orderpriority", $"d")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
           |         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))),
           |           6) AS DOUBLE) AS day_rev
           |  FROM orders GROUP BY 1, 2
           |)
           |SELECT o_orderpriority, d,
           |  CAST(round(sum(CAST(day_rev AS DECIMAL(18,6))) OVER (
           |    PARTITION BY o_orderpriority ORDER BY d
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           |    AS DOUBLE) AS cum_rev
           |FROM daily ORDER BY o_orderpriority, d""".stripMargin))

  /** W3: moving average over a 7-row frame per key. */
  val qWindowMovingAvg = Q("q_window_moving_avg",
    (spark, sfDir) => {
      import spark.implicits._
      val daily = Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority", to_date($"o_orderdate").as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"o_orderpriority").orderBy($"d")
        .rowsBetween(-6, Window.currentRow)
      daily.select($"o_orderpriority", $"d",
          round(avg($"n").over(w), 6).as("ma7"))
        .orderBy($"o_orderpriority", $"d")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
           |         count(*) AS n
           |  FROM orders GROUP BY 1, 2
           |)
           |SELECT o_orderpriority, d,
           |  round(avg(n) OVER (PARTITION BY o_orderpriority ORDER BY d
           |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
           |FROM daily ORDER BY o_orderpriority, d""".stripMargin))

  /** W4: lead/lag — day-over-day deltas per key. */
  val qWindowLag = Q("q_window_lag",
    (spark, sfDir) => {
      import spark.implicits._
      val daily = Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority", to_date($"o_orderdate").as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"o_orderpriority").orderBy($"d")
      daily.select($"o_orderpriority", $"d", $"n",
          ($"n" - coalesce(lag($"n", 1).over(w), lit(0L)))
            .as("delta_vs_prev"))
        .orderBy($"o_orderpriority", $"d")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
           |         count(*) AS n
           |  FROM orders GROUP BY 1, 2
           |)
           |SELECT o_orderpriority, d, n,
           |  n - COALESCE(lag(n, 1) OVER (PARTITION BY o_orderpriority
           |    ORDER BY d), 0) AS delta_vs_prev
           |FROM daily ORDER BY o_orderpriority, d""".stripMargin))

  /** R1: EAV → wide pivot (the Phase 2 LocalPatientClinicalCourse shape):
    * per user, one column per event_type. Pivot values are declared so no
    * discovery job runs (at 100 TB an unbounded pivot would scan twice). */
  val qPivotEav = Q("q_pivot_eav",
    (spark, sfDir) => {
      import spark.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.read(spark, sfDir, "events")
        .groupBy($"user_id")
        .pivot("event_type", types)
        .count()
      types.foldLeft(p)((df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id,
           |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           |  count(CASE WHEN event_type = 'purchase' THEN 1 END)
           |    AS purchase,
           |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** R2: unpivot / melt wide measures to long rows (output_as_columns=0
    * flattening). stack() is a generator — no shuffle, row-local. */
  val qUnpivot = Q("q_unpivot",
    (spark, sfDir) => {
      Tables.read(spark, sfDir, "part")
        .selectExpr("p_partkey",
          """stack(2,
            |  'retailprice', p_retailprice,
            |  'size', CAST(p_size AS DOUBLE)) AS (measure, val)"""
            .stripMargin)
        .orderBy(col("p_partkey"), col("measure"))
    },
    Some("""SELECT p_partkey, 'retailprice' AS measure,
           |       p_retailprice AS val FROM part
           |UNION ALL
           |SELECT p_partkey, 'size' AS measure,
           |       CAST(p_size AS DOUBLE) AS val FROM part
           |ORDER BY p_partkey, measure""".stripMargin))

  /** W2b: the full ranking-function family over one window — rank,
    * dense_rank, ntile, percent_rank, cume_dist (the reference's
    * first/ordinal-event patterns use row_number/rank; the quantile
    * bucketing ntile gives is the cohort-quartile shape). The ORDER BY
    * carries the o_orderkey tiebreaker so every function is total-order
    * deterministic across engines (the rank-flip lesson from round 2).
    * One window spec → one shuffle on o_orderpriority; all five
    * functions evaluate in the same Window physical operator. */
  val qWindowRank = Q("q_window_rank",
    (spark, sfDir) => {
      import spark.implicits._
      val o = Tables.read(spark, sfDir, "orders")
        .filter($"o_totalprice" > 300000)
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      o.select($"o_orderpriority", $"o_orderkey",
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey,
           |       rank() OVER w AS rnk,
           |       dense_rank() OVER w AS drnk,
           |       ntile(4) OVER w AS quartile,
           |       round(percent_rank() OVER w, 6) AS pct_rank,
           |       round(cume_dist() OVER w, 6) AS cdist
           |FROM orders WHERE o_totalprice > 300000
           |WINDOW w AS (PARTITION BY o_orderpriority
           |             ORDER BY o_totalprice DESC, o_orderkey)
           |ORDER BY o_orderpriority, o_orderkey""".stripMargin))

  /** A3b: exact interpolated percentiles per group (the lab-value
    * quartile/median summaries 4CE sites report). Spark `percentile`
    * and DuckDB `quantile_cont` share the lower+(upper−lower)·frac
    * interpolation, so values hash-match after the standard 6-dp
    * round. Exact percentile sorts within each group — right up to
    * groups of ~10⁸ rows; beyond that approx_percentile (q_agg_approx)
    * is the scale path. */
  val qAggPercentile = Q("q_agg_percentile",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5D)"), 6).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9D)"), 6).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.95D)"), 6)
            .as("p95_price"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |       round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
           |       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           |       round(quantile_cont(l_extendedprice, 0.95), 6)
           |         AS p95_price
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  /** W2c: frame-navigation window values — first_value / last_value /
    * nth_value over the FULL partition frame (UNBOUNDED..UNBOUNDED;
    * last_value under the default frame is the current row, the
    * classic silent bug — the explicit frame is the point). Per
    * customer: first, latest and second order price by order date.
    * Same single-shuffle Window shape as q_window_rank. */
  val qWindowFirstLast = Q("q_window_first_last",
    (spark, sfDir) => {
      import spark.implicits._
      val frame = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      Tables.read(spark, sfDir, "orders")
        .select($"o_custkey", $"o_orderkey",
          first($"o_totalprice").over(frame).as("first_price"),
          last($"o_totalprice").over(frame).as("last_price"),
          nth_value($"o_totalprice", 2).over(frame).as("second_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |       first_value(o_totalprice) OVER w AS first_price,
           |       last_value(o_totalprice) OVER w AS last_price,
           |       nth_value(o_totalprice, 2) OVER w AS second_price
           |FROM orders
           |WINDOW w AS (PARTITION BY o_custkey
           |             ORDER BY o_orderdate, o_orderkey
           |             ROWS BETWEEN UNBOUNDED PRECEDING
           |               AND UNBOUNDED FOLLOWING)
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** A3c: bivariate statistics per group — corr / covar_samp /
    * covar_pop (the lab-value-vs-severity association summaries a 4CE
    * analysis runs). Both engines use the co-moment formulation;
    * 6-dp rounding absorbs partial-aggregation float drift, same as
    * the stddev family in q_agg_stats. */
  val qAggCorr = Q("q_agg_corr",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(corr($"l_quantity", $"l_extendedprice"), 6)
            .as("corr_qty_price"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 6)
            .as("covar_s"),
          round(covar_pop($"l_quantity", $"l_extendedprice"), 6)
            .as("covar_p"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |       round(corr(l_quantity, l_extendedprice), 6)
           |         AS corr_qty_price,
           |       round(covar_samp(l_quantity, l_extendedprice), 6)
           |         AS covar_s,
           |       round(covar_pop(l_quantity, l_extendedprice), 6)
           |         AS covar_p
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  /** A8: array aggregation with a DETERMINISTIC order — collect_list
    * alone is partition-order-dependent (a silent flake at scale), so
    * the list is sorted then joined to a string, which also sidesteps
    * engine array-rendering differences in the comparator. Small
    * groups only (≤ a few hundred elements); an unbounded collect is
    * an anti-pattern at 100 TB — aggregate instead. */
  val qAggCollect = Q("q_agg_collect",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .filter($"o_custkey" < 50)
        .groupBy($"o_custkey")
        .agg(
          concat_ws(",", transform(sort_array(collect_list($"o_orderkey")),
            x => x.cast("string"))).as("orderkeys"),
          count(lit(1)).as("n"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey,
           |       array_to_string(list_transform(
           |         list_sort(list(o_orderkey)),
           |         x -> CAST(x AS VARCHAR)), ',') AS orderkeys,
           |       count(*) AS n
           |FROM orders WHERE o_custkey < 50
           |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin))

  /** A9: boolean and bitwise aggregates — bool_and / bool_or (the
    * every/any per-group predicates a QC stage runs) and count_if,
    * plus bit_or folding per-row flags into a group bitmask (the
    * compact "which event types did this user ever produce" encoding).
    * All are plain partial-aggregable functions — map-side combine,
    * one shuffle. */
  val qAggBoolBit = Q("q_agg_bool_bit",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          bool_and($"o_totalprice" > 1000).as("all_over_1k"),
          bool_or($"o_totalprice" > 400000).as("any_over_400k"),
          count_if($"o_orderstatus" === "F").as("n_finished"),
          bit_or(
            when($"o_orderstatus" === "F", 1)
              .when($"o_orderstatus" === "O", 2)
              .otherwise(4)).as("status_mask"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |       bool_and(o_totalprice > 1000) AS all_over_1k,
           |       bool_or(o_totalprice > 400000) AS any_over_400k,
           |       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
           |       bit_or(CASE WHEN o_orderstatus = 'F' THEN 1
           |                   WHEN o_orderstatus = 'O' THEN 2
           |                   ELSE 4 END) AS status_mask
           |FROM orders GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  // ---------------------------------------------------- winsorization
  /** Percentile-clamped outlier handling (winsorization) — the
    * standard robust-statistics pass before averaging heavy-tailed
    * metrics (or normalizing training features): per event type, clamp
    * values into [p05, p95] computed by EXACT interpolated percentile
    * (the E9-proven `percentile` ↔ `quantile_cont` pair), then
    * aggregate the clamped series. Two passes by construction — the
    * clamp bounds need the full distribution — but the first pass
    * reduces to a 5-row bounds table broadcast back into a scan-side
    * probe, so winsorizing 100 TB is one aggregation plus one
    * broadcast-joined scan, never a re-shuffle of the fact. Clamped
    * sums go through decimal(18,6) like every money-sum in the suite:
    * order-independent, so the hash compare cannot be broken by
    * partition-order float addition. */
  val qWinsorize = Q("q_winsorize",
    (spark, sfDir) => {
      import spark.implicits._
      val ev = Tables.read(spark, sfDir, "events")
      val bounds = ev.groupBy($"event_type")
        .agg(expr("percentile(value, 0.05D)").as("lo"),
          expr("percentile(value, 0.95D)").as("hi"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .select($"event_type",
          least(greatest($"value", $"lo"), $"hi").as("w"),
          $"lo", $"hi")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          // min, not first: constant per group, min has no
          // order-sensitivity caveat
          round(min($"lo"), 6).as("lo"),
          round(min($"hi"), 6).as("hi"),
          round(sum($"w".cast("decimal(18,6)")), 6)
            .cast("double").as("sum_winsorized"),
          round(min($"w"), 6).as("min_w"),
          round(max($"w"), 6).as("max_w"))
        .orderBy($"event_type")
    },
    Some("""WITH b AS (
           |  SELECT event_type,
           |         quantile_cont(value, 0.05) AS lo,
           |         quantile_cont(value, 0.95) AS hi
           |  FROM events GROUP BY event_type
           |)
           |SELECT e.event_type, count(*) AS n,
           |       round(min(b.lo), 6) AS lo,
           |       round(min(b.hi), 6) AS hi,
           |       CAST(round(sum(CAST(
           |         least(greatest(e.value, b.lo), b.hi)
           |         AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_winsorized,
           |       round(min(least(greatest(e.value, b.lo), b.hi)), 6)
           |         AS min_w,
           |       round(max(least(greatest(e.value, b.lo), b.hi)), 6)
           |         AS max_w
           |FROM events e JOIN b ON e.event_type = b.event_type
           |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin))

  // ------------------------------------------------------ resampling
  /** Time-bucket resampling with the BATCH `window()` function — the
    * batch half of the tumbling-window story (T1 proves it streaming):
    * downsample the event series to fixed 6-hour buckets per type, the
    * metrics/telemetry reduction every dashboard pipeline runs. The
    * bucket is emitted as epoch seconds (`w.start` cast to long) so
    * the oracle can replicate the epoch-aligned bucketing with integer
    * arithmetic instead of engine-specific timestamp-bucket functions
    * (whose alignment origins differ). One map-side-combinable
    * aggregation — resampling 100 TB is a single shuffle on
    * (bucket, type), and the decimal-cast sum keeps the compare
    * order-independent. */
  val qResample = Q("q_resample",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .groupBy(window($"ts", "6 hours").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast("decimal(18,6)")), 6)
            .cast("double").as("sum_value"))
        .select($"w.start".cast("long").as("bucket_secs"),
          $"event_type", $"n", $"sum_value")
        .orderBy($"bucket_secs", $"event_type")
    },
    Some("""WITH ev AS (
           |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
           |           AS BIGINT) AS secs,
           |         event_type, value
           |  FROM events
           |)
           |SELECT secs - (secs % 21600) AS bucket_secs,
           |       event_type, count(*) AS n,
           |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS sum_value
           |FROM ev GROUP BY 1, 2
           |ORDER BY bucket_secs, event_type""".stripMargin))

  // ------------------------------------------------ batch sessions
  /** Batch `session_window` — the built-in gap-merged session
    * aggregation in BATCH mode (T3 proves it streaming; q_sessionize
    * proves the manual lag/cumsum construction): per user, events
    * within 30 minutes of each other merge into one session row.
    * Bounds are emitted as epoch MICROSECONDS (`start` = first event,
    * `end` = last event + gap, exactly the session_window contract)
    * so the oracle can rebuild them with integer arithmetic from the
    * sessionize SQL — a session boundary off by one event fails the
    * hash on start, end, AND count. Same single user-key shuffle as
    * the manual form; the merge itself is a sort within the
    * partition. */
  val qAggSessionWindow = Q("q_agg_session_window",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .groupBy(session_window($"ts", "30 minutes").as("w"),
          $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id",
          unix_micros($"w.start").as("start_us"),
          unix_micros($"w.end").as("end_us"), $"n")
        .orderBy($"user_id", $"start_us")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           |         event_id
           |  FROM events
           |), marked AS (
           |  SELECT user_id, us, event_id,
           |    CASE WHEN lag(us) OVER w IS NULL OR
           |      us - lag(us) OVER w >= 1800000000
           |    THEN 1 ELSE 0 END AS new_s
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
           |), sess AS (
           |  SELECT user_id, us,
           |    sum(new_s) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS sid
           |  FROM marked
           |)
           |SELECT user_id, min(us) AS start_us,
           |       max(us) + 1800000000 AS end_us, count(*) AS n
           |FROM sess GROUP BY user_id, sid
           |ORDER BY user_id, start_us""".stripMargin))

  /** E98: linear-regression aggregate family — regr_slope / intercept /
    * r2 / count / avgx / avgy per group, the one-pass OLS fit every
    * monitoring or drift-detection stage runs per segment (price-vs-
    * quantity per return flag here; the reference's shape is lab value
    * vs days-since-admission per cohort). All six are single-pass
    * co-moment aggregates (sums of x, y, x², xy) — partial-aggregable,
    * map-side combine, ONE shuffle on the group key, same plan class
    * as A3/E10; at 100 TB this is the cheapest possible fit (no
    * iteration, no matrix solve). Slope/intercept magnitudes here are
    * O(10²–10⁴), so round(…, 4) keeps parity against DuckDB's
    * independently-ordered accumulation while still pinning ~9
    * significant digits; r2 ∈ [0,1] rounds at 6. regr_count casts to
    * BIGINT on both sides (engines disagree on its return type). */
  val qAggRegression = Q("q_agg_regression",
    (spark, sfDir) => {
      import spark.implicits._
      val x = $"l_quantity"
      val y = $"l_extendedprice"
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          regr_count(y, x).cast("long").as("n_pairs"),
          round(regr_slope(y, x), 4).as("slope"),
          round(regr_intercept(y, x), 4).as("intercept"),
          round(regr_r2(y, x), 6).as("r2"),
          round(regr_avgx(y, x), 6).as("avg_x"),
          round(regr_avgy(y, x), 4).as("avg_y"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
           |         AS n_pairs,
           |       round(regr_slope(l_extendedprice, l_quantity), 4)
           |         AS slope,
           |       round(regr_intercept(l_extendedprice, l_quantity), 4)
           |         AS intercept,
           |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           |       round(regr_avgx(l_extendedprice, l_quantity), 6)
           |         AS avg_x,
           |       round(regr_avgy(l_extendedprice, l_quantity), 4)
           |         AS avg_y
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  /** E114: **CUSUM change-point detection** — the monitoring operator
    * that finds WHERE a per-series daily metric shifted: cumulative
    * sum of deviations from the series mean drifts away from zero and
    * peaks (in absolute value) at the most likely change-point — the
    * standard offline CUSUM estimator. Three stages, all narrow after
    * the first: (1) the fact table collapses to per-(series, day)
    * DECIMAL sums — the ONLY fact-sized shuffle, and exact integer
    * arithmetic so both engines see bit-identical daily values;
    * (2) per-series mean = total/count computed from the exact decimal
    * total cast to double ONCE (not a windowed float avg, whose
    * accumulation order is engine-dependent), broadcast back —
    * series count is domain-bounded; (3) one ordered window per
    * series accumulates the running deviation and one ranking window
    * takes the argmax of |cusum| ROUNDED to 6 places with the day as
    * tiebreak — so an engine pair disagreeing in the 1e-12 tail of a
    * windowed float sum cannot flip the reported change-point. At
    * 100 TB the per-day grain is ~10⁴ rows per series regardless of
    * fact volume: everything after stage 1 is dimension-sized. */
  val qChangePoint = Q("q_change_point",
    (spark, sfDir) => {
      import spark.implicits._
      val daily = Tables.read(spark, sfDir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(sum($"value".cast("decimal(18,6)")).as("x_dec"))
      val means = daily.groupBy($"event_type")
        .agg(sum($"x_dec").as("tot_dec"), count(lit(1)).as("n_days"))
        .select($"event_type",
          ($"tot_dec".cast("double") / $"n_days").as("mean_x"),
          $"n_days")
      val wOrd = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = daily.join(broadcast(means), "event_type")
        .withColumn("dev", $"x_dec".cast("double") - $"mean_x")
        .withColumn("cusum", sum($"dev").over(wOrd))
        .withColumn("r", row_number().over(
          Window.partitionBy($"event_type")
            .orderBy(abs(round($"cusum", 6)).desc, $"day")))
      ranked.filter($"r" === 1)
        .select($"event_type", $"day".as("cp_day"),
          round(abs($"cusum"), 4).as("max_abs_cusum"), $"n_days")
        .orderBy($"event_type")
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |         sum(CAST(value AS DECIMAL(18,6))) AS x_dec
           |  FROM events GROUP BY 1, 2
           |), means AS (
           |  SELECT event_type,
           |         CAST(sum(x_dec) AS DOUBLE) / count(*) AS mean_x,
           |         count(*) AS n_days
           |  FROM daily GROUP BY event_type
           |), cus AS (
           |  SELECT d.event_type, d.day, m.n_days,
           |    sum(CAST(d.x_dec AS DOUBLE) - m.mean_x) OVER (
           |      PARTITION BY d.event_type ORDER BY d.day
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cusum
           |  FROM daily d JOIN means m USING (event_type)
           |), ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY event_type
           |    ORDER BY abs(round(cusum, 6)) DESC, day) AS r
           |  FROM cus
           |)
           |SELECT event_type, day AS cp_day,
           |       round(abs(cusum), 4) AS max_abs_cusum, n_days
           |FROM ranked WHERE r = 1 ORDER BY event_type""".stripMargin))

  /** E118: **Spearman rank correlation** — the robust complement to
    * E10's Pearson family: monotone association that ignores outliers
    * and nonlinear-but-monotone scales (exactly what a quality-score
    * vs. engagement audit wants when one axis is heavy-tailed).
    * Neither engine ships a Spearman aggregate, so it is composed
    * from primitives BOTH engines define identically — and, unlike a
    * float-accumulating `corr`, every intermediate here is EXACT
    * integer arithmetic:
    *
    *   - tie-corrected average rank, doubled so it stays integral:
    *     2·avgrank = 2·rank_min + (ties−1) = rank_min + rank_max
    *     (one `rank()` window + one `count()` over the value
    *     partition — no joins);
    *   - Pearson on the doubled ranks via the five raw sums
    *     (n, Σu, Σv, Σuv, Σu², Σv²) in DECIMAL(38,0) — the ×2 scale
    *     cancels in the ratio, and integer sums are
    *     accumulation-order-independent, so AQE re-partitioning can
    *     never flip a bit;
    *   - ONE double division + sqrt at the output edge, rounded 6dp.
    *
    * Shape: two rank windows (one shuffle each on the group key — at
    * 100 TB these are sort-based and spill-safe) then one hash agg.
    * The denominator sums fit DECIMAL(38,0) up to ~10⁹ rows per
    * group; beyond that the documented path is the KLL sketch (E61)
    * feeding approximate ranks. */
  val qAggSpearman = Q("q_agg_spearman",
    (spark, sfDir) => {
      import spark.implicits._
      val base = Tables.read(spark, sfDir, "lineitem")
        .select($"l_returnflag".as("g"), $"l_quantity".as("x"),
          $"l_extendedprice".as("y"))
      val u = (lit(2) * rank().over(Window.partitionBy($"g").orderBy($"x"))
        + count(lit(1)).over(Window.partitionBy($"g", $"x")) - 1)
        .cast("decimal(38,0)")
      val v = (lit(2) * rank().over(Window.partitionBy($"g").orderBy($"y"))
        + count(lit(1)).over(Window.partitionBy($"g", $"y")) - 1)
        .cast("decimal(38,0)")
      base.withColumn("u", u).withColumn("v", v)
        .groupBy($"g")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum($"u").as("su"), sum($"v").as("sv"),
          sum($"u" * $"v").as("suv"),
          sum($"u" * $"u").as("su2"), sum($"v" * $"v").as("sv2"))
        .select($"g".as("l_returnflag"), $"n".cast("long").as("n"),
          round(($"n" * $"suv" - $"su" * $"sv").cast("double") /
            sqrt(($"n" * $"su2" - $"su" * $"su").cast("double") *
              ($"n" * $"sv2" - $"sv" * $"sv").cast("double")), 6)
            .as("rho_spearman"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH ranked AS (
           |  SELECT l_returnflag AS g,
           |    CAST(2 * rank() OVER (PARTITION BY l_returnflag
           |           ORDER BY l_quantity)
           |       + count(*) OVER (PARTITION BY l_returnflag, l_quantity)
           |       - 1 AS HUGEINT) AS u,
           |    CAST(2 * rank() OVER (PARTITION BY l_returnflag
           |           ORDER BY l_extendedprice)
           |       + count(*) OVER (PARTITION BY l_returnflag,
           |           l_extendedprice)
           |       - 1 AS HUGEINT) AS v
           |  FROM lineitem
           |), sums AS (
           |  SELECT g, CAST(count(*) AS HUGEINT) AS n,
           |         sum(u) AS su, sum(v) AS sv, sum(u * v) AS suv,
           |         sum(u * u) AS su2, sum(v * v) AS sv2
           |  FROM ranked GROUP BY g
           |)
           |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           |  round(CAST(n * suv - su * sv AS DOUBLE) /
           |    sqrt(CAST(n * su2 - su * su AS DOUBLE) *
           |         CAST(n * sv2 - sv * sv AS DOUBLE)), 6)
           |    AS rho_spearman
           |FROM sums ORDER BY l_returnflag""".stripMargin))

  /** E124: **exact ROC-AUC** — the evaluation aggregate for any scored
    * binary outcome (does `value` predict a purchase?): AUC equals the
    * Mann-Whitney U statistic, so it is computable EXACTLY from ranks —
    * no curve discretization, no trapezoids. Same integer discipline as
    * Spearman (E118): doubled tie-averaged ranks u = 2·rank_min +
    * ties − 1 keep every intermediate integral, and
    * AUC = (Σu⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) does ONE double division at
    * the edge, rounded 6dp — accumulation-order-independent, so AQE
    * cannot flip a bit. The rank window is GLOBAL (one sort) — correct
    * here and honest about scale: at 100 TB the documented path is
    * per-key AUC (add partitionBy) or KLL-sketch (E61) approximate
    * ranks; a single global exact AUC over 10¹² rows is a sort-merge
    * any engine must pay for. */
  val qAuc = Q("q_auc",
    (spark, sfDir) => {
      import spark.implicits._
      val scored = Tables.read(spark, sfDir, "events")
        .select($"value".as("s"),
          ($"event_type" === "purchase").cast("int").as("y"))
      val u = (lit(2) * rank().over(Window.orderBy($"s"))
        + count(lit(1)).over(Window.partitionBy($"s")) - 1).cast("long")
      scored.withColumn("u", u)
        .agg(sum($"y").cast("long").as("n_pos"),
          sum(lit(1) - $"y").cast("long").as("n_neg"),
          sum(when($"y" === 1, $"u")).cast("long").as("su_pos"))
        .select($"n_pos", $"n_neg",
          round(($"su_pos" - $"n_pos" * ($"n_pos" + 1)).cast("double") /
            ($"n_pos" * $"n_neg" * 2L).cast("double"), 6).as("auc"))
    },
    Some("""WITH scored AS (
           |  SELECT value AS s,
           |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           |  FROM events
           |), ranked AS (
           |  SELECT y,
           |    CAST(2 * rank() OVER (ORDER BY s)
           |       + count(*) OVER (PARTITION BY s) - 1 AS BIGINT) AS u
           |  FROM scored
           |), sums AS (
           |  SELECT CAST(sum(y) AS BIGINT) AS n_pos,
           |         CAST(sum(1 - y) AS BIGINT) AS n_neg,
           |         CAST(sum(CASE WHEN y = 1 THEN u END) AS BIGINT)
           |           AS su_pos
           |  FROM ranked
           |)
           |SELECT n_pos, n_neg,
           |  round(CAST(su_pos - n_pos * (n_pos + 1) AS DOUBLE) /
           |        CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc
           |FROM sums""".stripMargin))

  /** E129: **rolling-window distinct (trailing 7-day active users)** —
    * the metric COUNT DISTINCT cannot window: distinct is not
    * partial-aggregable across frames, so `count(distinct) OVER
    * (RANGE 6 PRECEDING)` either doesn't exist (Spark) or degenerates
    * to per-frame rescans. The linear reformulation: each distinct
    * (user, day) CONTRIBUTES to the 7 windows it falls in — explode
    * a bounded k=7 day sequence (a fixed fan-out, not a range
    * self-join whose cost is data-dependent), then ONE count-distinct
    * per window day. Cost is exactly 7× the user-day table — known in
    * advance, skew-free, and the user-day table is already the
    * collapsed grain (the fact-sized distinct is the only big
    * shuffle). The trailing edge clips to the observed span via a
    * 1-row bounds broadcast. At 100 TB the same shape holds for any
    * k ≤ a few dozen; beyond that the HLL rollup family (E44) is the
    * pinned path (mergeable sketches ARE window-summable). */
  val qRollingDistinct = Q("q_rolling_distinct",
    (spark, sfDir) => {
      import spark.implicits._
      val ud = Tables.read(spark, sfDir, "events")
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val span = ud.agg(min($"day").as("d0"), max($"day").as("d1"))
      ud.select($"user_id",
          explode(sequence($"day", date_add($"day", 6))).as("wday"))
        .crossJoin(broadcast(span))
        .filter($"wday".between($"d0", $"d1"))
        .groupBy($"wday".as("day"))
        .agg(countDistinct($"user_id").as("n_active_7d"))
        .orderBy($"day")
    },
    Some("""WITH ud AS (
           |  SELECT DISTINCT user_id,
           |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
           |  FROM events
           |), span AS (
           |  SELECT min(day) AS d0, max(day) AS d1 FROM ud
           |), contrib AS (
           |  SELECT user_id,
           |    CAST(unnest(generate_series(day, day + 6,
           |      INTERVAL 1 DAY)) AS DATE) AS wday
           |  FROM ud
           |)
           |SELECT wday AS day,
           |       count(DISTINCT user_id) AS n_active_7d
           |FROM contrib, span
           |WHERE wday BETWEEN d0 AND d1
           |GROUP BY wday ORDER BY wday""".stripMargin))

  /** E132: **EWMA smoothing (truncated, renormalized)** — the
    * time-series operator dashboards and anomaly baselines run over
    * every daily metric. The contract is pinned as the K=20-term
    * truncated EWMA with α=0.3, weights renormalized over the lags
    * actually available (so the series start is unbiased instead of
    * anchored on x₀): s_t = Σₖ wₖ·x_{t−k} / Σₖ wₖ, wₖ = α(1−α)ᵏ.
    * Why truncated: the exact recursive EWMA is a sequential scan
    * (unexpressible as a frame aggregate without either recursion or
    * a (1−α)⁻ʲ rescaling whose magnitudes explode past double
    * precision on long series); at (1−α)²⁰ ≈ 0.08% the tail is far
    * below the 6dp output rounding, and the truncated form is a
    * FIXED 20-term dot product — shallow, frame-bounded, and
    * engine-order-independent in practice because all terms share a
    * magnitude. Parity discipline: the weight literals are computed
    * ONCE in Scala and embedded into the oracle SQL via
    * `CAST('<shortest-roundtrip-repr>' AS DOUBLE)` (a bare decimal
    * literal in DuckDB is DECIMAL — the E117 trap), and both engines
    * sum the terms in the same left-to-right order. Shape: one
    * fact-sized shuffle to (series, day), then K lag windows over the
    * dimension-sized daily frame — one sort, K column reads. */
  val qEwma = Q("q_ewma",
    (spark, sfDir) => {
      import spark.implicits._
      val (alpha, k) = (0.3, 20)
      val daily = Tables.read(spark, sfDir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg((sum($"value".cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("x"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val terms = (0 until k).map { i =>
        val wt = alpha * math.pow(1 - alpha, i)
        (coalesce(lag($"x", i).over(w) * wt, lit(0.0)),
          when(lag($"x", i).over(w).isNotNull, lit(wt))
            .otherwise(lit(0.0)))
      }
      daily
        .withColumn("ewma", round(
          terms.map(_._1).reduce(_ + _) /
            terms.map(_._2).reduce(_ + _), 6))
        .select($"event_type", $"day", round($"x", 6).as("x"), $"ewma")
        .orderBy($"event_type", $"day")
    },
    Some {
      val (alpha, k) = (0.3, 20)
      def d(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
      val num = (0 until k).map { i =>
        val wt = alpha * math.pow(1 - alpha, i)
        s"coalesce(lag(x, $i) OVER win * ${d(wt)}, ${d(0.0)})"
      }.mkString("(", " + ", ")")
      val den = (0 until k).map { i =>
        val wt = alpha * math.pow(1 - alpha, i)
        s"CASE WHEN lag(x, $i) OVER win IS NOT NULL THEN ${d(wt)} ELSE ${d(0.0)} END"
      }.mkString("(", " + ", ")")
      s"""WITH daily AS (
         |  SELECT event_type,
         |         CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |           / count(*) AS x
         |  FROM events GROUP BY 1, 2
         |), smoothed AS (
         |  SELECT event_type, day, x,
         |         round($num / $den, 6) AS ewma
         |  FROM daily
         |  WINDOW win AS (PARTITION BY event_type ORDER BY day)
         |)
         |SELECT event_type, day, round(x, 6) AS x, ewma
         |FROM smoothed ORDER BY event_type, day""".stripMargin
    })

  /** E135: **feature scaling (z-score + min-max)** — the ML
    * preprocessing pass every tabular feature pipeline runs before
    * training. Parity discipline: the group statistics come from
    * EXACT decimal sums (Σx in DECIMAL(18,6), Σx² via the decimal
    * product in DECIMAL(38,12) — both order-independent), and the
    * variance is assembled as (n·Σx² − (Σx)²)/(n(n−1)) in decimal
    * with ONE double sqrt at the edge — never `stddev_samp`, whose
    * float accumulation order differs per engine/partitioning. The
    * 5-row stats frame broadcasts back onto the fact scan (zero extra
    * fact shuffles: one agg pass + one broadcast-joined scan pass),
    * which is exactly the 100 TB shape — statistics are
    * dimension-sized, scaling is embarrassingly row-local. */
  val qFeatureScale = Q("q_feature_scale",
    (spark, sfDir) => {
      import spark.implicits._
      val dec = $"value".cast("decimal(18,6)")
      val stats = Tables.read(spark, sfDir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum(dec).as("s"),
          sum(dec * dec).as("s2"),
          min($"value").as("lo"), max($"value").as("hi"))
        .select($"event_type",
          ($"s".cast("double") / $"n").as("mu"),
          sqrt(($"n" * $"s2" - $"s" * $"s").cast("double") /
            ($"n" * ($"n" - 1))).as("sigma"),
          $"lo", $"hi")
      Tables.read(spark, sfDir, "events")
        .join(broadcast(stats), "event_type")
        .select($"event_id", $"event_type",
          round(($"value" - $"mu") / $"sigma", 6).as("z"),
          round(($"value" - $"lo") / ($"hi" - $"lo"), 6).as("mm"))
        .orderBy($"event_id")
    },
    Some("""WITH stats AS (
           |  SELECT event_type, count(*) AS n,
           |         sum(CAST(value AS DECIMAL(18,6))) AS s,
           |         sum(CAST(value AS DECIMAL(18,6)) *
           |             CAST(value AS DECIMAL(18,6))) AS s2,
           |         min(value) AS lo, max(value) AS hi
           |  FROM events GROUP BY event_type
           |), params AS (
           |  SELECT event_type,
           |    CAST(s AS DOUBLE) / n AS mu,
           |    sqrt(CAST(n * s2 - s * s AS DOUBLE) / (n * (n - 1)))
           |      AS sigma,
           |    lo, hi
           |  FROM stats
           |)
           |SELECT event_id, event_type,
           |       round((value - mu) / sigma, 6) AS z,
           |       round((value - lo) / (hi - lo), 6) AS mm
           |FROM events JOIN params USING (event_type)
           |ORDER BY event_id""".stripMargin))

  /** E136: **log-space means (geometric + harmonic)** — the two
    * Pythagorean means beyond AVG: the geometric mean is the right
    * average for multiplicative quantities (growth rates, the
    * perplexity↔mean-log-prob bridge E112 rides), the harmonic mean
    * for rates (it IS the F1 shape). GM via exp(avg(ln x)) — the only
    * numerically sane form (Π x overflows instantly); HM via
    * n/Σ(1/x). Float sums of same-magnitude terms, 6dp rounding; both
    * are plain partial-aggregable one-shuffle aggregates. Domain
    * guard: positive-only input pinned by filter, since ln/reciprocal
    * poison on zero. */
  val qAggLogMeans = Q("q_agg_log_means",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "lineitem")
        .filter($"l_quantity" > 0)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(avg($"l_quantity"), 6).as("am"),
          round(exp(avg(log($"l_quantity"))), 6).as("gm"),
          round(count(lit(1)) / sum(lit(1.0) / $"l_quantity"), 6)
            .as("hm"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n,
           |       round(avg(l_quantity), 6) AS am,
           |       round(exp(avg(ln(l_quantity))), 6) AS gm,
           |       round(count(*) / sum(CAST(1 AS DOUBLE) / l_quantity),
           |         6) AS hm
           |FROM lineitem WHERE l_quantity > 0
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** E137: **weighted median** — the robust center when rows carry
    * unequal mass (price per unit weighted by units; latency weighted
    * by request count): smallest value whose cumulative weight
    * reaches half the total. Exact-integer execution: weights cast to
    * LONG, ONE cumulative-sum window under a TOTAL order (value, then
    * the row's primary key — ties cannot flip the pick), partition
    * total from the same sort via an unbounded frame, and the pick is
    * min(value WHERE 2·cum ≥ tot) — the lower weighted median,
    * pinned. One sort shuffle per group key; at 100 TB the documented
    * approximate path is the KLL family (E61), which supports
    * weighted updates. */
  val qAggWeightedMedian = Q("q_agg_weighted_median",
    (spark, sfDir) => {
      import spark.implicits._
      val ord = Window.partitionBy($"l_returnflag")
        .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
      val base = Tables.read(spark, sfDir, "lineitem")
        .select($"l_returnflag", $"l_extendedprice", $"l_orderkey",
          $"l_linenumber", $"l_quantity".cast("long").as("wt"))
        .withColumn("cum", sum($"wt").over(
          ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot", sum($"wt").over(
          Window.partitionBy($"l_returnflag")))
      base.groupBy($"l_returnflag")
        .agg(min(when($"cum" * 2 >= $"tot", $"l_extendedprice"))
          .as("w_median"),
          max($"tot").as("total_weight"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH ranked AS (
           |  SELECT l_returnflag, l_extendedprice,
           |    CAST(l_quantity AS BIGINT) AS wt,
           |    sum(CAST(l_quantity AS BIGINT)) OVER (
           |      PARTITION BY l_returnflag
           |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cum,
           |    sum(CAST(l_quantity AS BIGINT)) OVER (
           |      PARTITION BY l_returnflag) AS tot
           |  FROM lineitem
           |)
           |SELECT l_returnflag,
           |       min(CASE WHEN cum * 2 >= tot
           |                THEN l_extendedprice END) AS w_median,
           |       CAST(max(tot) AS BIGINT) AS total_weight
           |FROM ranked GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  /** E143: **concentration metrics (Gini + top-share)** — how
    * unequally is spend distributed over customers: the Gini
    * coefficient from the sorted-rank identity
    * G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) plus the top-1% revenue share —
    * the whale-dependence metrics every marketplace and the corpus-
    * curation "how much of the data is one source" audit share. All
    * inputs exact: per-customer totals are DECIMAL sums, ranks are
    * one ranking window (ties carry equal x, so swapping tied ranks
    * cannot change Σi·xᵢ — ordering is total anyway via the customer
    * key), i·xᵢ is long×decimal, and the two ratios are the only
    * doubles, at the edge. The top-1% cutoff is ⌈n/100⌉ by (spend
    * DESC, custkey) — a deterministic count, not a percentile
    * estimate. Shape: one fact shuffle to customer grain, one sort of
    * the customer frame, two scalar aggregates. */
  val qGini = Q("q_gini",
    (spark, sfDir) => {
      import spark.implicits._
      val spend = Tables.read(spark, sfDir, "orders")
        .groupBy($"o_custkey")
        .agg(sum($"o_totalprice".cast("decimal(18,6)")).as("x"))
      val asc = Window.orderBy($"x", $"o_custkey")
      val desc = Window.orderBy($"x".desc, $"o_custkey")
      spend
        .withColumn("i", row_number().over(asc))
        .withColumn("r", row_number().over(desc))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"i" * $"x").as("six"),
          sum(when($"r" <= ceil($"nn" / 100.0), $"x")).as("top_x"))
        .select($"n",
          round((lit(2) * $"six" - ($"n" + 1) * $"sx").cast("double") /
            ($"n" * $"sx").cast("double"), 6).as("gini"),
          round($"top_x".cast("double") / $"sx", 6)
            .as("top1pct_share"))
    },
    Some("""WITH spend AS (
           |  SELECT o_custkey,
           |         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS x
           |  FROM orders GROUP BY o_custkey
           |), ranked AS (
           |  SELECT x,
           |    row_number() OVER (ORDER BY x, o_custkey) AS i,
           |    row_number() OVER (ORDER BY x DESC, o_custkey) AS r,
           |    count(*) OVER () AS nn
           |  FROM spend
           |)
           |SELECT count(*) AS n,
           |  round(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x)
           |      AS DOUBLE) /
           |    CAST(count(*) * sum(x) AS DOUBLE), 6) AS gini,
           |  round(CAST(sum(CASE WHEN r <= ceil(nn / 100.0)
           |      THEN x END) AS DOUBLE) /
           |    CAST(sum(x) AS DOUBLE), 6) AS top1pct_share
           |FROM ranked""".stripMargin))

  /** E151: **calibration curve (reliability diagram)** — the second
    * ML-eval aggregate beside AUC (E124 ranks; this asks whether the
    * score MEANS what it says): decile the scores, and per decile
    * report mean score vs observed positive rate — divergence is
    * miscalibration. Determinism: the decile cut is `ntile(10)` under
    * a TOTAL order (score, event_id) — the E146 discipline, since
    * tied scores may not wander between deciles across runs; mean
    * score routes through DECIMAL; the positive rate is one double
    * division on exact counts. One global sort (same honesty note as
    * E124: per-key calibration adds partitionBy; sketch ranks at
    * extreme scale), one 10-row rollup. */
  val qCalibration = Q("q_calibration",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .select($"value".as("s"), $"event_id",
          ($"event_type" === "purchase").cast("long").as("y"))
        .withColumn("decile",
          ntile(10).over(Window.orderBy($"s", $"event_id")))
        .groupBy($"decile")
        .agg(count(lit(1)).as("n"),
          (sum($"s".cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("raw_mean"),
          sum($"y").as("n_pos"))
        .select($"decile", $"n", round($"raw_mean", 6).as("mean_score"),
          round($"n_pos".cast("double") / $"n", 6).as("pos_rate"))
        .orderBy($"decile")
    },
    Some("""WITH scored AS (
           |  SELECT value AS s, event_id,
           |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           |      AS y,
           |    CAST(ntile(10) OVER (ORDER BY value, event_id)
           |      AS INTEGER) AS decile
           |  FROM events
           |)
           |SELECT decile, count(*) AS n,
           |  round(CAST(sum(CAST(s AS DECIMAL(18,6))) AS DOUBLE)
           |    / count(*), 6) AS mean_score,
           |  round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate
           |FROM scored GROUP BY decile ORDER BY decile""".stripMargin))

  /** E153: **tail risk (VaR + expected shortfall)** — the pair every
    * risk report carries: the p95 cut (VaR) and the MEAN of the tail
    * beyond it (CVaR/expected shortfall — coherent where VaR is not).
    * The cut comes from the exact interpolated percentile both
    * engines define identically; the tail mean routes through DECIMAL
    * so accumulation order cannot move it; the tail membership test
    * compares raw doubles against the unrounded cut — safe because an
    * interpolated quantile either equals a data value exactly (tie or
    * integral index: identical on both engines) or lies strictly
    * between two data values, where a 1-ulp disagreement cannot
    * change membership. Per-group percentile + one broadcast-back
    * filter pass; at 100 TB the cut comes from KLL (E61) and the same
    * second pass stands. */
  val qCvar = Q("q_cvar",
    (spark, sfDir) => {
      import spark.implicits._
      val cut = Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.95D)").as("var95"))
      Tables.read(spark, sfDir, "lineitem")
        .join(broadcast(cut), "l_returnflag")
        .filter($"l_extendedprice" >= $"var95")
        .groupBy($"l_returnflag")
        .agg(round(first($"var95"), 6).as("var95"),
          count(lit(1)).as("n_tail"),
          round(sum($"l_extendedprice".cast("decimal(18,6)"))
            .cast("double") / count(lit(1)), 6).as("cvar95"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH cut AS (
           |  SELECT l_returnflag,
           |         quantile_cont(l_extendedprice, 0.95) AS var95
           |  FROM lineitem GROUP BY l_returnflag
           |)
           |SELECT l_returnflag,
           |       round(any_value(var95), 6) AS var95,
           |       count(*) AS n_tail,
           |       round(CAST(sum(CAST(l_extendedprice
           |           AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
           |         AS cvar95
           |FROM lineitem JOIN cut USING (l_returnflag)
           |WHERE l_extendedprice >= var95
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** E173: **statistical mode (deterministic tiebreak)** — the one
    * Pythagorean-family gap left (E9 medians, E136 means): the most
    * frequent value per group. Neither engine's built-in `mode` pins
    * tie behavior (Spark's and DuckDB's docs both leave equal-count
    * ties implementation-defined — a latent cross-engine flake), so
    * the operator is the explicit two-agg form: count per (group,
    * value), then a (count DESC, value ASC) total-order pick — ties
    * go to the SMALLEST value, by contract, on both engines. Two
    * hash aggs + a dimension-sized window; at 100 TB the heavy-hitter
    * sketch (E51 CMS) is the approximate path. */
  val qAggMode = Q("q_agg_mode",
    (spark, sfDir) => {
      import spark.implicits._
      val w = Window.partitionBy($"l_returnflag")
        .orderBy($"cnt".desc, $"l_quantity")
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag", $"l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"l_returnflag", $"l_quantity".as("mode_qty"),
          $"cnt".as("n_at_mode"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH counts AS (
           |  SELECT l_returnflag, l_quantity, count(*) AS cnt
           |  FROM lineitem GROUP BY 1, 2
           |), ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
           |    ORDER BY cnt DESC, l_quantity) AS rk
           |  FROM counts
           |)
           |SELECT l_returnflag, l_quantity AS mode_qty,
           |       cnt AS n_at_mode
           |FROM ranked WHERE rk = 1
           |ORDER BY l_returnflag""".stripMargin))

  /** E292: **ordered string aggregation (LISTAGG)** — the SQL:2016
    * `LISTAGG(x, delim) WITHIN GROUP (ORDER BY ...)` surface Spark 4
    * added, the report-building "roll the group into one display
    * string" aggregate (distinct from E11's array collect: the output
    * IS the delimited string, and the standard spelling is what BI
    * tools emit). Determinism is the entire trick for an
    * order-sensitive aggregate: the WITHIN GROUP order must be a
    * TOTAL order on the aggregated values, so the query rolls the
    * DISTINCT nation names per market segment (unique by
    * construction) and the oracle is DuckDB's
    * `string_agg(... ORDER BY ...)` — same order, same delimiter,
    * byte-identical strings. The pre-agg bounds every group at ≤25
    * elements; LISTAGG over unbounded groups is the documented
    * anti-pattern (collect_list's caveats apply doubly to strings). */
  val qAggListagg = Q("q_agg_listagg",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "customer")
        .join(Tables.read(spark, sfDir, "nation"),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_mktsegment", $"n_name").agg(count(lit(1)).as("n"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_nations"),
          expr("listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)")
            .as("nations"))
        .orderBy($"c_mktsegment")
    },
    Some("""WITH per AS (
           |  SELECT c_mktsegment, n_name, count(*) AS n
           |  FROM customer JOIN nation ON c_nationkey = n_nationkey
           |  GROUP BY 1, 2
           |)
           |SELECT c_mktsegment, count(*) AS n_nations,
           |  string_agg(n_name, '|' ORDER BY n_name) AS nations
           |FROM per GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin))

  /** E296: **dynamic-gap session window** — `session_window` with a
    * PER-EVENT gap expression (views time out after 10 minutes,
    * everything else after 30), the Spark feature the fixed-gap row
    * (E85) doesn't touch and the semantics worth pinning: each event
    * extends its session to [ts, ts+gap(event)), sessions merge while
    * they overlap, and an event landing exactly ON the current end
    * starts a NEW session (half-open). The oracle replays that rule
    * with the global-cummax trick: sorted per user, event i starts a
    * session iff tsᵢ ≥ max_{j<i}(tsⱼ+gapⱼ) — the per-session reset is
    * provably unnecessary (once some k satisfies the break, every
    * earlier end is ≤ tsₖ ≤ tsᵢ), so one running-max window computes
    * the exact merge chain. Both sides work in epoch-µs integers;
    * session_window's (start, end) = (min ts, max ts+gap) falls out
    * of the same grouping on the oracle side. */
  val qAggSessionDynamic = Q("q_agg_session_dynamic",
    (spark, sfDir) => {
      import spark.implicits._
      val gap = when($"event_type" === "view", lit("10 minutes"))
        .otherwise(lit("30 minutes"))
      Tables.read(spark, sfDir, "events")
        .groupBy($"user_id", session_window($"ts", gap).as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          unix_micros($"w.start").as("start_us"),
          unix_micros($"w.end").as("end_us"), $"n_events")
        .orderBy($"user_id", $"start_us")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           |    CASE WHEN event_type = 'view'
           |      THEN 600000000 ELSE 1800000000 END AS gap_us
           |  FROM events
           |), marked AS (
           |  SELECT user_id, us, gap_us,
           |    CASE WHEN max(us + gap_us) OVER (
           |        PARTITION BY user_id ORDER BY us
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      IS NULL THEN 1
           |    WHEN us >= max(us + gap_us) OVER (
           |        PARTITION BY user_id ORDER BY us
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      THEN 1 ELSE 0 END AS new_s
           |  FROM ev
           |), sessions AS (
           |  SELECT user_id, us, gap_us,
           |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS sid
           |  FROM marked
           |)
           |SELECT user_id, min(us) AS start_us,
           |  max(us + gap_us) AS end_us,
           |  count(*) AS n_events
           |FROM sessions GROUP BY user_id, sid
           |ORDER BY user_id, start_us""".stripMargin))

  /** E308: **approx-percentile accuracy audit** — the sketch-trust
    * readout for quantiles, completing the audit family (E227 does it
    * for MinHash, E44/E51 for HLL/CMS): per event type, the exact
    * interpolated p50/p90 (hash-gated against DuckDB's
    * `quantile_cont`, the same type-7 definition Spark's `percentile`
    * uses) next to `approx_percentile` (KLL-style, accuracy
    * parameter 1000 → rank error ≤ 1/1000), verified by the
    * GUARANTEE ITSELF, in rank space: the approx value's realized
    * rank fraction must sit within q ± (1/1000 + tie slack). Value-
    * space error would be the wrong check (a flat region makes huge
    * value error legal, a dense region makes tiny error illegal);
    * rank space is what the sketch promises. The realized ranks need
    * one extra conditional pass over the rows with the per-group
    * approx values joined back — a broadcast of a groups-sized frame.
    * Oracle emits `TRUE` for the bound flags (the E44 driver-gated
    * pattern: the sketch is Spark-side state no other engine can
    * replay; exact columns are the hash gate, flags are the audit). */
  val qQuantileAccuracy = Q("q_quantile_accuracy",
    (spark, sfDir) => {
      import spark.implicits._
      val ev = Tables.read(spark, sfDir, "events")
        .select($"event_type", $"value")
      val stats = ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          percentile($"value", lit(0.5)).as("p50_exact"),
          percentile($"value", lit(0.9)).as("p90_exact"),
          approx_percentile($"value", lit(0.5), lit(1000)).as("a50"),
          approx_percentile($"value", lit(0.9), lit(1000)).as("a90"))
      ev.join(broadcast(stats), Seq("event_type"))
        .groupBy($"event_type")
        .agg(first($"n").as("n"),
          first($"p50_exact").as("e50"), first($"p90_exact").as("e90"),
          (sum(($"value" <= $"a50").cast("long")) /
            first($"n").cast("double")).as("r50"),
          (sum(($"value" <= $"a90").cast("long")) /
            first($"n").cast("double")).as("r90"))
        .select($"event_type", $"n",
          round($"e50", 6).as("p50_exact"),
          round($"e90", 6).as("p90_exact"),
          (abs($"r50" - 0.5) <= 0.011).as("p50_within_bound"),
          (abs($"r90" - 0.9) <= 0.011).as("p90_within_bound"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  round(quantile_cont(value, 0.5), 6) AS p50_exact,
           |  round(quantile_cont(value, 0.9), 6) AS p90_exact,
           |  TRUE AS p50_within_bound,
           |  TRUE AS p90_within_bound
           |FROM events GROUP BY event_type
           |ORDER BY event_type""".stripMargin))

  val all: Seq[Q] = Seq(qAggCountDistinct, qAggMinFirst, qAggStats,
    qAggConditional, qAggGroupingSets, qAggGlobal, qWindowCumulative,
    qWindowMovingAvg, qWindowLag, qPivotEav, qUnpivot, qWindowRank,
    qAggPercentile, qWindowFirstLast, qAggCorr, qAggCollect, qAggBoolBit,
    qWinsorize, qResample, qAggSessionWindow, qAggRegression,
    qChangePoint, qAggSpearman, qAuc, qRollingDistinct, qEwma,
    qFeatureScale, qAggLogMeans, qAggWeightedMedian, qGini,
    qCalibration, qCvar, qAggMode, qAggListagg, qAggSessionDynamic,
    qQuantileAccuracy)
}
