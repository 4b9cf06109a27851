package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core breadth (SURVEY.md §2.1–2.3, 2.6, 2.7): the scan /
  * filter / join / sort / set-op patterns the reference exercises on the
  * i2b2 star schema, re-expressed on the TPC-H-ish harness tables.
  *
  * Scale notes (100 TB): every dim-side join below (`part`, `nation`,
  * `region`, code lists) is explicitly `broadcast()` — the reference's
  * code-map pattern [SURVEY.md §4.1] — so no fact-side shuffle happens
  * for dimension enrichment. Fact⋈fact joins (orders⋈lineitem,
  * customer⋈orders) carry their natural equi keys and sort-merge; AQE
  * skew-join splitting is enabled in Sessions. Filters sit directly on
  * scans so parquet pushdown prunes row groups.
  */
object Relational {

  /** S2/P2: selective code-list scan — fact filter from a small IN list
    * (the reference's `concept_cd IN (SELECT local_code …)` pattern). */
  val qScanFilterIn = Q("q_scan_filter_in",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "lineitem")
        .filter($"l_returnflag".isin("R", "A") &&
          $"l_quantity" > 25 && $"l_discount".between(0.02, 0.08))
        .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
          $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           |       l_discount
           |FROM lineitem
           |WHERE l_returnflag IN ('R','A') AND l_quantity > 25
           |  AND l_discount BETWEEN 0.02 AND 0.08
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** S3/P3: metadata LIKE scan — the reference's
    * `concept_path LIKE '\ACT\%'` local-code discovery. */
  val qFilterLike = Q("q_filter_like",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "part")
        .filter($"p_type".like("%AND%") && $"p_size".between(5, 25))
        .select($"p_partkey", $"p_name", $"p_type", $"p_size")
        .orderBy($"p_partkey")
    },
    // '%AND%' matches the fixture's STANDARD rows (13/135/1386 rows at
    // sf0.001/0.01/0.1), so the LIKE actually selects — a never-true
    // pattern would prove pushdown but not evaluation.
    Some("""SELECT p_partkey, p_name, p_type, p_size
           |FROM part
           |WHERE p_type LIKE '%AND%' AND p_size BETWEEN 5 AND 25
           |ORDER BY p_partkey""".stripMargin))

  /** J1: inner equi join, fact⋈fact on the natural key (sort-merge at
    * scale; both sides shuffle once on o_custkey). */
  val qJoinInnerEqui = Q("q_join_inner_equi",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val o = Tables.read(spark, sfDir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice".cast("decimal(18,6)")), 6)
            .cast("double").as("total_price"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
           |       count(*) AS n_orders,
           |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS total_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** J2: broadcast dim join — the code-map pattern; `broadcast()` is
    * explicit so the plan is a BroadcastHashJoin with no fact shuffle. */
  val qJoinBroadcastDim = Q("q_join_broadcast_dim",
    (spark, sfDir) => {
      import spark.implicits._
      val l = Tables.read(spark, sfDir, "lineitem")
      val p = Tables.read(spark, sfDir, "part")
        .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy($"p_brand")
        .agg(round(sum($"l_quantity".cast("decimal(18,6)")), 6)
            .cast("double").as("sum_qty"),
          countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"p_brand")
    },
    Some("""SELECT p_brand,
           |       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS sum_qty,
           |       count(DISTINCT l_orderkey) AS n_orders
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  /** J3: left outer join keeping unmatched left rows (patients without a
    * death_date in the reference), null-filled via coalesce. */
  val qJoinLeftOuter = Q("q_join_left_outer",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val o = Tables.read(spark, sfDir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy($"c_custkey", $"c_mktsegment")
        .agg(count($"o_orderkey").as("n_orders"),
          coalesce(round(sum($"o_totalprice".cast("decimal(18,6)")), 6)
            .cast("double"), lit(0.0)).as("total_price"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment,
           |       count(o_orderkey) AS n_orders,
           |       COALESCE(CAST(round(sum(CAST(o_totalprice AS
           |         DECIMAL(18,6))), 6) AS DOUBLE), 0.0) AS total_price
           |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |GROUP BY c_custkey, c_mktsegment
           |ORDER BY c_custkey""".stripMargin))

  /** J4: semi join — EXISTS-shaped cohort membership. left_semi keeps the
    * probe side narrow (no row multiplication, no payload columns). */
  val qJoinSemi = Q("q_join_semi",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val o = Tables.read(spark, sfDir, "orders")
        .filter($"o_orderstatus" === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment
           |FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey
           |                AND o.o_orderstatus = 'O')
           |ORDER BY c_custkey""".stripMargin))

  /** J5: anti join — NOT EXISTS exclusions. The right side is filtered
    * to high-value orders so unmatched customers exist at every sf
    * (3/30/308 rows at sf0.001/0.01/0.1) — an unfiltered right side
    * matches every customer and the anti join never emits a row. */
  val qJoinAnti = Q("q_join_anti",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val o = Tables.read(spark, sfDir, "orders")
        .filter($"o_totalprice" > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
           |FROM customer c
           |WHERE NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND o.o_totalprice > 300000)
           |ORDER BY c_custkey""".stripMargin))

  /** J3b: FULL OUTER join — reconciliation of two partial views where
    * unmatched rows on BOTH sides carry meaning (the reference's
    * pattern: site patient roster vs registry extract, each missing
    * rows the other has). Sides are filtered so both null-sides are
    * non-empty at every sf (2/12/147 building-only and 110/1142/11442
    * hi-only at sf0.001/0.01/0.1 — the vacuity lesson from VERDICT
    * r3): BUILDING-segment customers vs per-customer counts of
    * >350k-value orders. Equi-keyed, so Catalyst plans a shuffled SMJ
    * (full outer can't broadcast) — shuffle on the join key is the
    * plan you want at scale. */
  // ------------------------------------------------ null-safe join
  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * semantics corner plain equi joins silently drop: a NULL join key
    * never matches under `=`, so rows with an unknown key vanish from
    * both sides; null-safe equality treats NULL as a real key value
    * (NULL matches NULL, exactly once per pairing). The fixture nulls
    * one event type and joins even-id against odd-id aggregates, so
    * the NULL bucket must appear in the result — an engine that
    * degrades `<=>` to `=` loses that row and fails parity. Spark
    * still plans this as a HASH-keyed join (null-safe equality is a
    * supported hash key via coalesce-tagging), not a nested loop —
    * the global PlanSuite sweeps lock that. Null ordering is pinned
    * explicitly (NULLS FIRST) because the engines' defaults differ. */
  val qJoinNullSafe = Q("q_join_null_safe",
    (spark, sfDir) => {
      import spark.implicits._
      val ev = Tables.read(spark, sfDir, "events")
        .select($"event_id",
          expr("nullif(event_type, 'error')").as("k"))
      val a = ev.filter($"event_id" % 2 === 0)
        .groupBy($"k").agg(count(lit(1)).as("n_even"))
      val b = ev.filter($"event_id" % 2 === 1)
        .groupBy($"k").agg(count(lit(1)).as("n_odd"))
      a.as("a").join(b.as("b"), $"a.k" <=> $"b.k")
        .select($"a.k".as("k"), $"n_even", $"n_odd")
        .orderBy($"k".asc_nulls_first)
    },
    Some("""WITH e AS (
           |  SELECT event_id, nullif(event_type, 'error') AS k
           |  FROM events
           |), a AS (
           |  SELECT k, count(*) AS n_even FROM e
           |  WHERE event_id % 2 = 0 GROUP BY k
           |), b AS (
           |  SELECT k, count(*) AS n_odd FROM e
           |  WHERE event_id % 2 = 1 GROUP BY k
           |)
           |SELECT a.k, n_even, n_odd
           |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
           |ORDER BY a.k NULLS FIRST""".stripMargin))

  val qJoinFullOuter = Q("q_join_full_outer",
    (spark, sfDir) => {
      import spark.implicits._
      val b = Tables.read(spark, sfDir, "customer")
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey", $"c_name")
      val hi = Tables.read(spark, sfDir, "orders")
        .filter($"o_totalprice" > 350000)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_hi"))
      b.join(hi, b("c_custkey") === hi("o_custkey"), "full_outer")
        .select(
          coalesce(b("c_custkey"), hi("o_custkey")).as("custkey"),
          b("c_name").as("c_name"),
          coalesce($"n_hi", lit(0L)).as("n_hi"),
          b("c_custkey").isNull.as("only_hi"),
          hi("o_custkey").isNull.as("only_building"))
        .orderBy($"custkey")
    },
    Some("""WITH hi AS (
           |  SELECT o_custkey, count(*) AS n_hi FROM orders
           |  WHERE o_totalprice > 350000 GROUP BY 1
           |), b AS (
           |  SELECT c_custkey, c_name FROM customer
           |  WHERE c_mktsegment = 'BUILDING'
           |)
           |SELECT COALESCE(b.c_custkey, hi.o_custkey) AS custkey,
           |       b.c_name AS c_name,
           |       COALESCE(n_hi, 0) AS n_hi,
           |       b.c_custkey IS NULL AS only_hi,
           |       hi.o_custkey IS NULL AS only_building
           |FROM b FULL OUTER JOIN hi ON b.c_custkey = hi.o_custkey
           |ORDER BY custkey""".stripMargin))

  /** J6: range/interval join with the equi key carried (the reference's
    * admission-within-[pos−7,pos+14] pattern): lineitems shipped within
    * 30 days of their order's date. Equi key l_orderkey=o_orderkey makes
    * Catalyst plan SMJ + post-filter, never a nested-loop join. */
  val qJoinRange = Q("q_join_range",
    (spark, sfDir) => {
      import spark.implicits._
      val o = Tables.read(spark, sfDir, "orders")
      val l = Tables.read(spark, sfDir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_lineitems"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
           |       count(*) AS n_lineitems,
           |       count(DISTINCT o_orderkey) AS n_orders
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  AND l_shipdate >= o_orderdate
           |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** J7/W2: as-of / first-event-per-key via row_number — the reference's
    * first-positive-test. Tiebreaker o_orderkey gives a total order. */
  val qJoinAsof = Q("q_join_asof",
    (spark, sfDir) => {
      import spark.implicits._
      val o = Tables.read(spark, sfDir, "orders")
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      o.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey".as("first_orderkey"),
          to_date($"o_orderdate").as("first_order_date"),
          $"o_totalprice".as("first_order_price"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey AS first_orderkey,
           |       CAST(o_orderdate AS DATE) AS first_order_date,
           |       o_totalprice AS first_order_price
           |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
           |        ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
           |WHERE rn = 1 ORDER BY o_custkey""".stripMargin))

  /** E102: as-of join WITH TOLERANCE — for every purchase, the same
    * user's most recent view at-or-before it, but only if within 2
    * hours; otherwise the match columns are NULL (an unbounded as-of
    * would attribute a purchase to a week-old view — the tolerance is
    * what makes attribution/sensor-alignment semantics correct).
    *
    * Implementation is the TAGGED-UNION window, not a range join: tag
    * views 0 / purchases 1, ONE window per user ordered (ts, kind,
    * event_id) — views sort before purchases on ts ties, so "at-or-
    * before" is exact — and `last(view_ts) IGNORE NULLS` carries the
    * running most-recent view to each purchase row. ONE shuffle on
    * user_id, state O(1) per row; the range-join formulation (J6/E3)
    * would expand every purchase × candidate-view pair first. This is
    * THE scalable as-of at 100 TB: linear scan per key, no candidate
    * blowup, skew bounded by the hottest single user. The tolerance
    * is a post-filter on the carried gap — applied AFTER the as-of
    * match, so a >2h previous view yields NULL, not the next-older
    * in-window view (standard as-of-tolerance semantics: nearest
    * match or nothing). DuckDB oracle mirrors the identical window
    * (its native ASOF JOIN has no tolerance or tiebreak contract). */
  val qJoinAsofTolerance = Q("q_join_asof_tolerance",
    (spark, sfDir) => {
      import spark.implicits._
      val tolUs = 2L * 3600L * 1000000L
      val tagged = Tables.read(spark, sfDir, "events")
        .filter($"event_type".isin("view", "purchase"))
        .select($"user_id", $"ts", $"event_id",
          when($"event_type" === "view", 0).otherwise(1).as("kind"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"kind", $"event_id")
      tagged
        .withColumn("prev_view_id",
          last(when($"kind" === 0, $"event_id"), ignoreNulls = true)
            .over(w))
        .withColumn("prev_view_us",
          last(when($"kind" === 0, unix_micros($"ts")),
            ignoreNulls = true).over(w))
        .filter($"kind" === 1)
        .withColumn("gap_us", unix_micros($"ts") - $"prev_view_us")
        .select($"event_id".as("purchase_id"), $"user_id",
          unix_micros($"ts").as("purchase_us"),
          when($"gap_us" <= tolUs, $"prev_view_id").as("view_id"),
          when($"gap_us" <= tolUs, $"gap_us").as("gap_us"))
        .orderBy($"purchase_id")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           |         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END
           |           AS kind
           |  FROM events WHERE event_type IN ('view', 'purchase')
           |), carried AS (
           |  SELECT user_id, ts, event_id, kind,
           |    last_value(CASE WHEN kind = 0 THEN event_id END
           |      IGNORE NULLS) OVER w AS prev_view_id,
           |    last_value(CASE WHEN kind = 0 THEN epoch_us(ts) END
           |      IGNORE NULLS) OVER w AS prev_view_us
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id
           |    ORDER BY ts, kind, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |)
           |SELECT event_id AS purchase_id, user_id,
           |       epoch_us(ts) AS purchase_us,
           |       CASE WHEN epoch_us(ts) - prev_view_us <= 7200000000
           |         THEN prev_view_id END AS view_id,
           |       CASE WHEN epoch_us(ts) - prev_view_us <= 7200000000
           |         THEN epoch_us(ts) - prev_view_us END AS gap_us
           |FROM carried WHERE kind = 1
           |ORDER BY purchase_id""".stripMargin))

  /** J9: multi-way star join — fact ⋈ two dim chains, exactly the
    * fact⋈patient_dim⋈visit_dim⋈code-map shape. Dims broadcast; Catalyst
    * ReorderJoin + AQE pick the final order. */
  val qJoinStar = Q("q_join_star",
    (spark, sfDir) => {
      import spark.implicits._
      val l = Tables.read(spark, sfDir, "lineitem")
      val o = Tables.read(spark, sfDir, "orders")
      val c = Tables.read(spark, sfDir, "customer")
      val n = Tables.read(spark, sfDir, "nation")
      val r = Tables.read(spark, sfDir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
            .cast("decimal(18,6)")), 6).cast("double").as("revenue"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"r_name", $"n_name")
    },
    Some("""SELECT r_name, n_name,
           |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
           |         AS DECIMAL(18,6))), 6) AS DOUBLE) AS revenue,
           |       count(DISTINCT o_orderkey) AS n_orders
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin))

  /** A6: distinct / dropDuplicates. */
  val qDistinct = Q("q_distinct",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "lineitem")
        .select($"l_returnflag", $"l_linestatus")
        .distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT DISTINCT l_returnflag, l_linestatus
           |FROM lineitem
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** O1: global sort (range-partitioned exchange + per-partition sort). */
  val qSortOutput = Q("q_sort_output",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice, o_orderpriority
           |FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin))

  /** O2: top-k — Spark plans TakeOrderedAndProject (per-partition heap +
    * single merge, no global sort). Tiebreaker makes the k-set stable. */
  val qTopk = Q("q_topk",
    (spark, sfDir) => {
      import spark.implicits._
      val o = Tables.read(spark, sfDir, "orders")
      o.groupBy($"o_custkey")
        .agg(round(sum($"o_totalprice".cast("decimal(18,6)")), 6)
          .cast("double").as("total_spent"))
        .orderBy($"total_spent".desc, $"o_custkey")
        .limit(10)
    },
    Some("""SELECT o_custkey,
           |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS total_spent
           |FROM orders GROUP BY o_custkey
           |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin))

  /** U1: UNION ALL of two labeled branches (the reference's ICD9/ICD10
    * branch assembly). unionByName for positional safety. */
  val qSetUnionAll = Q("q_set_union_all",
    (spark, sfDir) => {
      import spark.implicits._
      val o = Tables.read(spark, sfDir, "orders")
      val hi = o.filter($"o_totalprice" > 200000)
        .select(lit("high").as("bucket"), $"o_orderkey", $"o_totalprice")
      val lo = o.filter($"o_totalprice" < 10000)
        .select(lit("low").as("bucket"), $"o_orderkey", $"o_totalprice")
      hi.unionByName(lo).orderBy($"bucket", $"o_orderkey")
    },
    Some("""SELECT 'high' AS bucket, o_orderkey, o_totalprice
           |FROM orders WHERE o_totalprice > 200000
           |UNION ALL
           |SELECT 'low' AS bucket, o_orderkey, o_totalprice
           |FROM orders WHERE o_totalprice < 10000
           |ORDER BY bucket, o_orderkey""".stripMargin))

  /** U2: INTERSECT (distinct semantics on both engines). */
  val qSetIntersect = Q("q_set_intersect",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val o = Tables.read(spark, sfDir, "orders")
      val building = c.filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("custkey"))
      val withOrders = o.select($"o_custkey".as("custkey"))
      building.intersect(withOrders).orderBy($"custkey")
    },
    Some("""SELECT c_custkey AS custkey FROM customer
           |WHERE c_mktsegment = 'BUILDING'
           |INTERSECT
           |SELECT o_custkey AS custkey FROM orders
           |ORDER BY custkey""".stripMargin))

  /** U3: EXCEPT (distinct semantics on both engines). Both sides are
    * filtered so the difference is non-empty at every sf (3/39/393 rows
    * at sf0.001/0.01/0.1) — customer-minus-all-order-custkeys is empty
    * because every fixture customer has orders. */
  val qSetExcept = Q("q_set_except",
    (spark, sfDir) => {
      import spark.implicits._
      val c = Tables.read(spark, sfDir, "customer")
      val o = Tables.read(spark, sfDir, "orders")
      c.filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey".as("custkey"))
        .except(o.filter($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("custkey")))
        .orderBy($"custkey")
    },
    Some("""SELECT c_custkey AS custkey FROM customer
           |WHERE c_mktsegment = 'BUILDING'
           |EXCEPT
           |SELECT o_custkey AS custkey FROM orders
           |WHERE o_orderpriority = '1-URGENT'
           |ORDER BY custkey""".stripMargin))

  /** S4: single-column concatenated output (the reference's
    * output_as_columns=0 mode). */
  val qOutputConcat = Q("q_output_concat",
    (spark, sfDir) => {
      import spark.implicits._
      val n = Tables.read(spark, sfDir, "nation")
      val r = Tables.read(spark, sfDir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(concat_ws("|", $"r_name", $"n_name",
          $"n_nationkey".cast("string")).as("line"))
        .orderBy($"line")
    },
    Some("""SELECT concat_ws('|', r_name, n_name,
           |         CAST(n_nationkey AS VARCHAR)) AS line
           |FROM nation JOIN region ON n_regionkey = r_regionkey
           |ORDER BY line""".stripMargin))

  /** U1b: union across DRIFTED schemas — the append every long-lived
    * pipeline eventually needs when an extract gains a column.
    * `unionByName(allowMissingColumns = true)` aligns by NAME (plain
    * UNION ALL is positional and would silently mis-align) and
    * null-fills the column the old extract lacks; DuckDB's
    * `UNION ALL BY NAME` is the oracle's exact counterpart. Both
    * "versions" scan with their own pushed filter and pruned schema —
    * drift handling costs no extra shuffle. */
  val qSetUnionByName = Q("q_set_union_by_name",
    (spark, sfDir) => {
      import spark.implicits._
      val o = Tables.read(spark, sfDir, "orders")
      val v1 = o.filter(year($"o_orderdate") < 1996)
        .select($"o_orderkey", $"o_totalprice")
      val v2 = o.filter(year($"o_orderdate") >= 1996)
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(coalesce($"o_orderpriority", lit("unknown"))
          .as("priority"))
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,6)")), 6)
            .cast("double").as("total"))
        .orderBy($"priority")
    },
    Some("""WITH u AS (
           |  SELECT o_orderkey, o_totalprice FROM orders
           |  WHERE year(o_orderdate) < 1996
           |  UNION ALL BY NAME
           |  SELECT o_orderkey, o_totalprice, o_orderpriority
           |  FROM orders WHERE year(o_orderdate) >= 1996
           |)
           |SELECT COALESCE(o_orderpriority, 'unknown') AS priority,
           |       count(*) AS n,
           |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))),
           |         6) AS DOUBLE) AS total
           |FROM u GROUP BY 1 ORDER BY priority""".stripMargin))

  /** U2b/U3b: MULTISET set operations — `intersectAll` / `exceptAll`
    * keep duplicate multiplicity (min / difference of per-row counts),
    * where the U2/U3 set forms collapse to distinct rows. The
    * post-aggregation makes multiplicity visible in the output (the
    * per-key counts differ from what the set forms would give) and
    * keeps the result compact and totally ordered. Spark plans these
    * as an aggregate-join-generate (sum of signed counts → replicate),
    * all shuffle-on-key — no sort, scale-safe. */
  val qSetExceptAll = Q("q_set_except_all",
    (spark, sfDir) => {
      import spark.implicits._
      val l = Tables.read(spark, sfDir, "lineitem")
      val a = l.filter($"l_returnflag" === "A").select($"l_partkey")
      val r = l.filter($"l_returnflag" === "R").select($"l_partkey")
      a.exceptAll(r)
        .groupBy($"l_partkey").agg(count(lit(1)).as("n_surplus"))
        .orderBy($"l_partkey")
    },
    Some("""SELECT l_partkey, count(*) AS n_surplus
           |FROM (
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
           |  EXCEPT ALL
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
           |)
           |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin))

  val qSetIntersectAll = Q("q_set_intersect_all",
    (spark, sfDir) => {
      import spark.implicits._
      val l = Tables.read(spark, sfDir, "lineitem")
      val a = l.filter($"l_returnflag" === "A").select($"l_partkey")
      val r = l.filter($"l_returnflag" === "R").select($"l_partkey")
      a.intersectAll(r)
        .groupBy($"l_partkey").agg(count(lit(1)).as("n_common"))
        .orderBy($"l_partkey")
    },
    Some("""SELECT l_partkey, count(*) AS n_common
           |FROM (
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
           |  INTERSECT ALL
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
           |)
           |GROUP BY l_partkey ORDER BY l_partkey""".stripMargin))

  val all: Seq[Q] = Seq(qScanFilterIn, qFilterLike, qJoinInnerEqui,
    qJoinBroadcastDim, qJoinLeftOuter, qJoinFullOuter, qJoinNullSafe,
    qJoinSemi,
    qJoinAnti, qJoinRange, qJoinAsof, qJoinAsofTolerance, qJoinStar,
    qDistinct, qSortOutput,
    qTopk, qSetUnionAll, qSetIntersect, qSetExcept, qSetUnionByName,
    qSetExceptAll, qSetIntersectAll, qOutputConcat)
}
