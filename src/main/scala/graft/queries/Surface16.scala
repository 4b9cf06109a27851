package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-16 ledger (SURVEY.md §18 — VERDICT r15 coverage edges): the
  * navigator's two refused shapes closed — exact COUNT(DISTINCT
  * measure) via bucketed-bitmap cells, and outer-preserving star
  * join-back — plus incrementally-consistent lattice maintenance.
  * One oracle-gated row each; scale notes per query. */
object Surface16 {

  /** E353: **exact COUNT(DISTINCT measure) through the aggregate
    * navigator** — the one aggregate class the round-15 navigator
    * refused by design (distinct needs cell identity the rollup
    * merged away), made answerable by a new CELL TYPE rather than a
    * weaker guarantee: the registration (Scale.rollupSummary) stores,
    * per (ship_day, returnflag) cell, the EXACT distinct set of
    * l_orderkey as Spark's own bucketed bitmap — MAP<bucket-of-32k,
    * ≤4 KB bitmap> — and [[graft.plans.RollupRewrite]] rewrites
    * `count(DISTINCT l_orderkey)` to
    * [[graft.functions.BitmapMapCountAgg]]: OR the per-bucket bitmaps
    * across the cells of each group, popcount the union. Set union is
    * idempotent, so the same cell algebra is exact under grouping-sets
    * replication and join-back duplication — no special casing, by
    * algebra.
    *
    * The query below groups STRICTLY coarser than the rollup grain
    * (returnflag only), so each group ORs ~2,500 day-cells; the plan
    * never runs countDistinct's expand + double shuffle over the fact
    * table. At 100 TB this is the classic "distinct users per day →
    * distinct users per month" rollup problem solved exactly: query
    * cost ∝ cells × buckets-touched, not base rows, and the cells
    * maintain incrementally because OR is idempotent (a replayed
    * ingest batch cannot double-count). Oracle = naive
    * count(DISTINCT) over the BASE table in DuckDB; the rewrite must
    * be invisible. Scan redirection + rule on/off equality are locked
    * in OperatorSuite. */
  val qAggRollupDistinctMeasure = Q("q_agg_rollup_distinct_measure",
    (spark, sfDir) => {
      import spark.implicits._
      Scale.rollupSummary(spark, sfDir)
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("n_orders"),
          sum($"l_quantity".cast("decimal(18,2)"))
            .cast("double").as("sum_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_qty
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  /** E354: **outer-preserving star join-back through the navigator**
    * — the round-15 join-back was Inner-only: a dimension row with no
    * fact rows silently got no rewrite coverage, yet `dim LEFT JOIN
    * fact` is THE dashboard shape for "show every segment, zero or
    * not". The extension
    * ([[graft.plans.RollupRewrite]] round 16) is pure algebra, no new
    * cells: a dim-preserved outer join null-extends the SUMMARY side
    * of an unmatched dim row exactly as the base join null-extends
    * the base side, so every null-skipping aggregate is invariant for
    * free, and count(*) — the one aggregate that counts the
    * null-extended row — re-aggregates as Σcoalesce(cnt, 1). The
    * query below left-joins a customer-key SPINE (2·c_custkey — half
    * its keys lie past the fact table's key domain at every scale
    * factor, since this fixture assigns every customer at least one
    * order) to orders: the null-extension path is load-bearing in
    * the gated values, not theoretical, and the grouping is a
    * DIM-SIDE expression (spine key mod 7), exercising the pass-
    * through leg. At 100 TB the win compounds the inner join-back's:
    * the outer dashboard query joins the dimension to KILOBYTES of
    * cells, and unmatched dim rows cost nothing instead of probing
    * the fact table. Oracle = the naive outer-join SQL over BASE
    * tables in DuckDB; scan redirection + rule on/off equality + a
    * base-preserved and full-outer variant are locked in
    * OperatorSuite. */
  val qAggRollupJoinbackOuter = Q("q_agg_rollup_joinback_outer",
    (spark, sfDir) => {
      import spark.implicits._
      Surface15.latticeSummaries(spark, sfDir) // registers bycust grain
      val cust = Tables.read(spark, sfDir, "customer")
      val orders = Tables.read(spark, sfDir, "orders")
      val spine = cust.select(($"c_custkey" * 2).as("k"))
      spine.join(orders, $"k" === orders("o_custkey"), "left")
        .groupBy(($"k" % 7).as("cohort"))
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          max($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("max_price"))
        .orderBy($"cohort")
    },
    Some("""SELECT k % 7 AS cohort,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price,
           |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS max_price
           |FROM (SELECT c_custkey * 2 AS k FROM customer) s
           |LEFT JOIN orders ON k = o_custkey
           |GROUP BY 1
           |ORDER BY cohort""".stripMargin))

  val all: Seq[Q] = Seq(qAggRollupDistinctMeasure,
    qAggRollupJoinbackOuter)
}
