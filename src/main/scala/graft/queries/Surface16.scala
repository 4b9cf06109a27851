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

  val all: Seq[Q] = Seq(qAggRollupDistinctMeasure)
}
