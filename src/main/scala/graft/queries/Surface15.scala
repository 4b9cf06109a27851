package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-15 ledger (SURVEY.md §17 — VERDICT r14 items 2/3/4/5): the
  * Σx² navigator cells, the end-to-end incremental-refresh flow, the
  * Spark-4 SQL pipe/parameter surface, and the emit-bounded setsim
  * production form. One oracle-gated row each; scale notes per query.
  */
object Surface15 {

  /** E338: **stddev/var through the aggregate navigator** — the
    * reference's Labs A3 shape (per-group mean ± stdev over a lab
    * measure) answered from the materialized rollup instead of the
    * base scan. The registration (Scale.rollupSummary) carries three
    * cells per stats measure — Σx, Σx², non-null n — and
    * [[graft.plans.RollupRewrite]] merges them across cells as
    * M2 = Σx² − (Σx)²/n, var_samp = M2/(n−1), var_pop = M2/n,
    * stddev = √var (all four forms exercised below, grouped STRICTLY
    * coarser than the rollup grain so every group merges ~hundreds of
    * cells).
    *
    * Numerics are part of the contract, not an afterthought: the
    * textbook sum-of-squares form cancels when mean ≫ σ, with
    * condition number κ ≈ 1 + n·mean²/M2. For the registered measure
    * (l_quantity: integral values ≤ 50, so Σx and Σx² are EXACT in
    * double; mean ≈ 25.5, σ ≈ 14.4 → κ ≈ 4) the rewrite agrees with
    * the native Welford-merge to ~15 significant digits, and the
    * house 6-dp output rounding makes the oracle compare exact. The
    * rule's scaladoc records the registration guidance for measures
    * where κ is large (don't register; keep the native scan). At
    * 100 TB this is the difference between a stats dashboard reading
    * kilobytes of cells and re-scanning the fact table per filter
    * change. Oracle = the same naive SQL over the BASE table in
    * DuckDB; the rewrite must be invisible. Scan redirection + rule
    * on/off equality are locked in OperatorSuite. */
  val qAggRollupStats = Q("q_agg_rollup_stats",
    (spark, sfDir) => {
      import spark.implicits._
      Scale.rollupSummary(spark, sfDir)
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 6).as("sd_qty"),
          round(var_samp($"l_quantity"), 6).as("var_qty"),
          round(stddev_pop($"l_quantity"), 6).as("sd_pop_qty"),
          round(var_pop($"l_quantity"), 6).as("var_pop_qty"),
          count(lit(1)).as("n_items"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  round(stddev_samp(l_quantity), 6) AS sd_qty,
           |  round(var_samp(l_quantity), 6) AS var_qty,
           |  round(stddev_pop(l_quantity), 6) AS sd_pop_qty,
           |  round(var_pop(l_quantity), 6) AS var_pop_qty,
           |  count(*) AS n_items
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  val all: Seq[Q] = Seq(qAggRollupStats)
}
