package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-15 ledger (SURVEY.md §17 — VERDICT r14 items 2/3/4/5): the
  * Σx² navigator cells, the end-to-end incremental-refresh flow, the
  * Spark-4 SQL pipe/parameter surface, and the summary-lattice
  * navigation row (the emit-bounded setsim form lives with its family
  * in queries/Corpus.scala). One oracle-gated row each; scale notes
  * per query. */
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

  /** Per-invocation temp-view suffix (same concurrency discipline as
    * Surface.viewRun: Verify and a test may run a query concurrently
    * in one JVM, and temp views are session-global). */
  private val viewRun =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** E339: **SQL pipe syntax** (Spark 4's `|>` operators, the last
    * notable uncovered SQL dialect surface after round 14's sweep) —
    * one query chaining the core pipe verbs: `FROM` → `WHERE`
    * (pre-agg) → `EXTEND` (computed column) → `AGGREGATE … GROUP BY`
    * → `WHERE` (post-agg, pipe's HAVING) → `ORDER BY` → `LIMIT`.
    * Pipe syntax is pure parse-time sugar — the analyzer produces the
    * identical logical plan as the classic form, so every Catalyst
    * optimization (pushdown through the EXTEND, partial aggregation)
    * applies unchanged and the 100 TB story is the classic query's.
    * The oracle is the SAME query spelled classically (DuckDB has no
    * pipe parser), which is exactly the semantic claim: sugar, not
    * semantics. */
  val qSqlPipe = Q("q_sql_pipe",
    (spark, sfDir) => {
      val v = s"pipe_li_${viewRun.incrementAndGet()}"
      Tables.read(spark, sfDir, "lineitem").createOrReplaceTempView(v)
      try spark.sql(
        s"""FROM $v
           ||> WHERE l_quantity >= 10
           ||> EXTEND l_extendedprice * (1 - l_discount) AS revenue
           ||> AGGREGATE
           |     CAST(round(sum(revenue), 2) AS DOUBLE) AS sum_rev,
           |     CAST(count(*) AS BIGINT) AS n_items
           |   GROUP BY l_returnflag, l_linestatus
           ||> WHERE n_items > 50
           ||> ORDER BY l_returnflag, l_linestatus
           ||> LIMIT 5""".stripMargin)
      finally { spark.catalog.dropTempView(v); () }
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(round(sum(l_extendedprice * (1 - l_discount)), 2)
           |    AS DOUBLE) AS sum_rev,
           |  CAST(count(*) AS BIGINT) AS n_items
           |FROM lineitem
           |WHERE l_quantity >= 10
           |GROUP BY l_returnflag, l_linestatus
           |HAVING count(*) > 50
           |ORDER BY l_returnflag, l_linestatus
           |LIMIT 5""".stripMargin))

  /** E340: **parameterized SQL, both binding styles** — `spark.sql(
    * text, args)` with NAMED (`:lo`) and POSITIONAL (`?`) markers.
    * The named style alone is already covered (E-ledger
    * `q_sql_params`, queries/Scalars.scala); this row adds the
    * POSITIONAL `Array`-bound form and pins that the two styles are
    * semantically interchangeable by unioning them over the same
    * aggregate. Parameters bind as typed literals at parse time —
    * they are NOT string-spliced, so a hostile value cannot alter the
    * plan shape. The oracle inlines the literals, which is precisely
    * the semantics parameter binding promises. Constant-folding sees
    * the bound literal, so pushdown/pruning behave exactly as with
    * hand-written constants — nothing changes at 100 TB. */
  val qSqlParams = Q("q_sql_params_styles",
    (spark, sfDir) => {
      val v = s"param_li_${viewRun.incrementAndGet()}"
      Tables.read(spark, sfDir, "lineitem").createOrReplaceTempView(v)
      try {
        val named = spark.sql(
          s"""SELECT 'named' AS style, l_returnflag,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM $v WHERE l_quantity BETWEEN :lo AND :hi
             |GROUP BY l_returnflag""".stripMargin,
          Map("lo" -> 5, "hi" -> 15))
        val positional = spark.sql(
          s"""SELECT 'positional' AS style, l_returnflag,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM $v WHERE l_quantity BETWEEN ? AND ?
             |GROUP BY l_returnflag""".stripMargin,
          Array(5, 15))
        named.unionAll(positional)
          .orderBy("style", "l_returnflag")
      } finally { spark.catalog.dropTempView(v); () }
    },
    Some("""WITH g AS (
           |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
           |  FROM lineitem WHERE l_quantity BETWEEN 5 AND 15
           |  GROUP BY l_returnflag)
           |SELECT s.style, g.l_returnflag, g.n
           |FROM (VALUES ('named'), ('positional')) s(style), g
           |ORDER BY s.style, g.l_returnflag""".stripMargin))

  /** E341: **collation-aware predicates + aggregation** — Spark 4's
    * `COLLATE UTF8_LCASE` makes equality case-insensitive at the TYPE
    * level, replacing the classic `lower(col)` normalization (and
    * unlike `lower()`, a collated column keeps its original bytes —
    * display text survives while comparison semantics change).
    * Collated GROUP BY alone is already covered (E246
    * `q_sql_collation`, queries/Metrics.scala); this row adds collated
    * EQUALITY/INEQUALITY PREDICATES (the tautology `= x OR <> x` must
    * keep every row under any collation — a row lost here means the
    * collated comparison diverged from trichotomy) and a numeric
    * aggregate riding the collated grouping. The fixture is
    * consistently-cased, so the query manufactures mixed case
    * deterministically (even keys upper, odd lower). Grouping on a
    * collated string hashes its collation key — same shuffle shape as
    * any string groupBy at scale. */
  val qSqlCollation = Q("q_sql_collation_pred",
    (spark, sfDir) => {
      val v = s"coll_cust_${viewRun.incrementAndGet()}"
      Tables.read(spark, sfDir, "customer").createOrReplaceTempView(v)
      try spark.sql(
        s"""WITH mixed AS (
           |  SELECT CASE WHEN c_custkey % 2 = 0
           |           THEN upper(c_mktsegment)
           |           ELSE lower(c_mktsegment) END AS seg,
           |         c_acctbal
           |  FROM $v)
           |SELECT lower(seg COLLATE UTF8_LCASE) AS segment,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS bal
           |FROM mixed
           |WHERE seg COLLATE UTF8_LCASE = 'bUiLdInG'
           |   OR seg COLLATE UTF8_LCASE <> 'bUiLdInG'
           |GROUP BY seg COLLATE UTF8_LCASE
           |ORDER BY segment""".stripMargin)
      finally { spark.catalog.dropTempView(v); () }
    },
    Some("""SELECT lower(c_mktsegment) AS segment,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS bal
           |FROM customer
           |GROUP BY lower(c_mktsegment)
           |ORDER BY segment""".stripMargin))

  /** E342: **end-to-end incremental refresh** — the three previously
    * separate pieces composed into one gated flow (VERDICT r14 item
    * 3): the custom MicroBatchStream source drains 50k rows in five
    * admission-controlled micro-batches; `foreachBatch` lands every
    * batch in a raw parquet zone AND folds its partial cells (Σx,
    * Σx², non-null n, row count per bucket) into a maintained rollup
    * — each refresh merges the previous cell store with the batch's
    * partials, a cells-sized job independent of total history; the
    * final store is registered with [[graft.plans.RollupRewrite]] and
    * the USER QUERY at the bottom is the naive aggregate over the raw
    * zone, which the navigator silently answers from the maintained
    * cells (sum, stddev and count all riding E338's cell algebra).
    *
    * The oracle recomputes everything from DuckDB `range()` (the
    * generator is deterministic), so one hash gates the whole chain:
    * a skipped/replayed micro-batch, a lost cell merge, or a wrong
    * navigator rewrite each shifts a bucket. Refresh idempotence: the
    * cell store is written to a NEW `cells_v<batchId>` directory per
    * batch (a replayed batch id overwrites its own output, the
    * classic batch-id-versioned sink discipline); the raw append is
    * non-transactional here — a production deployment makes it
    * idempotent with the same batch-id guard or a transactional table
    * format. At 100 TB the refresh cost per interval is O(batch +
    * cells), not O(history) — the entire point of maintaining the
    * rollup incrementally — and dashboard queries read kilobytes of
    * cells. Scan redirection + stream/batch equivalence are locked in
    * OperatorSuite. */
  val qStreamRollupE2e = Q("q_stream_rollup_e2e",
    (spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.DataFrame
      val root = java.nio.file.Files
        .createTempDirectory("graft-e2e-rollup").toString
      val baseDir = s"$root/base"
      val src = spark.readStream.format("graft.sources.SeriesSource")
        .option("rows", "50000").option("slices", "4")
        .option("maxRowsPerBatch", "10000").load()
      @volatile var cellsDir: String = null
      val maintain: (DataFrame, Long) => Unit = { (batch, id) =>
        batch.write.mode("append").parquet(baseDir)
        val partial = batch
          .groupBy(($"i" % 10).cast("int").as("bucket"))
          .agg(sum($"value").as("v_sum"),
            sum($"value" * $"value").as("v_sq"),
            count($"value").as("v_cnt"),
            count(lit(1)).as("cnt"))
        val merged = Option(cellsDir)
          .map(d => spark.read.parquet(d).unionByName(partial)
            .groupBy($"bucket")
            .agg(sum($"v_sum").as("v_sum"), sum($"v_sq").as("v_sq"),
              sum($"v_cnt").as("v_cnt"), sum($"cnt").as("cnt")))
          .getOrElse(partial)
        val next = s"$root/cells_v$id"
        merged.write.mode("overwrite").parquet(next)
        cellsDir = next
      }
      // state-light stream: same partition discipline as StreamRun
      val key = "spark.sql.shuffle.partitions"
      val prevParts = spark.conf.get(key)
      spark.conf.set(key, "4")
      try {
        val q = src.writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch(maintain).start()
        q.processAllAvailable(); q.stop()
      } finally spark.conf.set(key, prevParts)
      val base = spark.read.parquet(baseDir)
      val summary = spark.read.parquet(cellsDir)
      graft.plans.RollupRewrite.register(
        base = base,
        dims = Seq("bucket" -> (base("i") % 10).cast("int")),
        sums = Seq("v_sum" -> base("value")),
        mins = Nil, maxs = Nil, cntCol = "cnt",
        summary = summary,
        stats = Seq(("v_sum", "v_sq", "v_cnt", base("value"))))
      base.groupBy(($"i" % 10).cast("int").as("bucket"))
        .agg(round(sum($"value"), 4).as("sum_value"),
          round(stddev_samp($"value"), 4).as("sd_value"),
          count(lit(1)).as("n"))
        .orderBy($"bucket")
    },
    Some("""WITH s AS (
           |  SELECT i,
           |    CAST(i * 2654435761 % 2147483648 % 10000 AS DOUBLE)
           |      / 100.0 AS value
           |  FROM range(0, 50000) t(i)
           |)
           |SELECT CAST(i % 10 AS INT) AS bucket,
           |  round(sum(value), 4) AS sum_value,
           |  round(stddev_samp(value), 4) AS sd_value,
           |  count(*) AS n
           |FROM s GROUP BY 1 ORDER BY bucket""".stripMargin))

  /** Build-and-register the two-level summary LATTICE over `orders`,
    * once per (session, sfDir): fine = (o_day, o_orderpriority),
    * coarse = (o_orderpriority), the coarse level built FROM the fine
    * one (cells merge — the standard lattice build, never a second
    * base scan). Both register with [[graft.plans.RollupRewrite]];
    * the registry keeps them coarsest-first. On the `orders` table —
    * not lineitem — so the lattice choice below is isolated from the
    * single-summary rollup family's plan locks. */
  private[queries] def latticeSummaries(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    graft.Memo.cached(spark, s"rollup_lattice:$sfDir") {
      import spark.implicits._
      val base = Tables.read(spark, sfDir, "orders")
      val fineDir = java.nio.file.Files
        .createTempDirectory("graft-rollup-lat-fine").toString
      val coarseDir = java.nio.file.Files
        .createTempDirectory("graft-rollup-lat-coarse").toString
      base.groupBy(to_date($"o_orderdate").as("o_day"),
          $"o_orderpriority")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .as("price_sum"),
          min($"o_totalprice".cast("decimal(18,2)")).as("price_min"),
          max($"o_totalprice".cast("decimal(18,2)")).as("price_max"),
          count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(fineDir)
      val fine = spark.read.parquet(fineDir)
      fine.groupBy($"o_orderpriority")
        .agg(sum($"price_sum").as("price_sum"),
          min($"price_min").as("price_min"),
          max($"price_max").as("price_max"),
          sum($"cnt").as("cnt"))
        .write.mode("overwrite").parquet(coarseDir)
      val coarse = spark.read.parquet(coarseDir)
      def reg(dims: Seq[(String, org.apache.spark.sql.Column)],
          summary: org.apache.spark.sql.DataFrame): Unit =
        graft.plans.RollupRewrite.register(
          base = base,
          dims = dims,
          sums = Seq("price_sum" ->
            base("o_totalprice").cast("decimal(18,2)")),
          mins = Seq("price_min" ->
            base("o_totalprice").cast("decimal(18,2)")),
          maxs = Seq("price_max" ->
            base("o_totalprice").cast("decimal(18,2)")),
          cntCol = "cnt", summary = summary)
      reg(Seq("o_day" -> to_date(base("o_orderdate")),
        "o_orderpriority" -> base("o_orderpriority")), fine)
      reg(Seq("o_orderpriority" -> base("o_orderpriority")), coarse)
      // third lattice level: customer-key grain — the FK into the
      // customer dimension, which makes the star join-back (E349)
      // possible: every cell shares its o_custkey, so joining cells
      // to customer ≡ joining base rows to customer
      val bycustDir = java.nio.file.Files
        .createTempDirectory("graft-rollup-lat-bycust").toString
      base.groupBy($"o_custkey")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .as("price_sum"),
          min($"o_totalprice".cast("decimal(18,2)")).as("price_min"),
          max($"o_totalprice".cast("decimal(18,2)")).as("price_max"),
          count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(bycustDir)
      reg(Seq("o_custkey" -> base("o_custkey")),
        spark.read.parquet(bycustDir))
      coarse
    }

  /** E344: **summary-lattice navigation** — TWO materialized rollups
    * of the same base at nested grains (fine: day × priority ≈ 10⁴
    * cells; coarse: priority = 5 cells), both registered, and the
    * navigator answers each query from the COARSEST summary whose dim
    * set covers the query's grouping (Harinarayan–Rajaraman–Ullman
    * lattice descent; Kimball's navigator rule). The gated query
    * below groups by priority only — both summaries qualify, and the
    * rewrite must pick the 5-cell one: at 100 TB that's the
    * difference between reading kilobytes and reading the day-level
    * summary's millions of cells, and it's what makes a summary
    * LATTICE (not just one rollup) the right warehouse shape — each
    * dashboard grain pays only its own cells. OperatorSuite locks the
    * descent three ways: priority-grain scans the coarse directory,
    * day-grain scans the fine one (coarse can't answer it), and
    * rule-off reproduces identical rows from the base scan. The
    * DuckDB oracle runs the naive SQL on the base — the navigation
    * must be invisible in values. Decimal cells keep both routes
    * exact. */
  val qAggRollupLattice = Q("q_agg_rollup_lattice",
    (spark, sfDir) => {
      import spark.implicits._
      latticeSummaries(spark, sfDir)
      Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          min($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("min_price"),
          max($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("max_price"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price,
           |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS min_price,
           |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS max_price,
           |  count(*) AS n_orders
           |FROM orders
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** E347: **filtered lattice descent** — the navigator's two
    * extensions composed: the query groups by priority (the COARSE
    * summary's grain) but filters on a DAY RANGE, a dimension only
    * the FINE summary carries. The coarse summary cannot express the
    * predicate over its cells (its cells merged the days away), so
    * the descent must SKIP it and answer from the fine summary with
    * the day predicate moved onto the fine summary's scan — whole
    * cells, never split ones. This fall-through is the load-bearing
    * property of a real navigator: the cheapest summary that can
    * answer THE WHOLE QUERY (grain AND predicate), not just the
    * grain. At 100 TB it is the difference between every dashboard
    * date-picker change re-scanning the fact table and it re-reading
    * a few thousand day-grain cells. Oracle = naive filtered SQL on
    * the base; OperatorSuite locks the fine-dir scan, the coarse-dir
    * skip, and rule-off equality. */
  val qAggRollupLatticeFiltered = Q("q_agg_rollup_lattice_filtered",
    (spark, sfDir) => {
      import spark.implicits._
      latticeSummaries(spark, sfDir)
      Tables.read(spark, sfDir, "orders")
        .filter(to_date($"o_orderdate") >= lit("1995-01-01") &&
          to_date($"o_orderdate") < lit("1996-01-01"))
        .groupBy($"o_orderpriority")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price,
           |  count(*) AS n_orders
           |FROM orders
           |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
           |  AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** E348: **CUBE through the navigator** — the user writes the naive
    * `CUBE(day, priority)` dashboard query against the base table and
    * the rewrite answers ALL FOUR grouping sets from the fine
    * summary's cells: Spark plans grouping sets as an Expand that
    * replicates every input row once per set, and replication
    * commutes with cell merging (each base row belongs to exactly one
    * cell with the same dim values), so expanding ~10⁴ cells is
    * row-for-row equivalent to expanding the base — at 100 TB the
    * entire cube costs 4× a kilobyte-scan instead of 4× a fact-table
    * pass, which is the materialized-view rewrite warehouse engines
    * reserve for their cube servers. The lattice is consulted
    * coarsest-first here too: the coarse (priority-only) summary
    * cannot express the day sets (its day slot is not a registered
    * dim and the grouping references it), so the descent lands on the
    * fine summary — the same fall-through E347 locks for filters.
    * Cube nulls are coalesced to 'all' ABOVE the aggregate (the house
    * A5 convention), so the oracle's CUBE output compares exactly;
    * the fixture columns are null-free, making the sentinel
    * unambiguous. Scan redirection + rule-off equality locked in
    * OperatorSuite. */
  val qAggRollupCube = Q("q_agg_rollup_cube",
    (spark, sfDir) => {
      import spark.implicits._
      latticeSummaries(spark, sfDir)
      Tables.read(spark, sfDir, "orders")
        .cube(to_date($"o_orderdate").as("o_day"), $"o_orderpriority")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .select(coalesce($"o_day".cast("string"), lit("all"))
            .as("day_s"),
          coalesce($"o_orderpriority", lit("all")).as("priority_s"),
          $"sum_price", $"n_orders")
        .orderBy($"day_s", $"priority_s")
    },
    Some("""SELECT
           |  coalesce(CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
           |    'all') AS day_s,
           |  coalesce(o_orderpriority, 'all') AS priority_s,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price,
           |  count(*) AS n_orders
           |FROM orders
           |GROUP BY CUBE(CAST(o_orderdate AS DATE), o_orderpriority)
           |ORDER BY day_s, priority_s""".stripMargin))

  /** E349: **star-query join-back** — the user writes the naive
    * fact ⋈ dimension query (orders joined to customer on the FK,
    * grouped by a CUSTOMER attribute) and the navigator answers it
    * from the customer-key-grain summary joined to the dimension:
    * `Aggregate(c_mktsegment, Join(orders ⋈ customer))` becomes
    * `Aggregate(c_mktsegment, Join(15k cells ⋈ customer))`. This is
    * the materialized-view JOIN-BACK rewrite (Goldstein–Larson
    * class), and it is what makes a navigator useful on a star
    * schema — dashboards group by dimension attributes (segment,
    * nation, brand), not by fact-table keys, so grain-subset
    * matching alone never fires for them. Soundness rides on cells
    * sharing their dim values: every row of a cell joins exactly the
    * rows the cell row joins, so the inner equi-join duplicates or
    * drops whole cells and every supported re-aggregation is
    * invariant under uniform per-cell duplication (the rule scaladoc
    * carries the algebra, including the optimizer's inferred
    * isnotnull(FK) guard moving onto the summary scan). At 100 TB the
    * fact-side input drops from the table to |customer|-sized cells —
    * the join even becomes broadcastable from the FACT side. Oracle =
    * the naive join SQL on the base tables; OperatorSuite locks the
    * scan redirection and rule-off equality. */
  val qAggRollupJoinback = Q("q_agg_rollup_joinback",
    (spark, sfDir) => {
      import spark.implicits._
      latticeSummaries(spark, sfDir)
      val o = Tables.read(spark, sfDir, "orders")
      val c = Tables.read(spark, sfDir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          min($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("min_price"),
          count(lit(1)).as("n_orders"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price,
           |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS min_price,
           |  count(*) AS n_orders
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin))

  /** E350: **COUNT(DISTINCT dim) through the navigator** — the one
    * distinct aggregate a summary can answer EXACTLY without cell
    * identity: the rollup holds one cell per dim combination, so a
    * dim column's distinct set is preserved bit-for-bit and
    * `count(DISTINCT to_date(o_orderdate))` per priority ("active
    * days", the classic dashboard distinct) reads the fine summary's
    * ~10⁴ cells instead of the fact table. Distinct MEASURES still
    * refuse (they need exact cell identity the rollup merged away) —
    * the guard the round-14 scaladoc recorded, now split precisely:
    * dim-distinct in, measure-distinct out. The coarse summary lacks
    * the day dim, so the lattice descends to the fine one even though
    * the GROUPING alone would be satisfied by coarse — same
    * fall-through as E347's filter. */
  val qAggRollupDistinct = Q("q_agg_rollup_distinct",
    (spark, sfDir) => {
      import spark.implicits._
      latticeSummaries(spark, sfDir)
      Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .agg(countDistinct(to_date($"o_orderdate")).as("n_days"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
           |    AS n_days,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price,
           |  count(*) AS n_orders
           |FROM orders
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** E351: **HAVING over the navigator** — composition, pinned: the
    * rewrite preserves the Aggregate's output ExprIds, so a HAVING
    * (a Filter ABOVE the aggregate) survives untouched and filters
    * the re-aggregated cells; nothing in the rule needs to know it is
    * there. The gated query keeps only the segments whose re-summed
    * revenue clears a threshold — the navigator answers the aggregate
    * from the coarse 5-cell summary and the HAVING prunes its output.
    * (HAVING on a non-re-aggregable expression would simply leave the
    * whole query on the base scan — refusal composes too.) */
  val qAggRollupHaving = Q("q_agg_rollup_having",
    (spark, sfDir) => {
      import spark.implicits._
      latticeSummaries(spark, sfDir)
      Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .filter($"n_orders" > 100)
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_price,
           |  count(*) AS n_orders
           |FROM orders
           |GROUP BY o_orderpriority
           |HAVING count(*) > 100
           |ORDER BY o_orderpriority""".stripMargin))

  /** E352: **corr / covariance through the navigator** — the
    * bivariate completion of E338: `corr`, `covar_samp` and
    * `covar_pop` over a registered measure PAIR re-aggregate from six
    * pairwise-complete moment cells (n, Σx, Σy, Σxy, Σx², Σy²) via
    * the co-moment CK = NΣxy − ΣxΣy. "Pairwise" is the correctness
    * point: Spark and DuckDB both skip a row when EITHER side is
    * null, so the cells must be built over both-non-null rows or a
    * nullable pair diverges (the navigator fuzz exercises exactly
    * that with its null-bearing m1). This is the association-summary
    * shape (lab value vs severity, A3c) answered from kilobytes at
    * 100 TB — and the same conditioning caveat as the univariate M2
    * applies: the co-moment form cancels when |corr| is tiny relative
    * to the means, so register pairs whose κ is modest, keep the
    * native Welford scan otherwise. */
  val qAggRollupCorr = Q("q_agg_rollup_corr",
    (spark, sfDir) => {
      import spark.implicits._
      Scale.rollupSummary(spark, sfDir)
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(round(corr($"l_quantity", $"l_extendedprice"), 6)
            .as("qp_corr"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 4)
            .as("qp_cov"),
          round(covar_pop($"l_quantity", $"l_extendedprice"), 4)
            .as("qp_cov_pop"),
          count(lit(1)).as("n_items"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  round(corr(l_quantity, l_extendedprice), 6) AS qp_corr,
           |  round(covar_samp(l_quantity, l_extendedprice), 4)
           |    AS qp_cov,
           |  round(covar_pop(l_quantity, l_extendedprice), 4)
           |    AS qp_cov_pop,
           |  count(*) AS n_items
           |FROM lineitem
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  val all: Seq[Q] = Seq(qAggRollupStats, qSqlPipe, qSqlParams,
    qSqlCollation, qStreamRollupE2e, qAggRollupLattice,
    qAggRollupLatticeFiltered, qAggRollupCube, qAggRollupJoinback,
    qAggRollupDistinct, qAggRollupHaving, qAggRollupCorr)
}

