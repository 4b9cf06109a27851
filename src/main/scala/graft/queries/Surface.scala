package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-14 public-surface sweep (VERDICT r13 item 6) — the last
  * notable SQL/DataFrame verbs with no coverage row after thirteen
  * rounds, plus the incremental-maintenance twin of E294's rollup
  * rewrite. One oracle-gated row each; scale notes per query.
  */
object Surface {

  /** Per-invocation temp-view suffix (same concurrency discipline as
    * Extras.viewRun: Verify and a test may run a query concurrently
    * in one JVM, and temp views are session-global). */
  private val viewRun =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** E324: **TABLESAMPLE surface** — the SQL sampling verb, which at
    * 100 TB is the difference between "profile the corpus" being a
    * full scan or a pushed-down partial read (Spark pushes the
    * Bernoulli filter into the scan; no shuffle at all).
    *
    * Sampling is seeded-random, so the exact row set is engine-
    * specific and a row-for-row oracle is impossible BY DESIGN
    * (`REPEATABLE (42)` pins the set within Spark — per-partition
    * xorshift streams — but DuckDB's sampler is a different PRNG).
    * The oracle therefore gates the INVARIANTS any correct Bernoulli
    * 50% sample satisfies, each a deterministic constant:
    * `subset_violations` = |sample ∖ base| via exceptAll (0: sampling
    * without replacement can never emit a row more often than the
    * base contains it), and `frac_in_band` = sampled fraction within
    * [0.4, 0.6] (Binomial(1500, .5) at sf0.01 has σ≈19 rows, so the
    * band sits ≈7.7σ out — and the seeded sample is bit-identical
    * run-to-run anyway; same gate pattern as the q_sample_* rows,
    * which avoid rand() entirely — this row exists to cover the SQL
    * verb itself). */
  val qSqlTablesample = Q("q_sql_tablesample",
    (spark, sfDir) => {
      import spark.implicits._
      val v = s"ts_customer_${viewRun.incrementAndGet()}"
      val base = Tables.read(spark, sfDir, "customer")
      base.createOrReplaceTempView(v)
      try {
        val s = spark.sql(
          s"SELECT * FROM $v TABLESAMPLE (50 PERCENT) REPEATABLE (42)")
        val nBase = base.count()
        val nSamp = s.count()
        val viol = s.exceptAll(base).count()
        val inBand =
          if (nSamp * 10 >= nBase * 4 && nSamp * 10 <= nBase * 6) 1L
          else 0L
        Seq(("frac_in_band", inBand), ("subset_violations", viol))
          .toDF("probe", "ok").orderBy($"probe")
      } finally { spark.catalog.dropTempView(v); () }
    },
    Some("""SELECT 'frac_in_band' AS probe, CAST(1 AS BIGINT) AS ok
           |UNION ALL
           |SELECT 'subset_violations', CAST(0 AS BIGINT)
           |ORDER BY probe""".stripMargin))

  /** E325: **DataFrame.transpose** (new in Spark 4.0) — the
    * row/column flip of a SMALL aggregate frame (here 5 regions ×
    * 2 measures → 2 rows × 6 columns), the presentation step after a
    * big aggregation. Scale note: transpose collects the index
    * column to the driver to NAME the output columns, so it is only
    * ever legal on post-aggregation frames with a bounded index
    * domain — exactly this shape; the 100 TB work happened in the
    * groupBy below it. The oracle rebuilds the transposed frame with
    * conditional aggregation (one FILTER column per region), proving
    * the flip is value-exact including the column naming ("MIDDLE
    * EAST" with the space). */
  val qDfTranspose = Q("q_df_transpose",
    (spark, sfDir) => {
      import spark.implicits._
      val wide = Tables.read(spark, sfDir, "nation")
        .join(Tables.read(spark, sfDir, "region"),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_nations"),
          min($"n_nationkey").cast("long").as("min_key"))
        .orderBy($"r_name")
      wide.transpose().orderBy($"key")
    },
    Some("""WITH j AS (
           |  SELECT r_name, n_nationkey
           |  FROM nation JOIN region ON n_regionkey = r_regionkey
           |)
           |SELECT 'n_nations' AS key,
           |  CAST(count(*) FILTER (WHERE r_name = 'AFRICA') AS BIGINT)
           |    AS "AFRICA",
           |  CAST(count(*) FILTER (WHERE r_name = 'AMERICA') AS BIGINT)
           |    AS "AMERICA",
           |  CAST(count(*) FILTER (WHERE r_name = 'ASIA') AS BIGINT)
           |    AS "ASIA",
           |  CAST(count(*) FILTER (WHERE r_name = 'EUROPE') AS BIGINT)
           |    AS "EUROPE",
           |  CAST(count(*) FILTER (WHERE r_name = 'MIDDLE EAST')
           |    AS BIGINT) AS "MIDDLE EAST"
           |FROM j
           |UNION ALL
           |SELECT 'min_key',
           |  CAST(min(n_nationkey) FILTER (WHERE r_name = 'AFRICA')
           |    AS BIGINT),
           |  CAST(min(n_nationkey) FILTER (WHERE r_name = 'AMERICA')
           |    AS BIGINT),
           |  CAST(min(n_nationkey) FILTER (WHERE r_name = 'ASIA')
           |    AS BIGINT),
           |  CAST(min(n_nationkey) FILTER (WHERE r_name = 'EUROPE')
           |    AS BIGINT),
           |  CAST(min(n_nationkey) FILTER (WHERE r_name = 'MIDDLE EAST')
           |    AS BIGINT)
           |FROM j
           |ORDER BY key""".stripMargin))

  /** E326: **XML scalar surface** — `from_xml` (new in Spark 4.0) and
    * the classic `xpath_long`/`xpath_string` extractors, the F7 JSON
    * row's XML twin. The gate is a roundtrip identity: the XML is
    * BUILT in-query from base columns, parsed back both ways, and the
    * oracle simply recomputes the source values — any parser
    * misstep (entity handling, type coercion, struct field order)
    * breaks value equality. Row-local, zero-shuffle, stays inside
    * whole-stage codegen except the from_xml call itself. */
  val qScalarXml = Q("q_scalar_xml",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .filter($"o_orderkey" <= 50)
        .withColumn("px",
          ($"o_totalprice".cast("decimal(18,2)")).cast("string"))
        .withColumn("xml", concat(lit("<o><k>"), $"o_orderkey",
          lit("</k><p>"), $"px", lit("</p><s>"), $"o_orderstatus",
          lit("</s></o>")))
        .withColumn("parsed",
          from_xml($"xml", lit("k BIGINT, p STRING, s STRING")))
        .select($"o_orderkey",
          expr("xpath_long(xml, '/o/k/text()')").as("xk"),
          expr("xpath_string(xml, '/o/s/text()')").as("xs"),
          $"parsed.p".as("xp"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  o_orderkey AS xk,
           |  o_orderstatus AS xs,
           |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS xp
           |FROM orders WHERE o_orderkey <= 50
           |ORDER BY o_orderkey""".stripMargin))

  /** E327: **map higher-order functions** — `str_to_map` ingestion
    * plus the three map HOFs F8's array row does not cover:
    * `transform_keys`, `transform_values`, `map_zip_with`. Map
    * iteration order is engine-internal, so the output edge EXPLODES
    * the final map and sorts — never compare rendered maps. The
    * oracle recomputes each (key, value) pair straight from the
    * source columns. Row-local and shuffle-free up to the output
    * sort. */
  val qScalarMaps = Q("q_scalar_maps",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .filter($"o_orderkey" <= 50)
        .withColumn("m0", str_to_map(
          concat(lit("stat:"), $"o_orderstatus",
            lit(",prio:"), $"o_orderpriority"),
          lit(","), lit(":")))
        .withColumn("mk", transform_keys($"m0", (k, _) => upper(k)))
        .withColumn("mv", transform_values($"mk",
          (k, v) => concat(k, lit("="), v)))
        .withColumn("mz", map_zip_with($"mk", $"mv",
          (_, a, b) => concat(a, lit("|"), b)))
        .select($"o_orderkey", explode($"mz").as(Seq("mkey", "mval")))
        .orderBy($"o_orderkey", $"mkey")
    },
    Some("""WITH pairs AS (
           |  SELECT o_orderkey, 'STAT' AS mkey,
           |    o_orderstatus || '|STAT=' || o_orderstatus AS mval
           |  FROM orders WHERE o_orderkey <= 50
           |  UNION ALL
           |  SELECT o_orderkey, 'PRIO',
           |    o_orderpriority || '|PRIO=' || o_orderpriority
           |  FROM orders WHERE o_orderkey <= 50
           |)
           |SELECT o_orderkey, mkey, mval FROM pairs
           |ORDER BY o_orderkey, mkey""".stripMargin))

  /** E328: **try_* OVERFLOW class** — `try_add`/`try_multiply` on
    * BIGINT overflow (plus the divide/cast forms for contrast with
    * F4b's q_scalar_try, which covers the parse/zero-divisor classes
    * on part): NULL instead of an ANSI runtime error, the idiom that
    * keeps a 100 TB scan alive when one row of a trillion would
    * overflow (the per-row alternative — a CASE guard — is exactly
    * what the oracle uses, proving the NULL-on-error contract). Divisors are restricted to
    * {1, 2} so every surviving division is exact in binary and the
    * DOUBLE column needs no rounding canon; keys start at 1 because
    * the fixture HAS an o_orderkey = 0, for which MaxValue + 0 does
    * NOT overflow. */
  val qScalarTry = Q("q_scalar_try_overflow",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .filter($"o_orderkey".between(1, 50))
        .select($"o_orderkey",
          try_divide($"o_totalprice", $"o_orderkey" % 3)
            .as("td"),
          try_add(lit(Long.MaxValue), $"o_orderkey").as("ta"),
          try_multiply(lit(3037000500L), lit(3037000500L)).as("tm"),
          expr("try_cast(o_orderstatus AS INT)").as("tc"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
           |       ELSE o_totalprice / (o_orderkey % 3) END AS td,
           |  CAST(NULL AS BIGINT) AS ta,
           |  CAST(NULL AS BIGINT) AS tm,
           |  TRY_CAST(o_orderstatus AS INT) AS tc
           |FROM orders WHERE o_orderkey BETWEEN 1 AND 50
           |ORDER BY o_orderkey""".stripMargin))

  /** E329: **incremental rollup maintenance** — the REFRESH half of
    * E294's aggregate-navigator story. The materialized (ship_day,
    * returnflag) rollup is maintained incrementally: the standing
    * rollup R₀ covers days before a cutoff; when the delta arrives,
    * the refresh re-aggregates R₀'s CELLS unioned with the delta's
    * cells — cost ∝ |R₀ cells| + |delta rows|, never |base|, which is
    * the whole point at 100 TB (the rollup is ~5 orders of magnitude
    * smaller than the fact table; re-scanning the base to refresh it
    * would cancel the navigator's win). sum/count cells merge by
    * SUM, the same distributivity E294 rests on; the cutoff is
    * derived from the data (min ship day + 60) so the row is
    * scale-free. The oracle answers the final month×flag query
    * NAIVELY over the full base — the maintenance path must be
    * invisible in the result. */
  val qAggRollupIncremental = Q("q_agg_rollup_incremental",
    (spark, sfDir) => {
      import spark.implicits._
      val base = Tables.read(spark, sfDir, "lineitem")
        .select(to_date($"l_shipdate").as("day"), $"l_returnflag",
          $"l_quantity".cast("decimal(18,2)").as("qty"))
      val cutoff = date_add(min($"day"), 60)
      val withCut = base.crossJoin(
        broadcast(base.agg(cutoff.as("cut"))))
      def cells(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"day", $"l_returnflag")
          .agg(sum($"qty").as("qty_sum"), count(lit(1)).as("cnt"))
      val r0 = cells(withCut.filter($"day" < $"cut"))
      val delta = cells(withCut.filter($"day" >= $"cut"))
      val refreshed = r0.unionByName(delta)
        .groupBy($"day", $"l_returnflag")
        .agg(sum($"qty_sum").as("qty_sum"), sum($"cnt").as("cnt"))
      refreshed
        .groupBy(date_trunc("month", $"day").cast("date").as("month"),
          $"l_returnflag")
        .agg(sum($"qty_sum").cast("double").as("sum_qty"),
          sum($"cnt").as("n_items"))
        .orderBy($"month", $"l_returnflag")
    },
    Some("""SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
           |    AS DATE) AS month,
           |  l_returnflag,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           |    AS sum_qty,
           |  count(*) AS n_items
           |FROM lineitem
           |GROUP BY 1, 2
           |ORDER BY month, l_returnflag""".stripMargin))

  val all: Seq[Q] = Seq(qSqlTablesample, qDfTranspose, qScalarXml,
    qScalarMaps, qScalarTry, qAggRollupIncremental)
}
