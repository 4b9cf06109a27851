package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-technique and pipeline-utility operators beyond the SURVEY §2
  * inventory: manual skew salting (the explicit form of what AQE does
  * adaptively), single-pass column profiling (data-quality stage of a
  * training pipeline), and batch sessionization (the batch twin of the
  * T3 session window, same semantics — useful for backfills). */
object Extras {

  /** Salted skew join: the fact side's join key is salted with a
    * deterministic bucket and the (small) build side is exploded across
    * all salt values, so one hot key spreads over `SALTS` reducers.
    * Result is provably identical to the unsalted join — the oracle
    * runs the plain join. (AQE skew-split handles this adaptively; the
    * manual form is for engines/stages where AQE can't see the skew,
    * e.g. pre-partitioned writes.) */
  val qJoinSalted = Q("q_join_salted",
    (spark, sfDir) => {
      import spark.implicits._
      val SALTS = 8
      val e = Tables.read(spark, sfDir, "events")
        .select($"user_id", $"event_type", $"event_id")
        .withColumn("salt", pmod($"event_id", lit(SALTS)).cast("int"))
      val dim = Tables.read(spark, sfDir, "customer")
        .select($"c_custkey".as("user_id"), $"c_mktsegment")
        .withColumn("salt",
          explode(sequence(lit(0), lit(SALTS - 1))))
      e.join(dim, Seq("user_id", "salt"))
        .groupBy($"c_mktsegment", $"event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"c_mktsegment", $"event_type")
    },
    Some("""SELECT c_mktsegment, event_type,
           |       count(*) AS n_events,
           |       count(DISTINCT user_id) AS n_users
           |FROM events JOIN customer ON user_id = c_custkey
           |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type"""
      .stripMargin))

  /** Single-pass column profiler: null/distinct/length stats for every
    * column of `documents` in ONE aggregation (no per-column scans),
    * melted to long form. The data-quality step of an ingest pipeline. */
  val qProfileColumns = Q("q_profile_columns",
    (spark, sfDir) => {
      import spark.implicits._
      val cols = Seq("text", "lang", "source")
      val aggs = cols.flatMap(c => Seq(
        count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        round(avg(length(col(c))), 6).as(s"${c}_avglen")))
      val stackArgs = cols
        .map(c => s"'$c', ${c}_nulls, ${c}_distinct, ${c}_avglen")
        .mkString(", ")
      Tables.read(spark, sfDir, "documents")
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${cols.size}, $stackArgs) " +
          "AS (column_name, n_nulls, n_distinct, avg_len)")
        .orderBy($"column_name")
    },
    Some("""SELECT 'lang' AS column_name,
           |       count(CASE WHEN lang IS NULL THEN 1 END) AS n_nulls,
           |       count(DISTINCT lang) AS n_distinct,
           |       round(avg(length(lang)), 6) AS avg_len
           |FROM documents
           |UNION ALL
           |SELECT 'source', count(CASE WHEN source IS NULL THEN 1 END),
           |       count(DISTINCT source), round(avg(length(source)), 6)
           |FROM documents
           |UNION ALL
           |SELECT 'text', count(CASE WHEN text IS NULL THEN 1 END),
           |       count(DISTINCT text), round(avg(length(text)), 6)
           |FROM documents
           |ORDER BY column_name""".stripMargin))

  /** Batch sessionization: 30-minute-gap sessions per user via
    * lag + cumulative-sum windows — same session semantics as the
    * streaming session_window (T3), for backfill/batch parity. */
  val qSessionize = Q("q_sessionize",
    (spark, sfDir) => {
      import spark.implicits._
      val e = Tables.read(spark, sfDir, "events")
        .select($"user_id", $"ts", $"event_id")
      val order = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
      // full-precision timestamp comparison on BOTH engines (interval
      // arithmetic is exact at µs grain; unix_timestamp would truncate
      // to whole seconds and could flip a near-1800s gap vs the oracle)
      val lagTs = lag($"ts", 1).over(order)
      val marked = e.withColumn("new_s",
        when(lagTs.isNull ||
          $"ts" > lagTs + expr("INTERVAL 1800 SECONDS"), 1)
          .otherwise(0))
      val sess = marked.withColumn("sid",
        sum($"new_s").over(order
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy($"user_id", $"sid")
        .agg(count(lit(1)).as("n"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max($"n").as("max_session_events"))
        .orderBy($"user_id")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
           |  FROM events
           |), marked AS (
           |  SELECT user_id, ts, event_id,
           |    CASE WHEN lag(ts) OVER w IS NULL OR
           |      ts - lag(ts) OVER w > INTERVAL 1800 SECOND
           |    THEN 1 ELSE 0 END AS new_s
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |), sess AS (
           |  SELECT user_id,
           |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS sid
           |  FROM marked
           |), per AS (
           |  SELECT user_id, sid, count(*) AS n
           |  FROM sess GROUP BY 1, 2
           |)
           |SELECT user_id, count(*) AS n_sessions,
           |       max(n) AS max_session_events
           |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Correlated LATERAL join (Spark 4 SQL surface): top-2 customers by
    * balance per nation, the canonical per-group-top-k as a lateral
    * subquery. Catalyst decorrelates the LIMIT-bearing subquery into a
    * rank-based join rewrite — semantically identical to the window
    * row_number form (W2/J7) but exercising the decorrelation path a
    * SQL user hits. DuckDB runs the same LATERAL syntax. */
  val qJoinLateral = Q("q_join_lateral",
    (spark, sfDir) => {
      Tables.read(spark, sfDir, "nation")
        .createOrReplaceTempView("v_nation")
      Tables.read(spark, sfDir, "customer")
        .createOrReplaceTempView("v_customer")
      spark.sql(
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM v_nation n,
          |LATERAL (SELECT c_custkey, c_acctbal FROM v_customer c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
    },
    Some("""SELECT n.n_name, t.c_custkey, t.c_acctbal
           |FROM nation n,
           |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
           |         WHERE c.c_nationkey = n.n_nationkey
           |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
           |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey"""
      .stripMargin))

  /** MERGE INTO / upsert semantics without a table format: the
    * reference's whole-refresh model re-runs everything; the
    * incremental equivalent a warehouse needs is latest-wins upsert of
    * a change feed into a base snapshot. Three-way outcome per key —
    * matched (update), not-in-base (insert), untouched (keep) — via
    * ONE full-outer join on the key; the change feed is first
    * collapsed to latest-per-key with the W2 row_number pattern
    * (ts + event_id total order). Base = even-keyed customers so all
    * three outcome classes are non-empty at every sf. Scale: the join
    * shuffles both sides once on the key; latest-per-key is a
    * partial-agg-friendly window, no driver involvement. */
  val qMergeUpsert = Q("q_merge_upsert",
    (spark, sfDir) => {
      import spark.implicits._
      val base = Tables.read(spark, sfDir, "customer")
        .filter($"c_custkey" % 2 === 0)
        .select($"c_custkey".as("key"), $"c_mktsegment",
          $"c_acctbal".cast("double").as("balance"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      val latest = Tables.read(spark, sfDir, "events")
        .filter($"event_type" === "purchase" && $"value".isNotNull)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id".as("key"), $"value".as("new_balance"))
      base.join(latest, Seq("key"), "full_outer")
        .select($"key",
          $"c_mktsegment",
          coalesce($"new_balance", $"balance").as("balance"),
          when($"new_balance".isNull, "keep")
            .when($"c_mktsegment".isNull, "insert")
            .otherwise("update").as("action"))
        .orderBy($"key")
    },
    Some(s"""WITH ${Cohort.evCte}, pur AS (
           |  SELECT user_id, value, ts, event_id FROM ev
           |  WHERE event_type = 'purchase' AND value IS NOT NULL
           |), latest AS (
           |  SELECT user_id AS key, value AS new_balance
           |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
           |          ORDER BY ts DESC, event_id DESC) AS rn FROM pur)
           |  WHERE rn = 1
           |), base AS (
           |  SELECT c_custkey AS key, c_mktsegment,
           |         CAST(c_acctbal AS DOUBLE) AS balance
           |  FROM customer WHERE c_custkey % 2 = 0
           |)
           |SELECT COALESCE(b.key, l.key) AS key,
           |       b.c_mktsegment,
           |       COALESCE(l.new_balance, b.balance) AS balance,
           |       CASE WHEN l.new_balance IS NULL THEN 'keep'
           |            WHEN b.c_mktsegment IS NULL THEN 'insert'
           |            ELSE 'update' END AS action
           |FROM base b FULL OUTER JOIN latest l ON b.key = l.key
           |ORDER BY key""".stripMargin))

  /** SCD type-2 history build: collapse each user's event stream to
    * rows where the tracked attribute (event_type) actually CHANGES
    * (lag-compare), then derive version number, valid_from,
    * valid_to = next change (NULL = current) and an is_current flag.
    * Two window passes over one user_id partitioning — a single
    * shuffle; this is the standard dimension-history builder a
    * warehouse refresh runs incrementally. */
  val qScd2History = Q("q_scd2_history",
    (spark, sfDir) => {
      import spark.implicits._
      val wOrd = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
      val changes = Tables.read(spark, sfDir, "events")
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("prev", lag($"event_type", 1).over(wOrd))
        .filter($"prev".isNull || $"prev" =!= $"event_type")
      changes
        .withColumn("version", row_number().over(wOrd))
        .withColumn("valid_to", lead($"ts", 1).over(wOrd))
        .select($"user_id", $"version",
          $"event_type".as("state"),
          $"ts".as("valid_from"), $"valid_to",
          $"valid_to".isNull.as("is_current"))
        .orderBy($"user_id", $"version")
    },
    Some(s"""WITH ${Cohort.evCte}, marked AS (
            |  SELECT user_id, event_type, ts, event_id,
            |         lag(event_type) OVER (PARTITION BY user_id
            |           ORDER BY ts, event_id) AS prev
            |  FROM ev
            |), changes AS (
            |  SELECT user_id, event_type, ts, event_id FROM marked
            |  WHERE prev IS NULL OR prev <> event_type
            |)
            |SELECT user_id,
            |       row_number() OVER w AS version,
            |       event_type AS state,
            |       ts AS valid_from,
            |       lead(ts) OVER w AS valid_to,
            |       lead(ts) OVER w IS NULL AS is_current
            |FROM changes
            |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            |ORDER BY user_id, version""".stripMargin))

  /** The SQL-TEXT half of the API surface: the same Catalyst pipeline
    * is reachable through `spark.sql(...)` over registered views — a
    * user of the reference's SQL scripts can paste dialect-adjusted
    * SQL instead of learning the DataFrame API, and gets the identical
    * plan (pushdown, broadcast, two-phase agg all still apply; view
    * registration is pure metadata, no materialization). */
  val qSqlSurface = Q("q_sql_surface",
    (spark, sfDir) => {
      Seq("orders", "customer", "nation").foreach(t =>
        Tables.read(spark, sfDir, t)
          .createOrReplaceTempView(s"v_$t"))
      spark.sql(
        """SELECT n.n_name AS nation,
          |       count(*) AS n_orders,
          |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))),
          |         6) AS DOUBLE) AS revenue
          |FROM v_orders o
          |JOIN v_customer c ON o.o_custkey = c.c_custkey
          |JOIN v_nation n ON c.c_nationkey = n.n_nationkey
          |WHERE o.o_orderstatus = 'F'
          |GROUP BY n.n_name
          |ORDER BY nation""".stripMargin)
    },
    Some("""SELECT n.n_name AS nation,
           |       count(*) AS n_orders,
           |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))),
           |         6) AS DOUBLE) AS revenue
           |FROM orders o
           |JOIN customer c ON o.o_custkey = c.c_custkey
           |JOIN nation n ON c.c_nationkey = n.n_nationkey
           |WHERE o.o_orderstatus = 'F'
           |GROUP BY n.n_name
           |ORDER BY nation""".stripMargin))

  val all: Seq[Q] = Seq(qJoinSalted, qProfileColumns, qSessionize,
    qJoinLateral, qMergeUpsert, qScd2History, qSqlSurface)
}
