package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's semantic heart (SURVEY.md §3.1 traces A–C) re-expressed
  * on the harness tables per FIXTURES.md §2's role mapping:
  *
  *   - cohort        = users whose first `signup` is followed by a
  *                     `purchase` within +14 days (J4 semi + J7 as-of +
  *                     J6 range join); analog of `#covid_cohort`
  *   - severity      = first `error` event on/after cohort entry
  *   - DailyCounts   = date spine + cumulative distinct users (F6 + W1)
  *   - ClinicalCourse= per day-offset-since-entry census
  *   - Labs          = per (event_type, day-offset) value stats incl.
  *                     log-stats `log(value + 0.5)` (A3)
  *   - Diagnoses     = per event_type pre/post-entry distinct-user counts
  *                     (A4 conditional agg)
  *   - obfuscation   = deterministic blur ± mask (F5) — intentionally
  *                     *deterministic* (hash-keyed) where the reference
  *                     uses RAND()/NEWID(): retry-safe under Spark task
  *                     re-execution, oracle-expressible (SURVEY.md §4.2)
  *
  * Scale notes (100 TB): the cohort build shuffles `events` once on
  * `user_id` (sort-merge); the signup/purchase/error branches reuse that
  * single scan; the date spine stays tiny (≤ ~10^4 rows) so every
  * spine-side join is a broadcast; the only unpartitioned window
  * (cumulative over calendar dates) runs over the spine, never over facts.
  */
object Cohort {

  /** The cohort is reused by every query in this module; within one
    * Verify/Bench run build + persist it once per (session, sfDir) — the
    * Spark analog of the reference's `#covid_cohort` temp-table barrier
    * (SURVEY.md §4.1). Lifetime/eviction handled by [[graft.Memo]]. */
  def cohortDf(spark: SparkSession, sfDir: String): DataFrame =
    graft.Memo.cached(spark, s"cohort:$sfDir")(buildCohort(spark, sfDir))

  /** cohort DF: user_id, signup_ts, entry_ts, entry_date, severe (0/1),
    * severe_date. One shuffle on user_id; all three event branches are
    * co-partitioned after it. */
  private def buildCohort(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.read(spark, sfDir, "events")

    val signups = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))

    // J6 range join: equi key user_id carried so Catalyst plans a
    // sort-merge join with the interval predicate as a post-join filter
    // (never a nested-loop join) — SURVEY.md §4.2 mitigation (a).
    val entry = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
      .join(signups, Seq("user_id"))
      .filter($"p_ts" > $"signup_ts" &&
        $"p_ts" <= $"signup_ts" + expr("INTERVAL 14 DAYS"))
      .groupBy($"user_id", $"signup_ts").agg(min($"p_ts").as("entry_ts"))

    val errors = e.filter($"event_type" === "error")
      .select($"user_id", $"ts".as("err_ts"))

    entry.join(errors,
        entry("user_id") === errors("user_id") &&
          errors("err_ts") >= entry("entry_ts"), "left")
      .groupBy(entry("user_id"), $"signup_ts", $"entry_ts")
      .agg(min($"err_ts").as("severe_ts"))
      .select(
        $"user_id",
        $"signup_ts",
        $"entry_ts",
        to_date($"entry_ts").as("entry_date"),
        when($"severe_ts".isNotNull, 1).otherwise(0).as("severe"),
        to_date($"severe_ts").as("severe_date"))
  }

  /** Shared DuckDB CTE prefix mirroring cohortDf. The `ev` CTE casts
    * `ts` to DuckDB's µs TIMESTAMP so every boundary predicate (`>`,
    * `>=` on ts) sees exactly the values Spark sees regardless of the
    * file's physical unit (Tables.read reads µs natively and floors
    * legacy ns fixtures to µs — the cast is a no-op on µs files and the
    * identical truncation on ns ones; ADVICE r1, medium). */
  private[queries] val evCte: String =
    """ev AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |         event_type, value, props
      |  FROM events
      |)""".stripMargin

  private val cohortCte: String =
    s"""WITH $evCte, s AS (
      |  SELECT user_id, min(ts) AS signup_ts
      |  FROM ev WHERE event_type = 'signup' GROUP BY user_id
      |), ent AS (
      |  SELECT e.user_id, min(e.ts) AS entry_ts
      |  FROM ev e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND e.ts > s.signup_ts
      |    AND e.ts <= s.signup_ts + INTERVAL 14 DAY
      |  GROUP BY e.user_id
      |), sev AS (
      |  SELECT ent.user_id, min(e.ts) AS severe_ts
      |  FROM ent JOIN ev e
      |    ON e.user_id = ent.user_id AND e.event_type = 'error'
      |   AND e.ts >= ent.entry_ts
      |  GROUP BY ent.user_id
      |), cohort AS (
      |  SELECT ent.user_id,
      |         CAST(ent.entry_ts AS DATE) AS entry_date,
      |         ent.entry_ts,
      |         CASE WHEN sev.severe_ts IS NULL THEN 0 ELSE 1 END AS severe,
      |         CAST(sev.severe_ts AS DATE) AS severe_date
      |  FROM ent LEFT JOIN sev ON ent.user_id = sev.user_id
      |)""".stripMargin

  val qCohort = Q("q_cohort",
    (spark, sfDir) => {
      import spark.implicits._
      // severe_date is the one NULLABLE date in any oracle output; cast
      // to string on both sides so NULL renders identically ('None')
      // in the comparator regardless of how pandas types the column
      cohortDf(spark, sfDir)
        .select($"user_id", $"entry_date", $"severe",
          $"severe_date".cast("string").as("severe_date"))
        .orderBy($"user_id")
    },
    Some(
      s"""$cohortCte
         |SELECT user_id, entry_date, severe,
         |       CAST(severe_date AS VARCHAR) AS severe_date
         |FROM cohort ORDER BY user_id""".stripMargin))

  /** DailyCounts analog: calendar spine (F6) + cumulative distinct users
    * (W1) + same-day census via join (J8 in window form). */
  val qCohortDailyCounts = Q("q_cohort_daily_counts",
    (spark, sfDir) => {
      import spark.implicits._
      val e = Tables.read(spark, sfDir, "events")
      // cohortDf is memoized+persisted; no extra cache layer needed
      val cohort = cohortDf(spark, sfDir)
        .select($"user_id", $"entry_date", $"severe", $"severe_date")

      val bounds = cohort.agg(min($"entry_date").as("d0"))
        .crossJoin(e.agg(max(to_date($"ts")).as("d1")))
      val spine = bounds
        .select(explode(sequence($"d0", $"d1")).as("calendar_date"))

      val newPerDay = cohort.groupBy($"entry_date")
        .agg(countDistinct($"user_id").as("n_new"))
      val sevPerDay = cohort.filter($"severe" === 1)
        .groupBy($"severe_date").agg(countDistinct($"user_id").as("n_sev"))
      // census: cohort users with any event on d, on/after their entry
      val active = e.select($"user_id", to_date($"ts").as("d"))
        .join(cohort.select($"user_id", $"entry_date", $"severe"),
          Seq("user_id"))
        .filter($"d" >= $"entry_date")
        .groupBy($"d").agg(
          countDistinct($"user_id").as("n_active"),
          countDistinct(when($"severe" === 1, $"user_id"))
            .as("n_active_severe"))

      // spine is tiny → every join below broadcasts; the cumulative
      // window runs over the spine only (single partition is fine there).
      val daily = spine
        .join(newPerDay, spine("calendar_date") === newPerDay("entry_date"),
          "left")
        .join(sevPerDay,
          spine("calendar_date") === sevPerDay("severe_date"), "left")
        .join(active, spine("calendar_date") === active("d"), "left")
        .select(
          $"calendar_date",
          coalesce($"n_new", lit(0L)).as("n_new"),
          coalesce($"n_sev", lit(0L)).as("n_sev"),
          coalesce($"n_active", lit(0L)).as("n_active_on_date"),
          coalesce($"n_active_severe", lit(0L)).as("n_severe_on_date"))
      val w = Window.orderBy($"calendar_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(
          $"calendar_date",
          sum($"n_new").over(w).as("cumulative_users_all"),
          sum($"n_sev").over(w).as("cumulative_users_severe"),
          $"n_active_on_date",
          $"n_severe_on_date")
        .orderBy($"calendar_date")
    },
    Some(
      s"""$cohortCte, bounds AS (
         |  SELECT (SELECT min(entry_date) FROM cohort) AS d0,
         |         (SELECT max(CAST(ts AS DATE)) FROM ev) AS d1
         |), spine AS (
         |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |         CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
         |         AS calendar_date FROM bounds
         |), newd AS (
         |  SELECT entry_date AS d, count(DISTINCT user_id) AS n_new
         |  FROM cohort GROUP BY 1
         |), sevd AS (
         |  SELECT severe_date AS d, count(DISTINCT user_id) AS n_sev
         |  FROM cohort WHERE severe = 1 GROUP BY 1
         |), act AS (
         |  SELECT CAST(e.ts AS DATE) AS d,
         |         count(DISTINCT e.user_id) AS n_active,
         |         count(DISTINCT CASE WHEN c.severe = 1 THEN e.user_id END)
         |           AS n_active_severe
         |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
         |  WHERE CAST(e.ts AS DATE) >= c.entry_date
         |  GROUP BY 1
         |), daily AS (
         |  SELECT s.calendar_date,
         |         COALESCE(n.n_new, 0) AS n_new,
         |         COALESCE(v.n_sev, 0) AS n_sev,
         |         COALESCE(a.n_active, 0) AS n_active_on_date,
         |         COALESCE(a.n_active_severe, 0) AS n_severe_on_date
         |  FROM spine s
         |  LEFT JOIN newd n ON n.d = s.calendar_date
         |  LEFT JOIN sevd v ON v.d = s.calendar_date
         |  LEFT JOIN act a ON a.d = s.calendar_date
         |)
         |SELECT calendar_date,
         |  CAST(sum(n_new) OVER (ORDER BY calendar_date
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cumulative_users_all,
         |  CAST(sum(n_sev) OVER (ORDER BY calendar_date
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cumulative_users_severe,
         |  CAST(n_active_on_date AS BIGINT) AS n_active_on_date,
         |  CAST(n_severe_on_date AS BIGINT) AS n_severe_on_date
         |FROM daily ORDER BY calendar_date""".stripMargin))

  /** ClinicalCourse analog: census per day-offset since entry. */
  val qCohortClinicalCourse = Q("q_cohort_clinical_course",
    (spark, sfDir) => {
      import spark.implicits._
      val e = Tables.read(spark, sfDir, "events")
      val cohort = cohortDf(spark, sfDir)
      e.select($"user_id", to_date($"ts").as("d"))
        .join(cohort.select($"user_id", $"entry_date", $"severe"),
          Seq("user_id"))
        .filter($"d" >= $"entry_date")
        .select(datediff($"d", $"entry_date").as("days_since_entry"),
          $"user_id", $"severe")
        .groupBy($"days_since_entry")
        .agg(
          countDistinct($"user_id").as("n_users_active"),
          countDistinct(when($"severe" === 1, $"user_id"))
            .as("n_users_ever_severe_active"))
        .orderBy($"days_since_entry")
    },
    Some(
      s"""$cohortCte
         |SELECT date_diff('day', c.entry_date, CAST(e.ts AS DATE))
         |         AS days_since_entry,
         |       count(DISTINCT e.user_id) AS n_users_active,
         |       count(DISTINCT CASE WHEN c.severe = 1 THEN e.user_id END)
         |         AS n_users_ever_severe_active
         |FROM ev e JOIN cohort c ON e.user_id = c.user_id
         |WHERE CAST(e.ts AS DATE) >= c.entry_date
         |GROUP BY 1 ORDER BY days_since_entry""".stripMargin))

  /** Labs analog (A3): per (event_type, day-offset) value stats with the
    * 4CE log-stats `log(value + 0.5)`. stddev of a single sample is NaN
    * in Spark but NULL in DuckDB/ANSI — normalized to NULL here. */
  val qCohortLabs = Q("q_cohort_labs",
    (spark, sfDir) => {
      import spark.implicits._
      val e = Tables.read(spark, sfDir, "events")
      val cohort = cohortDf(spark, sfDir)
      def noNaN(c: org.apache.spark.sql.Column) =
        when(isnan(c), lit(null)).otherwise(c)
      e.select($"user_id", $"event_type", $"value", to_date($"ts").as("d"))
        .filter($"value".isNotNull && $"value" > 0)
        .join(cohort.select($"user_id", $"entry_date"), Seq("user_id"))
        .filter($"d" >= $"entry_date")
        .select($"event_type",
          datediff($"d", $"entry_date").as("days_since_entry"),
          $"user_id", $"value")
        .groupBy($"event_type", $"days_since_entry")
        .agg(
          countDistinct($"user_id").as("n_users"),
          round(avg($"value"), 6).as("mean_value"),
          round(noNaN(stddev_samp($"value")), 6).as("stdev_value"),
          round(avg(log($"value" + 0.5)), 6).as("mean_log_value"),
          round(noNaN(stddev_samp(log($"value" + 0.5))), 6)
            .as("stdev_log_value"))
        .orderBy($"event_type", $"days_since_entry")
    },
    Some(
      s"""$cohortCte
         |SELECT e.event_type,
         |       date_diff('day', c.entry_date, CAST(e.ts AS DATE))
         |         AS days_since_entry,
         |       count(DISTINCT e.user_id) AS n_users,
         |       round(avg(e.value), 6) AS mean_value,
         |       round(stddev_samp(e.value), 6) AS stdev_value,
         |       round(avg(ln(e.value + 0.5)), 6) AS mean_log_value,
         |       round(stddev_samp(ln(e.value + 0.5)), 6) AS stdev_log_value
         |FROM ev e JOIN cohort c ON e.user_id = c.user_id
         |WHERE e.value IS NOT NULL AND e.value > 0
         |  AND CAST(e.ts AS DATE) >= c.entry_date
         |GROUP BY 1, 2 ORDER BY event_type, days_since_entry""".stripMargin))

  /** Diagnoses/Medications analog (A4): pre/post-entry distinct-user
    * counts per code, split by ever-severe — four conditional aggs over
    * one scan, exactly the reference's output shape. */
  val qCohortPrePost = Q("q_cohort_pre_post",
    (spark, sfDir) => {
      import spark.implicits._
      val e = Tables.read(spark, sfDir, "events")
      val cohort = cohortDf(spark, sfDir)
      e.select($"user_id", $"event_type", $"ts")
        .join(cohort.select($"user_id", $"entry_ts", $"severe"),
          Seq("user_id"))
        .groupBy($"event_type")
        .agg(
          countDistinct(when($"ts" < $"entry_ts", $"user_id"))
            .as("n_users_before"),
          countDistinct(when($"ts" >= $"entry_ts", $"user_id"))
            .as("n_users_since"),
          countDistinct(when($"ts" < $"entry_ts" && $"severe" === 1,
            $"user_id")).as("n_users_severe_before"),
          countDistinct(when($"ts" >= $"entry_ts" && $"severe" === 1,
            $"user_id")).as("n_users_severe_since"))
        .orderBy($"event_type")
    },
    Some(
      s"""$cohortCte
         |SELECT e.event_type,
         |  count(DISTINCT CASE WHEN e.ts < c.entry_ts THEN e.user_id END)
         |    AS n_users_before,
         |  count(DISTINCT CASE WHEN e.ts >= c.entry_ts THEN e.user_id END)
         |    AS n_users_since,
         |  count(DISTINCT CASE WHEN e.ts < c.entry_ts AND c.severe = 1
         |    THEN e.user_id END) AS n_users_severe_before,
         |  count(DISTINCT CASE WHEN e.ts >= c.entry_ts AND c.severe = 1
         |    THEN e.user_id END) AS n_users_severe_since
         |FROM ev e JOIN cohort c ON e.user_id = c.user_id
         |GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** F5 deterministic obfuscation: blur = hash-keyed noise in [-2, +2],
    * then small counts (< 10) masked to -99 — mask wins over blur, the
    * 4CE-specified order (FIXTURES.md §2). The noise key is a Knuth
    * multiplicative hash of the epoch day (not a short arithmetic
    * cycle — ADVICE r1), in plain integer ops so the DuckDB oracle
    * computes the identical noise; unlike the reference's RAND() this
    * is retry-safe under task re-execution (SURVEY.md §4.2). */
  val qObfuscate = Q("q_obfuscate",
    (spark, sfDir) => {
      import spark.implicits._
      val cohort = cohortDf(spark, sfDir)
      val blur = 2
      val mask = 10
      val perDay = cohort.groupBy($"entry_date")
        .agg(countDistinct($"user_id").as("n_true"))
      val epochDay = datediff($"entry_date", to_date(lit("1970-01-01")))
      val noise =
        epochDay.cast("long") * 2654435761L % 2147483648L %
          (2 * blur + 1) - blur
      perDay.select(
          $"entry_date",
          when($"n_true" < mask, lit(-99L))
            .otherwise($"n_true" + noise).as("n_users_obf"))
        .orderBy($"entry_date")
    },
    Some(
      s"""$cohortCte, perday AS (
         |  SELECT entry_date, count(DISTINCT user_id) AS n_true
         |  FROM cohort GROUP BY 1
         |)
         |SELECT entry_date,
         |  CAST(CASE WHEN n_true < 10 THEN -99 ELSE n_true +
         |    (CAST(date_diff('day', DATE '1970-01-01', entry_date)
         |       AS BIGINT) * 2654435761 % 2147483648 % 5 - 2)
         |    END AS BIGINT) AS n_users_obf
         |FROM perday ORDER BY entry_date""".stripMargin))

  /** F6 date spine on its own: sequence + explode (generator). */
  val qDateSpine = Q("q_date_spine",
    (spark, sfDir) => {
      import spark.implicits._
      val e = Tables.read(spark, sfDir, "events")
      e.agg(min(to_date($"ts")).as("d0"), max(to_date($"ts")).as("d1"))
        .select(explode(sequence($"d0", $"d1")).as("calendar_date"))
        .orderBy($"calendar_date")
    },
    Some(
      """SELECT CAST(unnest(generate_series(
        |    CAST((SELECT min(CAST(ts AS DATE)) FROM events) AS TIMESTAMP),
        |    CAST((SELECT max(CAST(ts AS DATE)) FROM events) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS calendar_date
        |ORDER BY calendar_date""".stripMargin))

  val all: Seq[Q] = Seq(qCohort, qCohortDailyCounts, qCohortClinicalCourse,
    qCohortLabs, qCohortPrePost, qObfuscate, qDateSpine)
}
