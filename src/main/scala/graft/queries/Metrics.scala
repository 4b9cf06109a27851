package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-comparison and concentration statistics (SURVEY.md
  * §2.12, round 12 — E194–E211, E216–E220, E224, E226, E228–E236,
  * E238–E243, E245–E247 — plus round 13's E250, E254–E255, E257–E263
  * and E268) — the monitoring layer's "are these two
  * populations the same, and how unequal is this one" toolbox, next to
  * the score-drift (PSI, E165) and eval (AUC E124, calibration E134)
  * families from round 11.
  *
  * Numeric discipline is the round-11 integer-exact house style
  * (Spearman E118): every accumulation stays integral (counts, cent
  * amounts) in DECIMAL(38,0)/HUGEINT so no engine's partial-agg order
  * can flip a bit, and exactly ONE double division happens at the
  * output edge, rounded 6dp.
  */
object Metrics {

  /** E194: **two-sample Kolmogorov–Smirnov statistic** — the standard
    * "did this metric's distribution shift" test, here comparing
    * purchase vs click event values. D = max |F1−F2| over the pooled
    * support, computed EXACTLY: per distinct value the two cumulative
    * counts c1, c2 accumulate under one global ordered window (the
    * honest single sort any exact CDF comparison needs — the KLL
    * sketch E61 is the recorded approximate path at 100 TB), and the
    * argmax compares the INTEGER cross-product |c1·n2 − c2·n1| so ties
    * and the max location are engine-independent; the one double
    * division D = max/(n1·n2) happens on the final row. `at_value`
    * reports the smallest value attaining D (deterministic tie pick). */
  val qKsTest = Q("q_ks_test",
    (spark, sfDir) => {
      import spark.implicits._
      val ev = Tables.read(spark, sfDir, "events")
        .filter($"event_type".isin("purchase", "click"))
        .select($"value".as("v"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("g1"))
      val perV = ev.groupBy($"v")
        .agg(sum($"g1").as("a1"), sum(lit(1L) - $"g1").as("a2"))
      val cumW = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy()
      perV
        .select($"v",
          sum($"a1").over(cumW).cast("decimal(38,0)").as("c1"),
          sum($"a2").over(cumW).cast("decimal(38,0)").as("c2"))
        .withColumn("n1", max($"c1").over(tot))
        .withColumn("n2", max($"c2").over(tot))
        .withColumn("diff", abs($"c1" * $"n2" - $"c2" * $"n1"))
        .withColumn("mx", max($"diff").over(tot))
        .filter($"diff" === $"mx")
        .agg(max($"n1").cast("long").as("n1"),
          max($"n2").cast("long").as("n2"),
          round(max($"mx").cast("double") /
            (max($"n1").cast("double") * max($"n2").cast("double")), 6)
            .as("ks_d"),
          min($"v").as("at_value"))
    },
    Some("""WITH ev AS (
           |  SELECT value AS v,
           |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
           |  FROM events WHERE event_type IN ('purchase', 'click')
           |), perv AS (
           |  SELECT v, sum(g1) AS a1, sum(1 - g1) AS a2
           |  FROM ev GROUP BY v
           |), cum AS (
           |  SELECT v,
           |    CAST(sum(a1) OVER (ORDER BY v) AS HUGEINT) AS c1,
           |    CAST(sum(a2) OVER (ORDER BY v) AS HUGEINT) AS c2
           |  FROM perv
           |), sc AS (
           |  SELECT v, c1, c2, max(c1) OVER () AS n1,
           |         max(c2) OVER () AS n2
           |  FROM cum
           |), d AS (
           |  SELECT v, n1, n2, abs(c1 * n2 - c2 * n1) AS diff,
           |         max(abs(c1 * n2 - c2 * n1)) OVER () AS mx
           |  FROM sc
           |)
           |SELECT CAST(max(n1) AS BIGINT) AS n1,
           |  CAST(max(n2) AS BIGINT) AS n2,
           |  round(CAST(max(mx) AS DOUBLE) /
           |    (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)), 6)
           |    AS ks_d,
           |  min(v) AS at_value
           |FROM d WHERE diff = mx""".stripMargin))

  /** E195: **autocorrelation function** — sample ACF of the daily event
    * count at calendar lags 1..7 days, the seasonality detector that
    * complements the weekday profile (E164). Integer-exact via the
    * n-scaled deviations trick: with S = Σy and n days, the products
    * (n·y_t − S)(n·y_{t+k} − S) and the denominator Σ(n·y_t − S)² are
    * all integral (both sides carry them as DECIMAL(38,0)/HUGEINT), so
    * r_k = num_k/den needs one double division per lag. Lag pairing is
    * by CALENDAR day (t, t+k both present) — explicit about gap
    * semantics rather than silently re-indexing. The lag fan-out is an
    * explode of sequence(1,7) on the ≤n-row daily aggregate, then an
    * equi-join back on the shifted day — no cross join, and the daily
    * rollup itself is one hash agg however large the raw table is. */
  val qAcf = Q("q_acf",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val daily = Tables.read(spark, sfDir, "events")
        .groupBy(to_date($"ts").as("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("n", count(lit(1)).over(tot))
        .withColumn("s", sum($"y").over(tot))
        .withColumn("dev",
          ($"n" * $"y" - $"s").cast("decimal(38,0)"))
        .localCheckpoint()
      val den = daily
        .agg(sum($"dev" * $"dev").as("den"), max($"n").as("n"))
      val lagged = daily.select($"d", $"dev",
          explode(sequence(lit(1), lit(7))).as("lag_days"))
        .join(daily.select($"d".as("d2"), $"dev".as("dev2")),
          expr("date_add(d, lag_days) = d2"))
      lagged.groupBy($"lag_days")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"dev" * $"dev2").as("num"))
        .crossJoin(broadcast(den))
        .select($"lag_days", $"n_pairs",
          round($"num".cast("double") / $"den".cast("double"), 6)
            .as("r"))
        .orderBy($"lag_days")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |         count(*) AS y
           |  FROM events GROUP BY 1
           |), scaled AS (
           |  SELECT d,
           |    CAST(count(*) OVER () * y - sum(y) OVER () AS HUGEINT)
           |      AS dev
           |  FROM daily
           |), den AS (
           |  SELECT sum(dev * dev) AS den FROM scaled
           |), lags AS (
           |  SELECT CAST(k AS INTEGER) AS lag_days
           |  FROM range(1, 8) t(k)
           |), paired AS (
           |  SELECT l.lag_days, a.dev AS dev, b.dev AS dev2
           |  FROM scaled a
           |  JOIN lags l ON true
           |  JOIN scaled b ON b.d = a.d + to_days(l.lag_days)
           |)
           |SELECT lag_days, count(*) AS n_pairs,
           |  round(CAST(sum(dev * dev2) AS DOUBLE) /
           |    (SELECT CAST(den AS DOUBLE) FROM den), 6) AS r
           |FROM paired GROUP BY lag_days ORDER BY lag_days"""
      .stripMargin))

  /** E196: **Herfindahl–Hirschman concentration index** — per market
    * segment, how concentrated customer spend is across nations: HHI =
    * Σᵢ shareᵢ², the antitrust/market-structure complement to Gini
    * (E133) and top-share. Exactness: nation spend sums accumulate as
    * DECIMAL(18,2) (order-independent), convert to integral CENTS in
    * DECIMAL(38,0)/HUGEINT, and HHI = Σc²/(Σc)² does its two double
    * casts and one division on the final ≤25-row-per-segment frame.
    * Two hash aggs and a segment-window — no shuffle wider than the
    * (segment, nation) grain. */
  val qHhi = Q("q_hhi",
    (spark, sfDir) => {
      import spark.implicits._
      val seg = Window.partitionBy($"c_mktsegment")
      Tables.read(spark, sfDir, "customer")
        .join(Tables.read(spark, sfDir, "orders"),
          $"c_custkey" === $"o_custkey")
        .groupBy($"c_mktsegment", $"c_nationkey")
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("s"))
        .withColumn("c", ($"s" * 100).cast("decimal(38,0)"))
        .select($"c_mktsegment", $"c",
          sum($"c").over(seg).as("t"),
          count(lit(1)).over(seg).as("n_nations"))
        .groupBy($"c_mktsegment")
        .agg(max($"n_nations").as("n_nations"),
          round(sum($"c" * $"c").cast("double") /
            (max($"t").cast("double") * max($"t").cast("double")), 6)
            .as("hhi"))
        .orderBy($"c_mktsegment")
    },
    Some("""WITH spend AS (
           |  SELECT c_mktsegment, c_nationkey,
           |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
           |      AS HUGEINT) AS c
           |  FROM customer JOIN orders ON c_custkey = o_custkey
           |  GROUP BY 1, 2
           |), framed AS (
           |  SELECT c_mktsegment, c,
           |    sum(c) OVER (PARTITION BY c_mktsegment) AS t,
           |    count(*) OVER (PARTITION BY c_mktsegment) AS n_nations
           |  FROM spend
           |)
           |SELECT c_mktsegment,
           |  CAST(max(n_nations) AS BIGINT) AS n_nations,
           |  round(CAST(sum(c * c) AS DOUBLE) /
           |    (CAST(max(t) AS DOUBLE) * CAST(max(t) AS DOUBLE)), 6)
           |    AS hhi
           |FROM framed GROUP BY c_mktsegment ORDER BY c_mktsegment"""
      .stripMargin))

  /** E197: **Lorenz curve** — cumulative spend share by customer spend
    * decile, the curve whose area IS the Gini (E133) and the standard
    * "top decile holds X% of revenue" readout. All customers enter
    * (zero-spend customers via left join + coalesce — excluding them
    * silently flattens the curve); deciles come from ntile(10) over the
    * total order (spend, custkey) so ties split deterministically and
    * both engines bucket identically. Spend stays DECIMAL(18,2) end to
    * end; the two share divisions are double at the edge. One join,
    * one sort for ntile (rank against a KLL sketch is the recorded
    * 100 TB variant), one 10-row rollup. */
  val qLorenzCurve = Q("q_lorenz_curve",
    (spark, sfDir) => {
      import spark.implicits._
      val spend = Tables.read(spark, sfDir, "customer")
        .join(Tables.read(spark, sfDir, "orders"),
          $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(coalesce(sum($"o_totalprice".cast("decimal(18,2)")),
          lit(0).cast("decimal(18,2)")).as("s"))
      val cumW = Window.orderBy($"decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy()
      spend
        .withColumn("decile",
          ntile(10).over(Window.orderBy($"s", $"c_custkey")))
        .groupBy($"decile")
        .agg(count(lit(1)).as("n_customers"), sum($"s").as("ds"))
        .select($"decile", $"n_customers",
          round(sum($"n_customers").over(cumW).cast("double") /
            sum($"n_customers").over(tot).cast("double"), 6)
            .as("cum_pop_share"),
          round(sum($"ds").over(cumW).cast("double") /
            sum($"ds").over(tot).cast("double"), 6)
            .as("cum_spend_share"))
        .orderBy($"decile")
    },
    Some("""WITH spend AS (
           |  SELECT c_custkey,
           |    coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))),
           |      CAST(0 AS DECIMAL(18,2))) AS s
           |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |  GROUP BY 1
           |), bucketed AS (
           |  SELECT s, ntile(10) OVER (ORDER BY s, c_custkey) AS decile
           |  FROM spend
           |), agg AS (
           |  SELECT decile, count(*) AS n_customers, sum(s) AS ds
           |  FROM bucketed GROUP BY decile
           |)
           |SELECT decile, n_customers,
           |  round(CAST(sum(n_customers) OVER (ORDER BY decile)
           |      AS DOUBLE) /
           |    CAST(sum(n_customers) OVER () AS DOUBLE), 6)
           |    AS cum_pop_share,
           |  round(CAST(sum(ds) OVER (ORDER BY decile) AS DOUBLE) /
           |    CAST(sum(ds) OVER () AS DOUBLE), 6) AS cum_spend_share
           |FROM agg ORDER BY decile""".stripMargin))

  /** E198: **Kendall tau-b** — rank concordance between two daily
    * series (event count vs purchase-value mass), the robust
    * complement to Spearman (E118) when the series are short and tied:
    * tau-b counts concordant/discordant PAIRS and corrects both tie
    * margins. The day grain bounds the pair join by calendar size, not
    * data size (30 days → 435 pairs at every sf — pair enumeration
    * over an agg whose cardinality is FIXED is the legitimate use; raw
    * rows never pair). The daily revenue sum accumulates as
    * DECIMAL(18,6) so pair comparisons are exact; C, D and both tie
    * counts are integers; the one sqrt+division is the last
    * expression. The d1<d2 pair join is a deliberate tiny broadcast
    * nested loop (PlanSuite allowlists it with the other ≤k-row
    * crosses). */
  val qKendallTau = Q("q_kendall_tau",
    (spark, sfDir) => {
      import spark.implicits._
      val daily = Tables.read(spark, sfDir, "events")
        .groupBy(to_date($"ts").as("d"))
        .agg(count(lit(1)).as("x"),
          sum(when($"event_type" === "purchase",
            $"value".cast("decimal(18,6)"))
            .otherwise(lit(0).cast("decimal(18,6)"))).as("y"))
        .localCheckpoint()
      val pairs = daily.as("a")
        .join(broadcast(daily.as("b")), $"a.d" < $"b.d")
        .select(($"a.x" > $"b.x" && $"a.y" > $"b.y" ||
            $"a.x" < $"b.x" && $"a.y" < $"b.y").cast("long").as("conc"),
          ($"a.x" > $"b.x" && $"a.y" < $"b.y" ||
            $"a.x" < $"b.x" && $"a.y" > $"b.y").cast("long").as("disc"),
          ($"a.x" === $"b.x").cast("long").as("tie_x"),
          ($"a.y" === $"b.y").cast("long").as("tie_y"))
      pairs.agg(count(lit(1)).as("n_pairs"),
          sum($"conc").as("concordant"), sum($"disc").as("discordant"),
          sum($"tie_x").as("tx"), sum($"tie_y").as("ty"))
        .select($"n_pairs", $"concordant", $"discordant",
          round(($"concordant" - $"discordant").cast("double") /
            sqrt((($"n_pairs" - $"tx") *
              ($"n_pairs" - $"ty")).cast("double")), 6).as("tau_b"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    count(*) AS x,
           |    sum(CASE WHEN event_type = 'purchase'
           |      THEN CAST(value AS DECIMAL(18,6))
           |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS y
           |  FROM events GROUP BY 1
           |), pairs AS (
           |  SELECT
           |    CASE WHEN (a.x > b.x AND a.y > b.y)
           |           OR (a.x < b.x AND a.y < b.y) THEN 1 ELSE 0 END
           |      AS conc,
           |    CASE WHEN (a.x > b.x AND a.y < b.y)
           |           OR (a.x < b.x AND a.y > b.y) THEN 1 ELSE 0 END
           |      AS disc,
           |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
           |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y
           |  FROM daily a JOIN daily b ON a.d < b.d
           |)
           |SELECT count(*) AS n_pairs,
           |  CAST(sum(conc) AS BIGINT) AS concordant,
           |  CAST(sum(disc) AS BIGINT) AS discordant,
           |  round(CAST(sum(conc) - sum(disc) AS DOUBLE) /
           |    sqrt(CAST((count(*) - sum(tie_x)) *
           |      (count(*) - sum(tie_y)) AS DOUBLE)), 6) AS tau_b
           |FROM pairs""".stripMargin))

  /** E199: **Cramér's V** — effect size for the lang × source
    * association on documents: V = sqrt(χ²/(N·(min(r,c)−1))), turning
    * the raw χ² (E148's shape) into a comparable 0..1 strength. Cell
    * counts, marginals and N are exact integers; each cell's
    * (o−e)²/e term is double (e is rational) and the ≤100-term sum
    * rounds at 6dp — the E148-proven tolerance for grid-sized double
    * sums. Marginals come from windows over the cell grid, so the
    * whole query is one hash agg + two windows over ≤100 rows. */
  val qCramersV = Q("q_cramers_v",
    (spark, sfDir) => {
      import spark.implicits._
      val cells = Tables.read(spark, sfDir, "documents")
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("o"))
      val tot = Window.partitionBy()
      cells
        .withColumn("rt", sum($"o").over(Window.partitionBy($"lang")))
        .withColumn("ct", sum($"o").over(Window.partitionBy($"source")))
        .withColumn("n", sum($"o").over(tot))
        .withColumn("r",
          size(collect_set($"lang").over(tot)).cast("long"))
        .withColumn("c",
          size(collect_set($"source").over(tot)).cast("long"))
        .withColumn("e",
          ($"rt" * $"ct").cast("double") / $"n".cast("double"))
        .withColumn("term",
          ($"o".cast("double") - $"e") * ($"o".cast("double") - $"e")
            / $"e")
        .agg(max($"n").as("n"), max($"r").as("n_rows"),
          max($"c").as("n_cols"),
          round(sum($"term"), 6).as("chi2"),
          round(sqrt(sum($"term") / (max($"n").cast("double") *
            (least(max($"r"), max($"c")) - 1).cast("double"))), 6)
            .as("cramers_v"))
    },
    Some("""WITH cells AS (
           |  SELECT lang, source, count(*) AS o
           |  FROM documents GROUP BY 1, 2
           |), framed AS (
           |  SELECT o,
           |    sum(o) OVER (PARTITION BY lang) AS rt,
           |    sum(o) OVER (PARTITION BY source) AS ct,
           |    sum(o) OVER () AS n,
           |    (SELECT count(DISTINCT lang) FROM cells) AS r,
           |    (SELECT count(DISTINCT source) FROM cells) AS c
           |  FROM cells
           |), terms AS (
           |  SELECT n, r, c,
           |    (CAST(o AS DOUBLE) -
           |      CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
           |    * (CAST(o AS DOUBLE) -
           |      CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE))
           |    / (CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE)) AS term
           |  FROM framed
           |)
           |SELECT CAST(max(n) AS BIGINT) AS n,
           |  CAST(max(r) AS BIGINT) AS n_rows,
           |  CAST(max(c) AS BIGINT) AS n_cols,
           |  round(sum(term), 6) AS chi2,
           |  round(sqrt(sum(term) / (CAST(max(n) AS DOUBLE) *
           |    CAST(least(max(r), max(c)) - 1 AS DOUBLE))), 6)
           |    AS cramers_v
           |FROM terms""".stripMargin))

  /** E200: **Cohen's kappa** — chance-corrected agreement between two
    * binary "raters" over events: the high-value rule (value > 50) vs
    * the conversion-type rule (purchase/signup). Fully integer until
    * the last expression: with agreement count A = a+d and marginal
    * products M = ry·cy + rn·cn, κ = (N·A − M)/(N² − M) — a single
    * exact integer numerator and denominator (DECIMAL(38,0)/HUGEINT;
    * N² at 10¹² rows is 10²⁴, past int64 — the overflow that
    * motivates the house decimal discipline) and ONE double division.
    * One hash agg over the 2×2 confusion counts; no shuffle beyond
    * it. */
  val qCohensKappa = Q("q_cohens_kappa",
    (spark, sfDir) => {
      import spark.implicits._
      val flags = Tables.read(spark, sfDir, "events")
        .select(($"value" > 50.0).cast("long").as("r1"),
          $"event_type".isin("purchase", "signup").cast("long")
            .as("r2"))
      flags
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(($"r1" === $"r2").cast("long")).cast("decimal(38,0)")
            .as("agree"),
          sum($"r1").cast("decimal(38,0)").as("ry"),
          sum($"r2").cast("decimal(38,0)").as("cy"))
        .select($"n".cast("long").as("n"),
          $"agree".cast("long").as("n_agree"),
          round(($"n" * $"agree" -
            ($"ry" * $"cy" + ($"n" - $"ry") * ($"n" - $"cy")))
            .cast("double") /
            ($"n" * $"n" -
              ($"ry" * $"cy" + ($"n" - $"ry") * ($"n" - $"cy")))
            .cast("double"), 6).as("kappa"))
    },
    Some("""WITH flags AS (
           |  SELECT CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS r1,
           |    CASE WHEN event_type IN ('purchase', 'signup')
           |      THEN 1 ELSE 0 END AS r2
           |  FROM events
           |), agg AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END)
           |      AS HUGEINT) AS agree,
           |    CAST(sum(r1) AS HUGEINT) AS ry,
           |    CAST(sum(r2) AS HUGEINT) AS cy
           |  FROM flags
           |)
           |SELECT CAST(n AS BIGINT) AS n,
           |  CAST(agree AS BIGINT) AS n_agree,
           |  round(CAST(n * agree -
           |      (ry * cy + (n - ry) * (n - cy)) AS DOUBLE) /
           |    CAST(n * n -
           |      (ry * cy + (n - ry) * (n - cy)) AS DOUBLE), 6)
           |    AS kappa
           |FROM agg""".stripMargin))

  /** E201: **threshold-sweep precision/recall/F1** — the operating-
    * curve table behind every "pick a cutoff" decision, evaluating the
    * score rule (value ≥ t predicts purchase) at nine fixed
    * thresholds. The sweep is an explode of the threshold literals
    * over the scored rows — one pass, one (threshold) hash agg, no
    * join — and each metric is exact integers until its own single
    * division: F1 uses the 2tp/(2tp+fp+fn) identity so it never
    * touches the (rounded) precision/recall intermediates. At AUC-scale
    * data the explode multiplies the scan by 9; the recorded
    * alternative for wide sweeps is the E124 rank identity. */
  val qF1Threshold = Q("q_f1_threshold",
    (spark, sfDir) => {
      import spark.implicits._
      val scored = Tables.read(spark, sfDir, "events")
        .select($"value".as("s"),
          ($"event_type" === "purchase").cast("long").as("y"))
        .withColumn("threshold",
          explode(array((1 to 9).map(t => lit(t * 10.0)): _*)))
      scored
        .groupBy($"threshold")
        .agg(sum(when($"s" >= $"threshold" && $"y" === 1, 1L)
            .otherwise(0L)).as("tp"),
          sum(when($"s" >= $"threshold" && $"y" === 0, 1L)
            .otherwise(0L)).as("fp"),
          sum(when($"s" < $"threshold" && $"y" === 1, 1L)
            .otherwise(0L)).as("fn"))
        .select($"threshold", $"tp", $"fp", $"fn",
          round($"tp".cast("double") /
            ($"tp" + $"fp").cast("double"), 6).as("precision"),
          round($"tp".cast("double") /
            ($"tp" + $"fn").cast("double"), 6).as("recall"),
          round((lit(2L) * $"tp").cast("double") /
            (lit(2L) * $"tp" + $"fp" + $"fn").cast("double"), 6)
            .as("f1"))
        .orderBy($"threshold")
    },
    Some("""WITH sweep AS (
           |  SELECT CAST(t.k * 10 AS DOUBLE) AS threshold,
           |    e.value AS s,
           |    CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END
           |      AS y
           |  FROM events e, range(1, 10) t(k)
           |), agg AS (
           |  SELECT threshold,
           |    sum(CASE WHEN s >= threshold AND y = 1 THEN 1
           |      ELSE 0 END) AS tp,
           |    sum(CASE WHEN s >= threshold AND y = 0 THEN 1
           |      ELSE 0 END) AS fp,
           |    sum(CASE WHEN s < threshold AND y = 1 THEN 1
           |      ELSE 0 END) AS fn
           |  FROM sweep GROUP BY threshold
           |)
           |SELECT threshold, CAST(tp AS BIGINT) AS tp,
           |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
           |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
           |    AS precision,
           |  round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6)
           |    AS recall,
           |  round(CAST(2 * tp AS DOUBLE) /
           |    CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
           |FROM agg ORDER BY threshold""".stripMargin))

  /** E202: **time-weighted average (TWAP)** — per event type, the mean
    * of `value` weighted by how long each observation was "current"
    * (until the next event of that type), the correct average for
    * irregularly sampled state. Interval lengths stay INTEGER
    * MICROSECONDS (unix_micros/epoch_us — never a double seconds
    * conversion), values become DECIMAL(18,6), so Σ(v·Δt) and ΣΔt are
    * exact and order-free; one double division at the edge. One
    * per-type window sort (lead), one hash agg. */
  val qTwap = Q("q_twap",
    (spark, sfDir) => {
      import spark.implicits._
      val w = Window.partitionBy($"event_type")
        .orderBy($"ts", $"event_id")
      Tables.read(spark, sfDir, "events")
        .select($"event_type", $"ts", $"event_id",
          $"value".cast("decimal(18,6)").as("v"))
        .withColumn("dt",
          lead(unix_micros($"ts"), 1).over(w) - unix_micros($"ts"))
        .filter($"dt".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"dt").as("span_micros"),
          round(sum($"v" * $"dt").cast("double") /
            sum($"dt").cast("double"), 6).as("twap"))
        .orderBy($"event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
           |    CAST(value AS DECIMAL(18,6)) AS v
           |  FROM events
           |), stepped AS (
           |  SELECT event_type, v,
           |    lead(epoch_us(ts)) OVER (PARTITION BY event_type
           |      ORDER BY ts, event_id) - epoch_us(ts) AS dt
           |  FROM ev
           |)
           |SELECT event_type, count(*) AS n_intervals,
           |  CAST(sum(dt) AS BIGINT) AS span_micros,
           |  round(CAST(sum(v * dt) AS DOUBLE) /
           |    CAST(sum(dt) AS DOUBLE), 6) AS twap
           |FROM stepped WHERE dt IS NOT NULL
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** E203: **OHLC bars** — the canonical downsampling of a value
    * stream to per-(type, day) open/high/low/close plus count and
    * DECIMAL-exact volume, the shape every charting and monitoring
    * layer consumes. Open/close are row_number-pinned FIRST/LAST by
    * the total order (ts, event_id) — not first_value over an
    * under-specified frame, which ties would make engine-dependent.
    * One window sort per partition grain, one hash agg; bars are
    * (type × day), so output is bounded by the calendar, not the
    * data. Arithmetic is DECIMAL(18,6)-exact; the OUTPUT casts to
    * DOUBLE (both sides) so decimal trailing zeros can't split the
    * comparator's value hash — the r12 lesson. */
  val qOhlcBars = Q("q_ohlc_bars",
    (spark, sfDir) => {
      import spark.implicits._
      val grain = Seq($"event_type", $"d")
      val wAsc = Window.partitionBy(grain: _*)
        .orderBy($"ts".asc, $"event_id".asc)
      val wDesc = Window.partitionBy(grain: _*)
        .orderBy($"ts".desc, $"event_id".desc)
      Tables.read(spark, sfDir, "events")
        .select($"event_type", to_date($"ts").as("d"), $"ts",
          $"event_id", $"value".cast("decimal(18,6)").as("v"))
        .withColumn("rn_a", row_number().over(wAsc))
        .withColumn("rn_d", row_number().over(wDesc))
        .groupBy($"event_type", $"d")
        .agg(max(when($"rn_a" === 1, $"v")).cast("double").as("open"),
          max($"v").cast("double").as("high"),
          min($"v").cast("double").as("low"),
          max(when($"rn_d" === 1, $"v")).cast("double").as("close"),
          count(lit(1)).as("n"),
          sum($"v").cast("double").as("volume"))
        .orderBy($"event_type", $"d")
    },
    Some("""WITH ev AS (
           |  SELECT event_type,
           |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    CAST(ts AS TIMESTAMP) AS ts, event_id,
           |    CAST(value AS DECIMAL(18,6)) AS v
           |  FROM events
           |), numbered AS (
           |  SELECT event_type, d, v,
           |    row_number() OVER (PARTITION BY event_type, d
           |      ORDER BY ts, event_id) AS rn_a,
           |    row_number() OVER (PARTITION BY event_type, d
           |      ORDER BY ts DESC, event_id DESC) AS rn_d
           |  FROM ev
           |)
           |SELECT event_type, d,
           |  CAST(max(CASE WHEN rn_a = 1 THEN v END) AS DOUBLE) AS open,
           |  CAST(max(v) AS DOUBLE) AS high,
           |  CAST(min(v) AS DOUBLE) AS low,
           |  CAST(max(CASE WHEN rn_d = 1 THEN v END) AS DOUBLE) AS close,
           |  count(*) AS n, CAST(sum(v) AS DOUBLE) AS volume
           |FROM numbered GROUP BY event_type, d
           |ORDER BY event_type, d""".stripMargin))

  /** E204: **business-day arithmetic** — per order, working days
    * (Mon–Fri) between the order date and its last line-item ship
    * date, the SLA metric calendars make subtly wrong. CLOSED FORM,
    * not a calendar-spine join: with d = days since the Monday anchor
    * 1990-01-01, f(d) = 5·⌊d/7⌋ + min(d mod 7, 5) counts business
    * days from the anchor, and the answer is f(ship) − f(order) —
    * O(1) per row, no join, survives any date range. The result is a
    * SIGNED distance: the synthetic fixture ships some lines before
    * the order date, and the closed form handles both directions
    * (OperatorSuite pins sign, magnitude and week-floor bounds). Both mod and
    * floor-div are forced to EUCLIDEAN semantics (pmod + subtract-
    * then-divide) so pre-anchor dates don't split engines on negative
    * division. Result grain: one row per order (the max-ship rollup
    * is the only shuffle). */
  val qBusinessDays = Q("q_business_days",
    (spark, sfDir) => {
      import spark.implicits._
      def f(days: org.apache.spark.sql.Column) = {
        val m = pmod(days, lit(7))
        lit(5) * ((days - m) / 7).cast("long") + least(m, lit(5))
      }
      val lastShip = Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(max(to_date($"l_shipdate")).as("last_ship"))
      Tables.read(spark, sfDir, "orders")
        .join(lastShip, $"o_orderkey" === $"l_orderkey")
        .select($"o_orderkey", to_date($"o_orderdate").as("order_date"),
          $"last_ship",
          (f(datediff($"last_ship", lit("1990-01-01"))) -
            f(datediff(to_date($"o_orderdate"), lit("1990-01-01"))))
            .as("business_days"))
        .orderBy($"o_orderkey")
    },
    Some("""WITH last_ship AS (
           |  SELECT l_orderkey,
           |    max(CAST(l_shipdate AS DATE)) AS last_ship
           |  FROM lineitem GROUP BY 1
           |), diffs AS (
           |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           |    last_ship,
           |    CAST(last_ship - DATE '1990-01-01' AS BIGINT) AS d1,
           |    CAST(CAST(o_orderdate AS DATE) - DATE '1990-01-01'
           |      AS BIGINT) AS d0
           |  FROM orders JOIN last_ship ON o_orderkey = l_orderkey
           |)
           |SELECT o_orderkey, order_date, last_ship,
           |  (5 * ((d1 - ((d1 % 7) + 7) % 7) // 7)
           |     + least(((d1 % 7) + 7) % 7, 5))
           |  - (5 * ((d0 - ((d0 % 7) + 7) % 7) // 7)
           |     + least(((d0 % 7) + 7) % 7, 5)) AS business_days
           |FROM diffs ORDER BY o_orderkey""".stripMargin))

  /** E205: **Jensen–Shannon divergence** — how far apart two language
    * sub-corpora's token distributions sit, the symmetric bounded
    * cousin of KL that corpus-mixture work (E70) reads before
    * resampling: JSD = H(M) − (H(P)+H(Q))/2 with M the midpoint
    * mixture, in bits (log2, so 0 ≤ JSD ≤ 1). Token counts are exact
    * integers through a full-outer vocabulary join; the ≤vocab-sized
    * p·log2(p) sum is double rounded 6dp (the E147 entropy
    * tolerance). Two hash aggs + one vocabulary-sized join. */
  val qJsDivergence = Q("q_js_divergence",
    (spark, sfDir) => {
      import spark.implicits._
      def dist(lang: String) =
        Tables.read(spark, sfDir, "documents")
          .filter($"lang" === lang)
          .select(explode(split(trim($"text"), " ")).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("c"))
      val joined = dist("en").withColumnRenamed("c", "cp")
        .join(dist("de").withColumnRenamed("c", "cq"),
          Seq("tok"), "full_outer")
        .select($"tok", coalesce($"cp", lit(0L)).as("cp"),
          coalesce($"cq", lit(0L)).as("cq"))
      val tot = Window.partitionBy()
      val terms = joined
        .withColumn("np", sum($"cp").over(tot))
        .withColumn("nq", sum($"cq").over(tot))
        .withColumn("p", $"cp".cast("double") / $"np".cast("double"))
        .withColumn("q", $"cq".cast("double") / $"nq".cast("double"))
        .withColumn("m", ($"p" + $"q") / 2)
        .withColumn("term",
          when($"p" > 0, $"p" * log2($"p")).otherwise(lit(0.0)) / 2
            + when($"q" > 0, $"q" * log2($"q")).otherwise(lit(0.0)) / 2
            - when($"m" > 0, $"m" * log2($"m")).otherwise(lit(0.0)))
      terms.agg(max($"np").cast("long").as("n_tokens_p"),
          max($"nq").cast("long").as("n_tokens_q"),
          count(lit(1)).as("vocab"),
          round(sum($"term"), 6).as("jsd_bits"))
    },
    Some("""WITH p AS (
           |  SELECT unnest(string_split(trim(text), ' ')) AS tok
           |  FROM documents WHERE lang = 'en'
           |), q AS (
           |  SELECT unnest(string_split(trim(text), ' ')) AS tok
           |  FROM documents WHERE lang = 'de'
           |), pc AS (SELECT tok, count(*) AS cp FROM p GROUP BY tok),
           |qc AS (SELECT tok, count(*) AS cq FROM q GROUP BY tok),
           |joined AS (
           |  SELECT coalesce(pc.tok, qc.tok) AS tok,
           |    coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
           |  FROM pc FULL OUTER JOIN qc ON pc.tok = qc.tok
           |), framed AS (
           |  SELECT tok, cp, cq,
           |    sum(cp) OVER () AS np, sum(cq) OVER () AS nq
           |  FROM joined
           |), terms AS (
           |  SELECT np, nq,
           |    CAST(cp AS DOUBLE) / CAST(np AS DOUBLE) AS p,
           |    CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE) AS q
           |  FROM framed
           |), hterms AS (
           |  SELECT np, nq,
           |    (CASE WHEN p > 0 THEN p * log2(p) ELSE 0 END) / 2
           |    + (CASE WHEN q > 0 THEN q * log2(q) ELSE 0 END) / 2
           |    - (CASE WHEN (p + q) / 2 > 0
           |        THEN ((p + q) / 2) * log2((p + q) / 2)
           |        ELSE 0 END) AS term
           |  FROM terms
           |)
           |SELECT CAST(max(np) AS BIGINT) AS n_tokens_p,
           |  CAST(max(nq) AS BIGINT) AS n_tokens_q,
           |  count(*) AS vocab,
           |  round(sum(term), 6) AS jsd_bits
           |FROM hterms""".stripMargin))

  /** E206: **KMV (k-minimum-values) distinct estimator** — the
    * bottom-k sketch: hash every key to a uniform 60-bit value, keep
    * the k smallest, estimate |D| ≈ (k−1)·2⁶⁰/h₍ₖ₎. Complements HLL
    * (E44): KMV is the sketch whose *sample itself* is reusable (it IS
    * a uniform sample of the distinct set, mergeable by keep-k-min).
    * Portability is the whole trick here: the hash is the first 15 hex
    * digits of md5 — Spark `conv(...,16,10)`, DuckDB
    * `CAST('0x'||... AS BIGINT)` — so the oracle reproduces the
    * sketch BIT-FOR-BIT, no driver-gated tolerance needed; the audit
    * columns (exact distinct, relative error) make the estimate's
    * quality part of the hash-checked contract. The k-th minimum is a
    * TakeOrderedAndProject (sort-free top-k), not a global sort. */
  val qAggKmvDistinct = Q("q_agg_kmv_distinct",
    (spark, sfDir) => {
      import spark.implicits._
      val k = 256
      val keys = Tables.read(spark, sfDir, "lineitem")
        .select($"l_partkey").distinct()
        .withColumn("h",
          conv(substring(md5($"l_partkey".cast("string")
            .cast("binary")), 1, 15), 16, 10).cast("long"))
      val exact = keys.agg(count(lit(1)).as("n_exact"))
      val kth = keys.orderBy($"h").limit(k)
        .agg(max($"h").as("hk"), count(lit(1)).as("n_kept"))
      // under-full sketch (|D| < k) knows the exact count — the
      // standard KMV small-cardinality branch
      val est = when($"n_kept" < k, $"n_kept".cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
          $"hk".cast("double"))
      kth.crossJoin(broadcast(exact))
        .select($"n_exact", $"n_kept",
          round(est, 2).as("kmv_estimate"),
          round(abs(est - $"n_exact".cast("double")) /
            $"n_exact".cast("double"), 6).as("rel_error"))
    },
    Some("""WITH keys AS (
           |  SELECT DISTINCT l_partkey FROM lineitem
           |), hashed AS (
           |  SELECT CAST(concat('0x',
           |      substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
           |    AS BIGINT) AS h
           |  FROM keys
           |), kth AS (
           |  SELECT max(h) AS hk, count(*) AS n_kept
           |  FROM (SELECT h FROM hashed ORDER BY h LIMIT 256)
           |), exact AS (SELECT count(*) AS n_exact FROM keys),
           |est AS (
           |  SELECT n_exact, n_kept,
           |    CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
           |      ELSE 255.0 * power(2, 60) / CAST(hk AS DOUBLE) END
           |      AS e
           |  FROM kth, exact
           |)
           |SELECT n_exact, n_kept, round(e, 2) AS kmv_estimate,
           |  round(abs(e - CAST(n_exact AS DOUBLE)) /
           |    CAST(n_exact AS DOUBLE), 6) AS rel_error
           |FROM est""".stripMargin))

  /** E207: **array set algebra** — per document, the token set against
    * a fixed stopword list via array_distinct / array_intersect /
    * array_except / array_union, the row-local HOF family (F8's
    * lambda HOFs covered transform/filter/aggregate; this row covers
    * the SET operators). Everything is per-row — zero shuffles beyond
    * the output sort — and the output stays scalar counts plus a
    * deterministic alphabetical sample so the comparator never
    * depends on engine-internal array ordering. */
  val qArraySetops = Q("q_array_setops",
    (spark, sfDir) => {
      import spark.implicits._
      val stops = array(Seq("the", "a", "and", "row", "value", "table")
        .map(lit): _*)
      Tables.read(spark, sfDir, "documents")
        .select($"doc_id",
          array_distinct(split(trim($"text"), " ")).as("toks"))
        .select($"doc_id",
          size($"toks").as("n_distinct"),
          size(array_intersect($"toks", stops)).as("n_stop"),
          size(array_except($"toks", stops)).as("n_content"),
          size(array_union($"toks", stops)).as("n_union"),
          array_join(slice(array_sort(
            array_intersect($"toks", stops)), 1, 3), ",")
            .as("stop_sample"))
        .orderBy($"doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id,
           |    list_distinct(string_split(trim(text), ' ')) AS toks,
           |    ['the', 'a', 'and', 'row', 'value', 'table'] AS stops
           |  FROM documents
           |)
           |SELECT doc_id,
           |  CAST(len(toks) AS INTEGER) AS n_distinct,
           |  CAST(len(list_intersect(toks, stops)) AS INTEGER)
           |    AS n_stop,
           |  CAST(len(list_filter(toks, t -> NOT list_contains(stops, t)))
           |    AS INTEGER) AS n_content,
           |  CAST(len(list_distinct(list_concat(toks, stops)))
           |    AS INTEGER) AS n_union,
           |  coalesce(array_to_string(
           |    list_sort(list_intersect(toks, stops))[1:3], ','), '')
           |    AS stop_sample
           |FROM toks ORDER BY doc_id""".stripMargin))

  /** E208: **Wald–Wolfowitz runs test** — is the daily event count
    * pattern above/below its mean RANDOM in time, the change/cycle
    * detector that complements CUSUM-style monitoring (state-machine
    * audit, E150-family). Dichotomizing against the MEAN (not the
    * median) keeps the cut integer-exact: day t is "above" iff
    * n·yₜ > S, so the flags, the run count (lag-change sum + 1 over
    * the date order) and both group sizes are exact integers; the z
    * statistic's μ and σ evaluate from those integers in ONE double
    * expression shape shared with the oracle. */
  val qRunsTest = Q("q_runs_test",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val seq = Window.orderBy($"d")
      val flagged = Tables.read(spark, sfDir, "events")
        .groupBy(to_date($"ts").as("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("n", count(lit(1)).over(tot))
        .withColumn("s", sum($"y").over(tot))
        .filter($"n" * $"y" =!= $"s")
        .withColumn("above", ($"n" * $"y" > $"s").cast("long"))
        .withColumn("chg",
          when(lag($"above", 1).over(seq).isNull, 1L)
            .when(lag($"above", 1).over(seq) =!= $"above", 1L)
            .otherwise(0L))
      flagged
        .agg(sum($"above").as("n1"),
          sum(lit(1L) - $"above").as("n2"),
          sum($"chg").as("n_runs"))
        .select($"n1", $"n2", $"n_runs",
          round(($"n_runs".cast("double") -
            (lit(2.0) * $"n1" * $"n2" / ($"n1" + $"n2") + 1.0)) /
            sqrt(lit(2.0) * $"n1" * $"n2" *
              (lit(2.0) * $"n1" * $"n2" - $"n1" - $"n2") /
              (($"n1" + $"n2") * ($"n1" + $"n2") *
                ($"n1" + $"n2" - 1)).cast("double")), 6).as("z"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    count(*) AS y
           |  FROM events GROUP BY 1
           |), framed AS (
           |  SELECT d, y, count(*) OVER () AS n, sum(y) OVER () AS s
           |  FROM daily
           |), flagged AS (
           |  SELECT d,
           |    CASE WHEN n * y > s THEN 1 ELSE 0 END AS above
           |  FROM framed WHERE n * y <> s
           |), runs AS (
           |  SELECT above,
           |    CASE WHEN lag(above) OVER (ORDER BY d) IS NULL THEN 1
           |      WHEN lag(above) OVER (ORDER BY d) <> above THEN 1
           |      ELSE 0 END AS chg
           |  FROM flagged
           |), agg AS (
           |  SELECT CAST(sum(above) AS BIGINT) AS n1,
           |    CAST(sum(1 - above) AS BIGINT) AS n2,
           |    CAST(sum(chg) AS BIGINT) AS n_runs
           |  FROM runs
           |)
           |SELECT n1, n2, n_runs,
           |  round((CAST(n_runs AS DOUBLE) -
           |    (2.0 * n1 * n2 / (n1 + n2) + 1.0)) /
           |    sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
           |      CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)
           |        AS DOUBLE)), 6) AS z
           |FROM agg""".stripMargin))

  /** E209: **Q–Q quantile mapping** — the decile-by-decile value
    * comparison of two score distributions (purchase vs click), the
    * table a quantile-mapping calibration or drift investigation
    * reads. Quantiles are TYPE-1 (value at row ⌈q·n⌉ of the sorted
    * group) pinned by explicit row_number arithmetic on BOTH engines —
    * never a built-in `quantile`/`percentile` whose interpolation
    * conventions differ. The decile grid explodes from literals onto
    * the per-group row counts; everything joins on exact integer
    * positions. */
  val qQqMap = Q("q_qq_map",
    (spark, sfDir) => {
      import spark.implicits._
      val ranked = Tables.read(spark, sfDir, "events")
        .filter($"event_type".isin("purchase", "click"))
        .select($"event_type", $"value".as("v"), $"event_id")
        .withColumn("rn", row_number().over(Window
          .partitionBy($"event_type").orderBy($"v", $"event_id")))
        .withColumn("n", count(lit(1)).over(Window
          .partitionBy($"event_type")))
      val grid = ranked
        .withColumn("q",
          explode(array((1 to 9).map(i => lit(i / 10.0)): _*)))
        .filter($"rn" === ceil($"q" * $"n").cast("long"))
      grid.groupBy($"q")
        .agg(max(when($"event_type" === "purchase", $"v"))
            .as("purchase_value"),
          max(when($"event_type" === "click", $"v")).as("click_value"))
        .select($"q", $"purchase_value", $"click_value",
          round($"purchase_value" - $"click_value", 6).as("gap"))
        .orderBy($"q")
    },
    Some("""WITH ranked AS (
           |  SELECT event_type, value AS v,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY value, event_id) AS rn,
           |    count(*) OVER (PARTITION BY event_type) AS n
           |  FROM events WHERE event_type IN ('purchase', 'click')
           |), grid AS (
           |  SELECT event_type, v, CAST(k AS DOUBLE) / 10.0 AS q
           |  FROM ranked, range(1, 10) t(k)
           |  WHERE rn = CAST(ceil(CAST(k AS DOUBLE) / 10.0 * n)
           |    AS BIGINT)
           |)
           |SELECT q,
           |  max(CASE WHEN event_type = 'purchase' THEN v END)
           |    AS purchase_value,
           |  max(CASE WHEN event_type = 'click' THEN v END)
           |    AS click_value,
           |  round(max(CASE WHEN event_type = 'purchase' THEN v END)
           |    - max(CASE WHEN event_type = 'click' THEN v END), 6)
           |    AS gap
           |FROM grid GROUP BY q ORDER BY q""".stripMargin))

  /** E210: **mergeable KMV rollup** — the composable-pre-agg
    * architecture (E44/E51/E61: roll up once per grain, merge at query
    * time, never rescan) on the custom [[graft.functions.KmvSketchAgg]]
    * `TypedImperativeAggregate`: per-source KMV sketches of document
    * content hashes, then ONE `kmv_merge_agg` re-aggregation for the
    * global distinct estimate — and because a KMV's state is the
    * deterministic k smallest distinct hashes, the DuckDB oracle
    * reproduces every estimate EXACTLY with row_number arithmetic (no
    * driver-gated tolerance, unlike the other three sketches). At
    * sf0.01 every source is under-full (exact branch) while the merged
    * ALL row exercises the real estimator; the sketch property that
    * makes the merge exact — the global k smallest hashes are each
    * inside their own source's k smallest — is the same property that
    * makes per-day/per-tenant rollups safely re-aggregable at 100 TB. */
  val qAggKmvMerge = Q("q_agg_kmv_merge",
    (spark, sfDir) => {
      import spark.implicits._
      val per = Tables.read(spark, sfDir, "documents")
        .select($"source",
          conv(substring(md5($"text".cast("binary")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          call_function("kmv_sketch_agg", $"h", lit(128)).as("sk"))
        .localCheckpoint()
      val srcRows = per.select($"source", $"n_docs",
        call_function("kmv_kept", $"sk").as("n_kept"),
        round(call_function("kmv_estimate", $"sk"), 2)
          .as("kmv_estimate"))
      val allRow = per
        .agg(sum($"n_docs").as("n_docs"),
          call_function("kmv_merge_agg", $"sk").as("sk"))
        .select(lit("ALL").as("source"), $"n_docs",
          call_function("kmv_kept", $"sk").as("n_kept"),
          round(call_function("kmv_estimate", $"sk"), 2)
            .as("kmv_estimate"))
      srcRows.unionByName(allRow).orderBy($"source")
    },
    Some("""WITH hashed AS (
           |  SELECT source,
           |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
           |      AS h
           |  FROM documents
           |), counts AS (
           |  SELECT source, count(*) AS n_docs
           |  FROM documents GROUP BY source
           |), dist AS (
           |  SELECT source, h FROM hashed GROUP BY source, h
           |), ranked AS (
           |  SELECT source, h,
           |    row_number() OVER (PARTITION BY source ORDER BY h)
           |      AS rn,
           |    count(*) OVER (PARTITION BY source) AS nd
           |  FROM dist
           |), sel AS (
           |  SELECT source, max(CASE WHEN rn = 128 THEN h END) AS h128,
           |    max(nd) AS nd
           |  FROM ranked GROUP BY source
           |), src AS (
           |  SELECT c.source, c.n_docs,
           |    CAST(least(s.nd, 128) AS INTEGER) AS n_kept,
           |    round(CASE WHEN s.nd < 128 THEN CAST(s.nd AS DOUBLE)
           |      ELSE 127.0 * power(2, 60) / CAST(s.h128 AS DOUBLE)
           |      END, 2) AS kmv_estimate
           |  FROM counts c JOIN sel s ON c.source = s.source
           |), gdist AS (SELECT h FROM hashed GROUP BY h),
           |granked AS (
           |  SELECT h, row_number() OVER (ORDER BY h) AS rn,
           |    count(*) OVER () AS nd
           |  FROM gdist
           |), gsel AS (
           |  SELECT max(CASE WHEN rn = 128 THEN h END) AS h128,
           |    max(nd) AS nd
           |  FROM granked
           |), allrow AS (
           |  SELECT 'ALL' AS source,
           |    (SELECT CAST(sum(n_docs) AS BIGINT) FROM counts)
           |      AS n_docs,
           |    CAST(least(nd, 128) AS INTEGER) AS n_kept,
           |    round(CASE WHEN nd < 128 THEN CAST(nd AS DOUBLE)
           |      ELSE 127.0 * power(2, 60) / CAST(h128 AS DOUBLE)
           |      END, 2) AS kmv_estimate
           |  FROM gsel
           |)
           |SELECT * FROM src
           |UNION ALL SELECT * FROM allrow
           |ORDER BY source""".stripMargin))

  /** E211: **MAD robust outliers** — daily event counts scored by the
    * median-absolute-deviation z (0.6745·(y−med)/MAD, the robust twin
    * of the rolling mean±kσ detector E175 that a single spike cannot
    * poison, because both location and scale are medians). Both
    * medians are TYPE-1 (value at row ⌈n/2⌉ of the explicit
    * row_number order with the date as tiebreaker — the E209
    * convention, never an engine `median()` whose even-n interpolation
    * differs), so every intermediate is an exact integer and the z
    * division is the one double at the edge. */
  val qAnomalyMad = Q("q_anomaly_mad",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val daily = Tables.read(spark, sfDir, "events")
        .groupBy(to_date($"ts").as("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("rn",
          row_number().over(Window.orderBy($"y", $"d")))
        .withColumn("n", count(lit(1)).over(tot))
        .withColumn("med", max(when($"rn" ===
          (($"n" + 1) / 2).cast("long"), $"y")).over(tot))
        .withColumn("dev", abs($"y" - $"med"))
        .withColumn("rn2",
          row_number().over(Window.orderBy($"dev", $"d")))
        .withColumn("mad", max(when($"rn2" ===
          (($"n" + 1) / 2).cast("long"), $"dev")).over(tot))
      // z stays UNROUNDED: both engines build it from identical
      // integers with the same op shape, so the doubles are
      // bit-identical — while round() itself is the one place the
      // engines can disagree (Spark BigDecimal HALF_UP vs DuckDB's
      // scaled-multiply) when a value lands on a 6dp midpoint, which
      // this query's 0.6745·k/mad values measurably do (r12 dev run:
      // 0.2529375 rounded 38 vs 37).
      daily.select($"d", $"y", $"med", $"mad",
          (lit(0.6745) * ($"y" - $"med").cast("double") /
            $"mad".cast("double")).as("robust_z"))
        .withColumn("is_outlier", abs($"robust_z") > 3.5)
        .orderBy($"d")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    count(*) AS y
           |  FROM events GROUP BY 1
           |), ranked AS (
           |  SELECT d, y,
           |    row_number() OVER (ORDER BY y, d) AS rn,
           |    count(*) OVER () AS n
           |  FROM daily
           |), withmed AS (
           |  SELECT d, y, n,
           |    max(CASE WHEN rn = (n + 1) // 2 THEN y END) OVER ()
           |      AS med
           |  FROM ranked
           |), devranked AS (
           |  SELECT d, y, med, abs(y - med) AS dev, n,
           |    row_number() OVER (ORDER BY abs(y - med), d) AS rn2
           |  FROM withmed
           |), withmad AS (
           |  SELECT d, y, med, dev,
           |    max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END) OVER ()
           |      AS mad
           |  FROM devranked
           |)
           |SELECT d, y, med, mad,
           |  0.6745 * CAST(y - med AS DOUBLE) /
           |    CAST(mad AS DOUBLE) AS robust_z,
           |  abs(0.6745 * CAST(y - med AS DOUBLE) /
           |    CAST(mad AS DOUBLE)) > 3.5 AS is_outlier
           |FROM withmad ORDER BY d""".stripMargin))

  /** E216: **Kaplan–Meier survival curve** — the product-limit
    * estimator for TIME TO REPEAT PURCHASE: per customer, days from
    * first to second order ("event"); single-order customers are
    * CENSORED at the horizon (they may still return) — the right-
    * censoring correction naive repeat-rate curves (E39's retention)
    * ignore, and the exact shape of the published 4CE survival
    * figures on the harness's commerce tables. (The event stream
    * can't drive this one: measured, all 150 fixture users stay
    * active into the final week, so a churn rule yields zero events.)
    * Risk sets and event counts are exact integers from one
    * cumulative window; the running product Π(1−dᵢ/nᵢ) evaluates as
    * exp(Σ ln(...)) — the E147/E122 log parity both engines have
    * agreed on all round — with an explicit d=n flag instead of
    * ln(0) (which DuckDB raises on). */
  val qSurvivalKm = Q("q_survival_km",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val seqW = Window.orderBy($"lt")
      val cumW = seqW.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val prevW = seqW.rowsBetween(Window.unboundedPreceding, -1)
      val users = Tables.read(spark, sfDir, "orders")
        .select($"o_custkey", to_date($"o_orderdate").as("d"),
          $"o_orderkey")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"o_custkey")
            .orderBy($"d", $"o_orderkey")))
        .withColumn("horizon", max($"d").over(tot))
        .filter($"rn" <= 2)
        .groupBy($"o_custkey")
        .agg(min($"d").as("first_d"),
          max(when($"rn" === 2, $"d")).as("second_d"),
          max($"horizon").as("horizon"))
        .select(
          when($"second_d".isNotNull, datediff($"second_d", $"first_d"))
            .otherwise(datediff($"horizon", $"first_d")).as("lt"),
          $"second_d".isNotNull.cast("long").as("churn"))
      val steps = users.groupBy($"lt")
        .agg(sum($"churn").as("d"), count(lit(1)).as("m"))
        .withColumn("total", sum($"m").over(tot))
        .withColumn("n_risk",
          $"total" - coalesce(sum($"m").over(prevW), lit(0L)))
        .withColumn("dead_end",
          max(($"d" === $"n_risk").cast("int")).over(cumW))
        .withColumn("lsum", sum(when($"d" < $"n_risk",
          log(lit(1.0) - $"d".cast("double") /
            $"n_risk".cast("double")))).over(cumW))
      steps.filter($"d" > 0)
        .select($"lt".as("t_days"), $"n_risk", $"d".as("n_events"),
          round(when($"dead_end" === 1, lit(0.0))
            .otherwise(exp($"lsum")), 6).as("survival"))
        .orderBy($"t_days")
    },
    Some("""WITH ranked AS (
           |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           |    row_number() OVER (PARTITION BY o_custkey
           |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
           |      AS rn
           |  FROM orders
           |), users AS (
           |  SELECT o_custkey, min(d) AS first_d,
           |    max(CASE WHEN rn = 2 THEN d END) AS second_d
           |  FROM ranked WHERE rn <= 2 GROUP BY o_custkey
           |), lts AS (
           |  SELECT CASE WHEN second_d IS NOT NULL
           |      THEN CAST(second_d - first_d AS INTEGER)
           |      ELSE CAST((SELECT max(CAST(o_orderdate AS DATE))
           |        FROM orders) - first_d AS INTEGER) END AS lt,
           |    CASE WHEN second_d IS NOT NULL THEN 1 ELSE 0 END
           |      AS churn
           |  FROM users
           |), steps AS (
           |  SELECT lt, CAST(sum(churn) AS BIGINT) AS d,
           |    count(*) AS m
           |  FROM lts GROUP BY lt
           |), risked AS (
           |  SELECT lt, d, m,
           |    sum(m) OVER () -
           |      coalesce(sum(m) OVER (ORDER BY lt
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |        0) AS n_risk
           |  FROM steps
           |), cum AS (
           |  SELECT lt, d, n_risk,
           |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
           |      OVER (ORDER BY lt) AS dead_end,
           |    sum(CASE WHEN d < n_risk THEN
           |        ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
           |      END) OVER (ORDER BY lt) AS lsum
           |  FROM risked
           |)
           |SELECT lt AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           |  d AS n_events,
           |  round(CASE WHEN dead_end = 1 THEN 0.0
           |    ELSE exp(lsum) END, 6) AS survival
           |FROM cum WHERE d > 0 ORDER BY t_days""".stripMargin))

  /** E217: **named WINDOW clause** — the SQL-text surface for shared
    * window definitions (`WINDOW w AS (...)` reused by several
    * functions), which both engines parse but project docs rarely
    * test: one definition drives rank, cumulative share and a moving
    * average per event type. Per-invocation view names follow the
    * qSqlRecursive concurrency rule. The top-3 filter keeps output
    * bounded and the (value, event_id) tiebreak keeps it total-
    * ordered. */
  val qSqlWindowClause = Q("q_sql_window_clause",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"wc_events_$tag"
      Tables.read(spark, sfDir, "events").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""SELECT event_type, event_id, value, rk, cum_n, mov_avg
             |FROM (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER w AS rk,
             |    count(*) OVER w AS cum_n,
             |    round(avg(value) OVER wm, 6) AS mov_avg
             |  FROM $v
             |  WINDOW w AS (PARTITION BY event_type
             |      ORDER BY value DESC, event_id),
             |    wm AS (PARTITION BY event_type
             |      ORDER BY value DESC, event_id
             |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |)
             |WHERE rk <= 3
             |ORDER BY event_type, rk""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""SELECT event_type, event_id, value, rk, cum_n, mov_avg
           |FROM (
           |  SELECT event_type, event_id, value,
           |    row_number() OVER w AS rk,
           |    count(*) OVER w AS cum_n,
           |    round(avg(value) OVER wm, 6) AS mov_avg
           |  FROM events
           |  WINDOW w AS (PARTITION BY event_type
           |      ORDER BY value DESC, event_id),
           |    wm AS (PARTITION BY event_type
           |      ORDER BY value DESC, event_id
           |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           |)
           |WHERE rk <= 3
           |ORDER BY event_type, rk""".stripMargin))

  /** E218: **Tukey fences** — the grouped IQR outlier profile (per
    * market segment over per-customer spend): Q1/Q3 as TYPE-1
    * quantiles at explicit ⌈q·n⌉ row positions (the E209 convention —
    * 0.25/0.75 are exact binary so the positions are engine-proof),
    * fences at 1.5·IQR, and outlier counts on both tails. The grouped
    * complement to the global MAD detector (E211): spend stays
    * DECIMAL(18,2) through the quantile pick, the fence compare
    * happens in double identically on both engines, and the q1/q3
    * OUTPUT columns cast to DOUBLE (r12 hash canon — a quantile
    * landing on a trailing-zero cent value would otherwise split the
    * comparator). */
  val qTukeyFences = Q("q_tukey_fences",
    (spark, sfDir) => {
      import spark.implicits._
      val grp = Window.partitionBy($"c_mktsegment")
      val spend = Tables.read(spark, sfDir, "customer")
        .join(Tables.read(spark, sfDir, "orders"),
          $"c_custkey" === $"o_custkey")
        .groupBy($"c_mktsegment", $"c_custkey")
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("s"))
        .withColumn("rn", row_number().over(grp
          .orderBy($"s", $"c_custkey")))
        .withColumn("n", count(lit(1)).over(grp))
        .withColumn("q1", max(when($"rn" ===
          ceil(lit(0.25) * $"n").cast("long"), $"s")).over(grp))
        .withColumn("q3", max(when($"rn" ===
          ceil(lit(0.75) * $"n").cast("long"), $"s")).over(grp))
      spend
        .withColumn("lo",
          $"q1".cast("double") - lit(1.5) *
            ($"q3" - $"q1").cast("double"))
        .withColumn("hi",
          $"q3".cast("double") + lit(1.5) *
            ($"q3" - $"q1").cast("double"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          max($"q1").cast("double").as("q1"),
          max($"q3").cast("double").as("q3"),
          sum(($"s".cast("double") < $"lo").cast("long"))
            .as("n_low_outliers"),
          sum(($"s".cast("double") > $"hi").cast("long"))
            .as("n_high_outliers"))
        .orderBy($"c_mktsegment")
    },
    Some("""WITH spend AS (
           |  SELECT c_mktsegment, c_custkey,
           |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
           |  FROM customer JOIN orders ON c_custkey = o_custkey
           |  GROUP BY 1, 2
           |), ranked AS (
           |  SELECT c_mktsegment, s,
           |    row_number() OVER (PARTITION BY c_mktsegment
           |      ORDER BY s, c_custkey) AS rn,
           |    count(*) OVER (PARTITION BY c_mktsegment) AS n
           |  FROM spend
           |), quarts AS (
           |  SELECT c_mktsegment, s,
           |    max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
           |      THEN s END) OVER (PARTITION BY c_mktsegment) AS q1,
           |    max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
           |      THEN s END) OVER (PARTITION BY c_mktsegment) AS q3
           |  FROM ranked
           |), fenced AS (
           |  SELECT c_mktsegment, s, q1, q3,
           |    CAST(q1 AS DOUBLE) - 1.5 * CAST(q3 - q1 AS DOUBLE)
           |      AS lo,
           |    CAST(q3 AS DOUBLE) + 1.5 * CAST(q3 - q1 AS DOUBLE)
           |      AS hi
           |  FROM quarts
           |)
           |SELECT c_mktsegment, count(*) AS n_customers,
           |  CAST(max(q1) AS DOUBLE) AS q1,
           |  CAST(max(q3) AS DOUBLE) AS q3,
           |  CAST(sum(CASE WHEN CAST(s AS DOUBLE) < lo THEN 1
           |    ELSE 0 END) AS BIGINT) AS n_low_outliers,
           |  CAST(sum(CASE WHEN CAST(s AS DOUBLE) > hi THEN 1
           |    ELSE 0 END) AS BIGINT) AS n_high_outliers
           |FROM fenced GROUP BY c_mktsegment ORDER BY c_mktsegment"""
      .stripMargin))

  /** E219: **NOT IN vs NOT EXISTS null semantics** — the SQL-surface
    * row for the classic three-valued-logic trap: `x NOT IN (subquery)`
    * returns UNKNOWN (→ no row) for EVERY x once the subquery yields a
    * single NULL, while `NOT EXISTS` still computes the intended
    * complement. The probe set injects one NULL deliberately; the
    * output counts all four quantifier forms side by side, so the
    * not_in=0 row IS the documented behavior, hash-locked on both
    * engines (both implement standard semantics — the point is the
    * library exposes and pins it, because a migration from an engine
    * with nonstandard NOT IN handling silently changes results). */
  val qSqlNotInNull = Q("q_sql_not_in_null",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val vc = s"nin_customer_$tag"
      val vn = s"nin_nation_$tag"
      Tables.read(spark, sfDir, "customer").createOrReplaceTempView(vc)
      Tables.read(spark, sfDir, "nation").createOrReplaceTempView(vn)
      try {
        spark.sql(
          s"""WITH probe AS (
             |  SELECT CASE WHEN n_nationkey = 3 THEN NULL
             |    ELSE n_nationkey END AS k
             |  FROM $vn WHERE n_nationkey < 10
             |)
             |SELECT 'in' AS semantics, count(*) AS n_rows
             |FROM $vc WHERE c_nationkey IN (SELECT k FROM probe)
             |UNION ALL
             |SELECT 'not_in', count(*)
             |FROM $vc WHERE c_nationkey NOT IN (SELECT k FROM probe)
             |UNION ALL
             |SELECT 'exists', count(*)
             |FROM $vc c WHERE EXISTS (SELECT 1 FROM probe p
             |  WHERE p.k = c.c_nationkey)
             |UNION ALL
             |SELECT 'not_exists', count(*)
             |FROM $vc c WHERE NOT EXISTS (SELECT 1 FROM probe p
             |  WHERE p.k = c.c_nationkey)
             |ORDER BY semantics""".stripMargin)
      } finally {
        spark.catalog.dropTempView(vc)
        spark.catalog.dropTempView(vn)
        ()
      }
    },
    Some("""WITH probe AS (
           |  SELECT CASE WHEN n_nationkey = 3 THEN NULL
           |    ELSE n_nationkey END AS k
           |  FROM nation WHERE n_nationkey < 10
           |)
           |SELECT 'in' AS semantics, count(*) AS n_rows
           |FROM customer WHERE c_nationkey IN (SELECT k FROM probe)
           |UNION ALL
           |SELECT 'not_in', count(*)
           |FROM customer WHERE c_nationkey NOT IN (SELECT k FROM probe)
           |UNION ALL
           |SELECT 'exists', count(*)
           |FROM customer c WHERE EXISTS (SELECT 1 FROM probe p
           |  WHERE p.k = c.c_nationkey)
           |UNION ALL
           |SELECT 'not_exists', count(*)
           |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM probe p
           |  WHERE p.k = c.c_nationkey)
           |ORDER BY semantics""".stripMargin))

  /** E220: **additive seasonal decomposition** — daily event counts
    * split into trend + weekday seasonal + residual, the classical
    * decomposition behind every "is this drop real or just Tuesday"
    * question (the component view of E164's seasonal index). Kept
    * engine-exact by SCALING, not rounding: the centered 7-day trend
    * stays ×7 integral (t7 = Σ of the full window, rows with all 7
    * days only), the detrended series 7y−t7 is integral, and the
    * weekday effect is its integer sum over each ISO weekday (the
    * E164 weekday()+1 ≡ isodow pin). Every output column is ONE
    * division (or subtraction) of identical integer-derived doubles
    * on both engines, so values ship UNROUNDED (the E211 lesson:
    * round() is the only step the engines can disagree on). */
  val qSeasonalDecompose = Q("q_seasonal_decompose",
    (spark, sfDir) => {
      import spark.implicits._
      val ctr = Window.orderBy($"d").rowsBetween(-3, 3)
      val daily = Tables.read(spark, sfDir, "events")
        .groupBy(to_date($"ts").as("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("t7", sum($"y").over(ctr))
        .withColumn("n7", count(lit(1)).over(ctr))
        .filter($"n7" === 7)
        .withColumn("detr", lit(7) * $"y" - $"t7")
        .withColumn("w", (weekday($"d") + 1).cast("int"))
      val byW = Window.partitionBy($"w")
      daily
        .withColumn("sw", sum($"detr").over(byW))
        .withColumn("kw", count(lit(1)).over(byW))
        .select($"d", $"y",
          ($"t7".cast("double") / 7.0).as("trend"),
          ($"sw".cast("double") / (lit(7.0) * $"kw")).as("seasonal"),
          ($"y".cast("double") - $"t7".cast("double") / 7.0 -
            $"sw".cast("double") / (lit(7.0) * $"kw")).as("residual"))
        .orderBy($"d")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    count(*) AS y
           |  FROM events GROUP BY 1
           |), framed AS (
           |  SELECT d, y,
           |    sum(y) OVER (ORDER BY d
           |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
           |    count(*) OVER (ORDER BY d
           |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
           |  FROM daily
           |), full7 AS (
           |  SELECT d, y, t7, 7 * y - t7 AS detr, isodow(d) AS w
           |  FROM framed WHERE n7 = 7
           |), grouped AS (
           |  SELECT d, y, t7,
           |    sum(detr) OVER (PARTITION BY w) AS sw,
           |    count(*) OVER (PARTITION BY w) AS kw
           |  FROM full7
           |)
           |SELECT d, y,
           |  CAST(t7 AS DOUBLE) / 7.0 AS trend,
           |  CAST(sw AS DOUBLE) / (7.0 * kw) AS seasonal,
           |  CAST(y AS DOUBLE) - CAST(t7 AS DOUBLE) / 7.0 -
           |    CAST(sw AS DOUBLE) / (7.0 * kw) AS residual
           |FROM grouped ORDER BY d""".stripMargin))

  /** E224: **multi-aggregate pivot** — the R1 pivot with TWO measures
    * per pivot value (status → sum of spend AND order count), the
    * report shape where Spark's `{value}_{alias}` column naming
    * actually matters: every output column is aliased identically on
    * both sides (`F_spend`, `F_cnt`, …), because the comparator's
    * column-name contract is exactly what a silent naming drift would
    * break. Explicit pivot value list (F/O/P) keeps the plan a single
    * hash agg — no distinct-values pre-pass — and spend stays
    * DECIMAL(18,2). */
  val qPivotMultiAgg = Q("q_pivot_multi_agg",
    (spark, sfDir) => {
      import spark.implicits._
      val pivoted = Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("spend"),
          count(lit(1)).as("cnt"))
      // decimal-exact sums; DOUBLE at the output edge (r12 hash canon)
      Seq("F", "O", "P").foldLeft(pivoted) { (df, s) =>
        df.withColumn(s"${s}_spend", col(s"${s}_spend").cast("double"))
      }.orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  CAST(sum(CASE WHEN o_orderstatus = 'F'
           |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
           |    AS DOUBLE) AS F_spend,
           |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
           |    AS F_cnt,
           |  CAST(sum(CASE WHEN o_orderstatus = 'O'
           |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
           |    AS DOUBLE) AS O_spend,
           |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END)
           |    AS O_cnt,
           |  CAST(sum(CASE WHEN o_orderstatus = 'P'
           |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
           |    AS DOUBLE) AS P_spend,
           |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END)
           |    AS P_cnt
           |FROM orders GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** E226: **modern-SQL sugar surface** — the two conveniences an
    * analyst's first migrated query hits: an inline `VALUES` table
    * (the ad-hoc mapping nobody wants to persist — here a
    * segment→tier map joined straight into the aggregate) and
    * star-minus projection (`SELECT * EXCEPT(...)` in Spark; the
    * oracle mirrors it with DuckDB's `* EXCLUDE` spelling — same
    * feature, different keyword, exactly the migration footgun worth
    * pinning). The broadcast of the 5-row VALUES relation is
    * automatic. */
  val qSqlSugar = Q("q_sql_sugar",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val vc = s"sugar_customer_$tag"
      Tables.read(spark, sfDir, "customer").createOrReplaceTempView(vc)
      try {
        spark.sql(
          s"""SELECT * EXCEPT (helper)
             |FROM (
             |  SELECT t.tier, count(*) AS n_customers,
             |    CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2)
             |      AS DOUBLE) AS total_bal,
             |    'drop-me' AS helper
             |  FROM $vc c
             |  JOIN (VALUES ('BUILDING', 'b2b'), ('MACHINERY', 'b2b'),
             |               ('AUTOMOBILE', 'b2c'), ('HOUSEHOLD', 'b2c'),
             |               ('FURNITURE', 'b2c')) AS t(seg, tier)
             |    ON c.c_mktsegment = t.seg
             |  GROUP BY t.tier
             |)
             |ORDER BY tier""".stripMargin)
      } finally {
        spark.catalog.dropTempView(vc)
        ()
      }
    },
    Some("""SELECT * EXCLUDE (helper)
           |FROM (
           |  SELECT t.tier, count(*) AS n_customers,
           |    CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2)
           |      AS DOUBLE) AS total_bal,
           |    'drop-me' AS helper
           |  FROM customer c
           |  JOIN (VALUES ('BUILDING', 'b2b'), ('MACHINERY', 'b2b'),
           |               ('AUTOMOBILE', 'b2c'), ('HOUSEHOLD', 'b2c'),
           |               ('FURNITURE', 'b2c')) AS t(seg, tier)
           |    ON c.c_mktsegment = t.seg
           |  GROUP BY t.tier
           |)
           |ORDER BY tier""".stripMargin))

  /** E228: **rolling OLS slope** — the 7-day trailing trend of daily
    * event counts, the "which way is this metric heading" signal
    * monitoring overlays on every chart (the windowed sibling of the
    * global regression aggregates E-regr and the level-based rolling
    * anomaly E175). Fully integer until the edge: day index x =
    * days-since-first-day, and all four frame sums (Σx, Σy, Σxy, Σx²)
    * accumulate over the 7-row window as DECIMAL(38,0)/HUGEINT, so
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is one double division,
    * rounded 6dp, per full window. */
  val qRollingSlope = Q("q_rolling_slope",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val frame = Window.orderBy($"d").rowsBetween(-6, 0)
      Tables.read(spark, sfDir, "events")
        .groupBy(to_date($"ts").as("d"))
        .agg(count(lit(1)).as("y"))
        .withColumn("x",
          datediff($"d", min($"d").over(tot)).cast("decimal(38,0)"))
        .withColumn("yy", $"y".cast("decimal(38,0)"))
        .withColumn("nw", count(lit(1)).over(frame))
        .withColumn("sx", sum($"x").over(frame))
        .withColumn("sy", sum($"yy").over(frame))
        .withColumn("sxy", sum($"x" * $"yy").over(frame))
        .withColumn("sx2", sum($"x" * $"x").over(frame))
        .filter($"nw" === 7)
        .select($"d", $"y",
          round((lit(7) * $"sxy" - $"sx" * $"sy").cast("double") /
            (lit(7) * $"sx2" - $"sx" * $"sx").cast("double"), 6)
            .as("slope_7d"))
        .orderBy($"d")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    count(*) AS y
           |  FROM events GROUP BY 1
           |), indexed AS (
           |  SELECT d, y,
           |    CAST(d - min(d) OVER () AS HUGEINT) AS x,
           |    CAST(y AS HUGEINT) AS yy
           |  FROM daily
           |), framed AS (
           |  SELECT d, y,
           |    count(*) OVER w AS nw,
           |    sum(x) OVER w AS sx, sum(yy) OVER w AS sy,
           |    sum(x * yy) OVER w AS sxy, sum(x * x) OVER w AS sx2
           |  FROM indexed
           |  WINDOW w AS (ORDER BY d
           |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
           |)
           |SELECT d, y,
           |  round(CAST(7 * sxy - sx * sy AS DOUBLE) /
           |    CAST(7 * sx2 - sx * sx AS DOUBLE), 6) AS slope_7d
           |FROM framed WHERE nw = 7 ORDER BY d""".stripMargin))

  /** E230: **aggregate-modifier surface** — the three SQL-standard
    * aggregate decorations the CASE-WHEN house style (A4) does not
    * exercise as SYNTAX: the `FILTER (WHERE ...)` clause, `count_if`,
    * and DISTINCT-modified aggregates (`sum(DISTINCT ...)` on an
    * exact DECIMAL so dedup-then-sum is order-free). Both engines
    * parse all three (probed before writing) — the row pins that a
    * query written in this idiom migrates verbatim. Output edges are
    * canonical: count_if casts to BIGINT (DuckDB's is HUGEINT) and
    * the distinct sum casts to DOUBLE (decimal trailing zeros would
    * split the comparator's value hash — the r12 lesson). */
  val qSqlAggModifiers = Q("q_sql_agg_modifiers",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"mods_events_$tag"
      Tables.read(spark, sfDir, "events").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""SELECT event_type,
             |  CAST(count_if(value > 100.0) AS BIGINT) AS n_high,
             |  count(*) FILTER (WHERE value < 10.0) AS n_low,
             |  count(DISTINCT user_id) FILTER (WHERE value > 100.0)
             |    AS n_high_users,
             |  CAST(sum(DISTINCT CAST(value AS DECIMAL(18,6)))
             |    AS DOUBLE) AS sum_distinct_values
             |FROM $v
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""SELECT event_type,
           |  CAST(count_if(value > 100.0) AS BIGINT) AS n_high,
           |  count(*) FILTER (WHERE value < 10.0) AS n_low,
           |  count(DISTINCT user_id) FILTER (WHERE value > 100.0)
           |    AS n_high_users,
           |  CAST(sum(DISTINCT CAST(value AS DECIMAL(18,6)))
           |    AS DOUBLE) AS sum_distinct_values
           |FROM events
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** E231: **interval RANGE frame** — the time-based sliding window
    * that needs no resampling: per customer, each order's trailing
    * 30-day spend via `RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND
    * CURRENT ROW` over the order DATE (value-based peers, so same-day
    * orders aggregate together regardless of row order — the exact
    * semantic difference from E8's numeric RANGE and W3's ROWS
    * frames). Spend stays DECIMAL(18,2) inside the frame sum (exact);
    * only the output casts to DOUBLE (r12 hash canon). The
    * output tiebreak orders by (custkey, date, orderkey) — the frame
    * itself is insensitive to the tiebreak by construction, which is
    * the property that makes interval frames retry-safe. */
  val qWindowRangeInterval = Q("q_window_range_interval",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"ri_orders_$tag"
      Tables.read(spark, sfDir, "orders").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             |  o_orderkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |    OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(o_orderdate AS DATE)
             |      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
             |        AND CURRENT ROW) AS DOUBLE)
             |    AS spend_30d
             |FROM $v
             |ORDER BY o_custkey, d, o_orderkey""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           |  o_orderkey,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           |    OVER (PARTITION BY o_custkey
           |      ORDER BY CAST(o_orderdate AS DATE)
           |      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
           |        AND CURRENT ROW) AS DOUBLE) AS spend_30d
           |FROM orders
           |ORDER BY o_custkey, d, o_orderkey""".stripMargin))

  /** E232: **equi-depth histogram** — decile boundaries of order value
    * where every bin holds the same row count (±1), the histogram
    * query optimizers and skew diagnostics actually want (the
    * equi-WIDTH profiler E41 shows shape; equi-depth shows
    * QUANTILES): ntile over the total order (price, orderkey) bins
    * deterministically, then one rollup per bin for [lo, hi] and the
    * count. Price stays DECIMAL(18,2) through the sort and rollup;
    * only the OUTPUT columns cast to DOUBLE, because the comparator
    * hashes rendered values and a Spark decimal's trailing zeros
    * ('201630.50') never hash-equal the oracle's float ('201630.5')
    * — the r12 lesson, applied as the output-type canon. The
    * global ntile sort is the honest exact cost — the KLL sketch
    * (E61) is the recorded approximate path at 100 TB. */
  val qHistogramEquiDepth = Q("q_histogram_equi_depth",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .select($"o_totalprice".cast("decimal(18,2)").as("v"),
          $"o_orderkey")
        .withColumn("bin",
          ntile(10).over(Window.orderBy($"v", $"o_orderkey")))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"),
          min($"v").cast("double").as("lo"),
          max($"v").cast("double").as("hi"))
        .orderBy($"bin")
    },
    Some("""WITH binned AS (
           |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
           |    ntile(10) OVER (ORDER BY
           |      CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
           |      AS bin
           |  FROM orders
           |)
           |SELECT bin, count(*) AS n,
           |  CAST(min(v) AS DOUBLE) AS lo,
           |  CAST(max(v) AS DOUBLE) AS hi
           |FROM binned GROUP BY bin ORDER BY bin""".stripMargin))

  /** Row shape for the typed pipeline (E233) — top-level so the
    * product Encoder derives once. */
  final case class Ord(key: Long, cust: Long, status: String,
      price: Double)

  /** E233: **typed Dataset pipeline** — the Dataset[T] surface done
    * honestly: `as[Ord]` with a derived product encoder, a typed
    * lambda filter, and `groupByKey(...).mapGroups` whose per-group
    * fold accumulates BigDecimal CENTS (exact, so the fold is
    * iteration-order-free — the one discipline that makes mapGroups
    * deterministic; a Double accumulator here would hash-diverge
    * between runs). The scaladoc records the trade the DataFrame
    * house style avoids: typed lambdas are opaque to Catalyst (the
    * price filter does NOT push to the parquet scan, and the
    * deserialization boundary shows in the plan), which is exactly
    * why only this surface row uses them — type safety where wanted,
    * with the cost stated, matching the X6/X7 UDF/UDAF convention.
    * The cents fold stays exact; revenue leaves as DOUBLE (r12 hash
    * canon — decimal trailing zeros split the comparator). */
  val qTypedPipeline = Q("q_typed_pipeline",
    (spark, sfDir) => {
      import spark.implicits._
      val ds = Tables.read(spark, sfDir, "orders")
        .select($"o_orderkey".as("key"), $"o_custkey".as("cust"),
          $"o_orderstatus".as("status"),
          $"o_totalprice".as("price"))
        .as[Ord]
      ds.filter(o => o.price > 1000.0)
        .groupByKey(_.status)
        .mapGroups { (status, it) =>
          var n = 0L
          var cents = BigInt(0)
          var custs = Set.empty[Long]
          it.foreach { o =>
            n += 1
            cents += BigDecimal(o.price)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)
              .*(100).toBigInt
            custs += o.cust
          }
          (status, n, custs.size.toLong,
            (BigDecimal(cents) / 100).setScale(2).toString)
        }
        .toDF("status", "n_orders", "n_customers", "revenue")
        .select($"status", $"n_orders", $"n_customers",
          $"revenue".cast("decimal(18,2)").cast("double").as("revenue"))
        .orderBy($"status")
    },
    Some("""SELECT o_orderstatus AS status, count(*) AS n_orders,
           |  count(DISTINCT o_custkey) AS n_customers,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           |    AS DOUBLE) AS revenue
           |FROM orders WHERE o_totalprice > 1000.0
           |GROUP BY o_orderstatus ORDER BY status""".stripMargin))

  /** E234: **log-return volatility** — the dispersion of day-over-day
    * log returns of daily revenue, the risk/stability metric that
    * complements drawdown (E146) and EWMA (E139): rₜ = ln(yₜ/yₜ₋₁)
    * from exact DECIMAL daily sums (the ratio is one double division
    * of identical decimals, then one ln — the all-round log-parity
    * precedent), and the sample stddev comes from Σr and Σr² of those
    * identical doubles in one aggregate. Output also reports the
    * worst single-day log drop and its date (deterministic argmin via
    * the integer-exact min + equality filter). */
  val qVolatility = Q("q_volatility",
    (spark, sfDir) => {
      import spark.implicits._
      val seqW = Window.orderBy($"d")
      val daily = Tables.read(spark, sfDir, "orders")
        .groupBy(to_date($"o_orderdate").as("d"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))
        .withColumn("prev", lag($"rev", 1).over(seqW))
        .filter($"prev".isNotNull)
        .withColumn("r",
          log($"rev".cast("double") / $"prev".cast("double")))
      // returns quantize to integer NANO-units before the moment sums
      // (Σr and Σr² over ~1700 doubles would be accumulation-order
      // doubles — the one thing the house discipline forbids); the
      // quantization is the same round() on identical doubles, so it
      // is engine-exact, and the ppb loss is far below the 6dp output
      val tot = Window.partitionBy()
      daily
        .withColumn("rn",
          round($"r" * 1e9, 0).cast("decimal(38,0)"))
        .withColumn("rmin", min($"rn").over(tot))
        .withColumn("n", count(lit(1)).over(tot))
        .withColumn("sr", sum($"rn").over(tot))
        .withColumn("sr2", sum($"rn" * $"rn").over(tot))
        .filter($"rn" === $"rmin")
        .agg(max($"n").as("n_returns"),
          round(sqrt((max($"sr2").cast("double") -
            max($"sr").cast("double") * max($"sr").cast("double") /
              max($"n").cast("double")) /
            (max($"n") - 1).cast("double")) / 1e9, 6)
            .as("volatility"),
          round(max($"rmin").cast("double") / 1e9, 6)
            .as("worst_log_return"),
          min($"d").as("worst_day"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS d,
           |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           |  FROM orders GROUP BY 1
           |), rets AS (
           |  SELECT d,
           |    CAST(round(ln(CAST(rev AS DOUBLE) /
           |        CAST(lag(rev) OVER (ORDER BY d) AS DOUBLE)) * 1e9,
           |      0) AS HUGEINT) AS rn
           |  FROM daily
           |  QUALIFY lag(rev) OVER (ORDER BY d) IS NOT NULL
           |), framed AS (
           |  SELECT d, rn, min(rn) OVER () AS rmin,
           |    count(*) OVER () AS n, sum(rn) OVER () AS sr,
           |    sum(rn * rn) OVER () AS sr2
           |  FROM rets
           |)
           |SELECT CAST(max(n) AS BIGINT) AS n_returns,
           |  round(sqrt((CAST(max(sr2) AS DOUBLE) -
           |    CAST(max(sr) AS DOUBLE) * CAST(max(sr) AS DOUBLE) /
           |      CAST(max(n) AS DOUBLE)) /
           |    CAST(max(n) - 1 AS DOUBLE)) / 1e9, 6) AS volatility,
           |  round(CAST(max(rmin) AS DOUBLE) / 1e9, 6)
           |    AS worst_log_return,
           |  min(d) AS worst_day
           |FROM framed WHERE rn = rmin""".stripMargin))

  /** E235: **2D histogram (heatmap grid)** — joint distribution of
    * order value decile × ISO weekday, the grid every heatmap chart
    * and independence eyeball-check consumes (the 2D sibling of the
    * equi-depth histogram E232, and the binned front end the χ²
    * machinery E148 can then test). The value axis bins by ntile over
    * the total order (deterministic depth bins); the weekday axis is
    * the pinned ISO convention (E164). Counts plus each cell's share
    * of its decile row — integer-exact until the share division. */
  val qHistogram2d = Q("q_histogram_2d",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .select($"o_totalprice".cast("decimal(18,2)").as("v"),
          $"o_orderkey",
          (weekday(to_date($"o_orderdate")) + 1).cast("int").as("dow"))
        .withColumn("decile",
          ntile(10).over(Window.orderBy($"v", $"o_orderkey")))
        .groupBy($"decile", $"dow")
        .agg(count(lit(1)).as("n"))
        .withColumn("row_share",
          round($"n".cast("double") /
            sum($"n").over(Window.partitionBy($"decile"))
              .cast("double"), 6))
        .orderBy($"decile", $"dow")
    },
    Some("""WITH binned AS (
           |  SELECT isodow(CAST(o_orderdate AS DATE)) AS dow,
           |    ntile(10) OVER (ORDER BY
           |      CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
           |      AS decile
           |  FROM orders
           |), cells AS (
           |  SELECT decile, CAST(dow AS INTEGER) AS dow,
           |    count(*) AS n
           |  FROM binned GROUP BY 1, 2
           |)
           |SELECT decile, dow, n,
           |  round(CAST(n AS DOUBLE) /
           |    CAST(sum(n) OVER (PARTITION BY decile) AS DOUBLE), 6)
           |    AS row_share
           |FROM cells ORDER BY decile, dow""".stripMargin))

  /** E236: **new vs returning users** — per ISO week, how many active
    * users are seen for the FIRST time vs returning, the growth
    * decomposition every weekly report leads with (first-touch
    * attribution of activity, where retention cohorts E39 follow the
    * cohort forward instead). First-seen week is one min-window per
    * user; the weekly rollup is integer-exact with the returning
    * share divided at the edge. Week keys are the MONDAY DATE of the
    * week (pure date arithmetic — no week-number/week-year convention
    * to pin across engines, the sharper form of the E160/E164
    * lesson). */
  val qNewVsReturning = Q("q_new_vs_returning",
    (spark, sfDir) => {
      import spark.implicits._
      // week key = the MONDAY date of the week — engine-proof (no
      // week-number/week-year convention to pin: Spark's date_format
      // 'Y' and weekofyear follow different week definitions, while
      // the Monday anchor is pure arithmetic on both engines)
      val weekly = Tables.read(spark, sfDir, "events")
        .select($"user_id",
          date_sub(to_date($"ts"), weekday(to_date($"ts"))).as("wk"))
        .distinct()
      weekly
        .withColumn("first_wk",
          min($"wk").over(Window.partitionBy($"user_id")))
        .groupBy($"wk")
        .agg(count(lit(1)).as("n_active"),
          sum(($"wk" === $"first_wk").cast("long")).as("n_new"))
        .select($"wk", $"n_active", $"n_new",
          ($"n_active" - $"n_new").as("n_returning"),
          round(($"n_active" - $"n_new").cast("double") /
            $"n_active".cast("double"), 6).as("returning_share"))
        .orderBy($"wk")
    },
    Some("""WITH weekly AS (
           |  SELECT DISTINCT user_id,
           |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
           |      AS wk
           |  FROM events
           |), flagged AS (
           |  SELECT wk,
           |    min(wk) OVER (PARTITION BY user_id) AS first_wk
           |  FROM weekly
           |)
           |SELECT wk, count(*) AS n_active,
           |  CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_new,
           |  CAST(count(*) - sum(CASE WHEN wk = first_wk THEN 1
           |    ELSE 0 END) AS BIGINT) AS n_returning,
           |  round(CAST(count(*) - sum(CASE WHEN wk = first_wk
           |      THEN 1 ELSE 0 END) AS DOUBLE) /
           |    CAST(count(*) AS DOUBLE), 6) AS returning_share
           |FROM flagged GROUP BY wk ORDER BY wk""".stripMargin))

  /** E238: **week-over-week audience overlap** — the Jaccard of
    * consecutive weeks' active-user sets: the audience-churn signal
    * that complements the new-vs-returning split (E236 tells you how
    * many are returning; this tells you how much of LAST week's
    * audience they are). Weekly sets key on the Monday date (the E236
    * pin); the overlap is one self-join on user at a one-week shift,
    * set sizes come from the weekly rollup, and Jaccard uses the
    * inclusion–exclusion identity on exact counts with one edge
    * division. */
  val qAudienceOverlap = Q("q_audience_overlap",
    (spark, sfDir) => {
      import spark.implicits._
      val weekly = Tables.read(spark, sfDir, "events")
        .select($"user_id",
          date_sub(to_date($"ts"), weekday(to_date($"ts"))).as("wk"))
        .distinct()
      val sizes = weekly.groupBy($"wk").agg(count(lit(1)).as("n"))
      val overlap = weekly.as("a")
        .join(weekly.as("b"), $"a.user_id" === $"b.user_id" &&
          expr("date_add(a.wk, 7) = b.wk"))
        .groupBy($"b.wk".as("wk")).agg(count(lit(1)).as("n_both"))
      sizes.as("cur")
        .join(sizes.select($"wk".as("prev_wk"), $"n".as("n_prev")),
          expr("date_add(prev_wk, 7) = wk"))
        .join(overlap, Seq("wk"), "left")
        .select($"wk", $"n_prev", $"n".as("n_cur"),
          coalesce($"n_both", lit(0L)).as("n_both"),
          round(coalesce($"n_both", lit(0L)).cast("double") /
            ($"n_prev" + $"n" - coalesce($"n_both", lit(0L)))
              .cast("double"), 6).as("jaccard"))
        .orderBy($"wk")
    },
    Some("""WITH weekly AS (
           |  SELECT DISTINCT user_id,
           |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
           |      AS wk
           |  FROM events
           |), sizes AS (
           |  SELECT wk, count(*) AS n FROM weekly GROUP BY wk
           |), overlap AS (
           |  SELECT b.wk AS wk, count(*) AS n_both
           |  FROM weekly a JOIN weekly b
           |    ON a.user_id = b.user_id AND a.wk + to_days(7) = b.wk
           |  GROUP BY 1
           |)
           |SELECT c.wk, p.n AS n_prev, c.n AS n_cur,
           |  coalesce(o.n_both, 0) AS n_both,
           |  round(CAST(coalesce(o.n_both, 0) AS DOUBLE) /
           |    CAST(p.n + c.n - coalesce(o.n_both, 0) AS DOUBLE), 6)
           |    AS jaccard
           |FROM sizes c
           |JOIN sizes p ON p.wk + to_days(7) = c.wk
           |LEFT JOIN overlap o ON o.wk = c.wk
           |ORDER BY c.wk""".stripMargin))

  /** E239: **fact fan-out profile** — the count-of-counts of lineitems
    * per order: how many orders have 1, 2, … line items, plus each
    * size's share of ROWS (what actually drives join fan-out and
    * shuffle volume — the first thing to read before trusting a join
    * estimate, and the fact-table sibling of the near-dup degree
    * distribution E177). Two hash aggs; integer-exact with one share
    * division. */
  val qFanoutProfile = Q("q_fanout_profile",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      Tables.read(spark, sfDir, "lineitem")
        .groupBy($"l_orderkey").agg(count(lit(1)).as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n_orders"))
        .withColumn("n_rows", $"k" * $"n_orders")
        .withColumn("row_share",
          round($"n_rows".cast("double") /
            sum($"n_rows").over(tot).cast("double"), 6))
        .orderBy($"k")
    },
    Some("""WITH fanout AS (
           |  SELECT l_orderkey, count(*) AS k
           |  FROM lineitem GROUP BY 1
           |), hist AS (
           |  SELECT k, count(*) AS n_orders, k * count(*) AS n_rows
           |  FROM fanout GROUP BY k
           |)
           |SELECT k, n_orders, CAST(n_rows AS BIGINT) AS n_rows,
           |  round(CAST(n_rows AS DOUBLE) /
           |    CAST(sum(n_rows) OVER () AS DOUBLE), 6) AS row_share
           |FROM hist ORDER BY k""".stripMargin))

  /** E240: **revenue bridge** — month-over-month Δrevenue decomposed
    * into a volume effect (Δqty at last month's realized price) and a
    * price/mix effect (the remainder), the FP&A waterfall behind
    * every "why did revenue move" narrative. Monthly revenue and
    * quantity accumulate as exact DECIMALs; the realized-price base
    * rev₋₁/vol₋₁ and both effects are built from ONE division shape
    * shared by the engines, and the decomposition is exact by
    * construction: vol_effect + price_effect ≡ Δrev (the residual
    * definition — pinned by test). Month keys are date_trunc dates,
    * lag is one ordered window over the ≤85-month frame. */
  val qRevenueBridge = Q("q_revenue_bridge",
    (spark, sfDir) => {
      import spark.implicits._
      val seqW = Window.orderBy($"m")
      val monthly = Tables.read(spark, sfDir, "lineitem")
        .groupBy(date_trunc("month", $"l_shipdate").cast("date")
          .as("m"))
        .agg(sum($"l_extendedprice".cast("decimal(18,2)")).as("rev"),
          sum($"l_quantity".cast("decimal(18,2)")).as("vol"))
      monthly
        .withColumn("prev_rev", lag($"rev", 1).over(seqW))
        .withColumn("prev_vol", lag($"vol", 1).over(seqW))
        .filter($"prev_rev".isNotNull)
        .select($"m",
          ($"rev" - $"prev_rev").cast("double").as("d_rev"),
          round(($"vol" - $"prev_vol").cast("double") *
            ($"prev_rev".cast("double") / $"prev_vol".cast("double")),
            2).as("volume_effect"),
          round(($"rev" - $"prev_rev").cast("double") -
            round(($"vol" - $"prev_vol").cast("double") *
              ($"prev_rev".cast("double") /
                $"prev_vol".cast("double")), 2), 2)
            .as("price_mix_effect"))
        .orderBy($"m")
    },
    Some("""WITH monthly AS (
           |  SELECT CAST(date_trunc('month',
           |      CAST(l_shipdate AS TIMESTAMP)) AS DATE) AS m,
           |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev,
           |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS vol
           |  FROM lineitem GROUP BY 1
           |), lagged AS (
           |  SELECT m, rev, vol,
           |    lag(rev) OVER (ORDER BY m) AS prev_rev,
           |    lag(vol) OVER (ORDER BY m) AS prev_vol
           |  FROM monthly
           |)
           |SELECT m,
           |  CAST(rev - prev_rev AS DOUBLE) AS d_rev,
           |  round(CAST(vol - prev_vol AS DOUBLE) *
           |    (CAST(prev_rev AS DOUBLE) / CAST(prev_vol AS DOUBLE)),
           |    2) AS volume_effect,
           |  round(CAST(rev - prev_rev AS DOUBLE) -
           |    round(CAST(vol - prev_vol AS DOUBLE) *
           |      (CAST(prev_rev AS DOUBLE) /
           |        CAST(prev_vol AS DOUBLE)), 2), 2)
           |    AS price_mix_effect
           |FROM lagged WHERE prev_rev IS NOT NULL
           |ORDER BY m""".stripMargin))

  /** E241: **Pareto cutoff (80/20 readout)** — the smallest customer
    * prefix (by spend, descending) whose cumulative revenue reaches
    * 80%, reported as counts and shares: the single-row answer the
    * Lorenz curve (E197) plots. The 80% comparison happens on exact
    * decimals scaled by 5 (cum·5 ≥ total·4 — no 0.8 double anywhere),
    * so the cutoff row is engine-exact; the only doubles are the two
    * output shares. One join, one descending sort for the ranked
    * cumsum (KLL is the recorded approximate path at 100 TB). */
  val qParetoCutoff = Q("q_pareto_cutoff",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val ranked = Tables.read(spark, sfDir, "customer")
        .join(Tables.read(spark, sfDir, "orders"),
          $"c_custkey" === $"o_custkey")
        .groupBy($"c_custkey")
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("s"))
        .withColumn("rn", row_number().over(
          Window.orderBy($"s".desc, $"c_custkey")))
        .withColumn("cum", sum($"s").over(Window
          .orderBy($"s".desc, $"c_custkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum($"s").over(tot))
        .withColumn("n", count(lit(1)).over(tot))
      ranked.filter($"cum" * 5 >= $"total" * 4)
        .agg(min($"rn").as("n_customers_80"), max($"n").as("n_buyers"),
          round(min($"rn").cast("double") /
            max($"n").cast("double"), 6).as("customer_share"))
    },
    Some("""WITH spend AS (
           |  SELECT c_custkey,
           |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
           |  FROM customer JOIN orders ON c_custkey = o_custkey
           |  GROUP BY 1
           |), ranked AS (
           |  SELECT s,
           |    row_number() OVER (ORDER BY s DESC, c_custkey) AS rn,
           |    sum(s) OVER (ORDER BY s DESC, c_custkey
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cum,
           |    sum(s) OVER () AS total, count(*) OVER () AS n
           |  FROM spend
           |)
           |SELECT CAST(min(rn) AS BIGINT) AS n_customers_80,
           |  CAST(max(n) AS BIGINT) AS n_buyers,
           |  round(CAST(min(rn) AS DOUBLE) / CAST(max(n) AS DOUBLE),
           |    6) AS customer_share
           |FROM ranked WHERE cum * 5 >= total * 4""".stripMargin))

  /** E242: **field-level survivorship** — the MDM merge rule the
    * row-level canonical pick (E73) cannot express: within each
    * duplicate group, EACH FIELD independently takes its latest
    * non-null value (golden-record construction). The fixture has no
    * nulls, so staleness is planted deterministically (every third
    * doc's source and every fourth doc's lang are nulled) and the
    * survivor is the conditional struct-max
    * max(CASE non-null THEN (recency, id, value)) — ONE hash agg per
    * group, no per-field self-joins, lexicographic struct comparison
    * identical on both engines (probed: DuckDB named-struct max +
    * field extraction mirror Spark's struct max + getField). Groups
    * key on content hash like exact dedup (X1). */
  val qSurvivorship = Q("q_survivorship",
    (spark, sfDir) => {
      import spark.implicits._
      val staled = Tables.read(spark, sfDir, "documents")
        .select(sha2($"text", 256).as("grp"), $"doc_id",
          when($"doc_id" % 3 === 0, lit(null: String))
            .otherwise($"source").as("source"),
          when($"doc_id" % 4 === 0, lit(null: String))
            .otherwise($"lang").as("lang"))
      staled.groupBy($"grp")
        .agg(count(lit(1)).as("n_dups"), min($"doc_id").as("doc_id"),
          max(when($"source".isNotNull,
            struct($"doc_id".as("d"), $"source".as("v"))))
            .getField("v").as("source"),
          max(when($"lang".isNotNull,
            struct($"doc_id".as("d"), $"lang".as("v"))))
            .getField("v").as("lang"))
        .select($"doc_id", $"n_dups", $"source", $"lang")
        .orderBy($"doc_id")
    },
    Some("""WITH staled AS (
           |  SELECT sha256(text) AS grp, doc_id,
           |    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END
           |      AS source,
           |    CASE WHEN doc_id % 4 = 0 THEN NULL ELSE lang END
           |      AS lang
           |  FROM documents
           |)
           |SELECT min(doc_id) AS doc_id, count(*) AS n_dups,
           |  (max(CASE WHEN source IS NOT NULL
           |    THEN {'d': doc_id, 'v': source} END)).v AS source,
           |  (max(CASE WHEN lang IS NOT NULL
           |    THEN {'d': doc_id, 'v': lang} END)).v AS lang
           |FROM staled GROUP BY grp ORDER BY doc_id""".stripMargin))

  /** E243: **top movers (week-over-week rank drift)** — which parts
    * jumped or fell furthest in the weekly revenue leaderboard: rank
    * per Monday-keyed week (dense, deterministic tiebreak), self-join
    * at a one-week shift, order by |Δrank| — the leaderboard-drift
    * readout behind every "what changed this week" report. Revenue
    * ranks on exact decimals; output keeps the top 20 movers with a
    * (drift, part) total order. */
  val qTopMovers = Q("q_top_movers",
    (spark, sfDir) => {
      import spark.implicits._
      val weekly = Tables.read(spark, sfDir, "lineitem")
        .groupBy(date_sub(to_date($"l_shipdate"),
          weekday(to_date($"l_shipdate"))).as("wk"),
          $"l_partkey")
        .agg(sum($"l_extendedprice".cast("decimal(18,2)")).as("rev"))
        .withColumn("rk", row_number().over(Window.partitionBy($"wk")
          .orderBy($"rev".desc, $"l_partkey")))
      // The week shift rides a LAG window over the SAME ranked frame,
      // not a self-join (round 18 — this was the rung's slowest row at
      // 620 s): the join form either recomputes the whole
      // scan+agg+rank chain twice (the r17 recompute-vs-checkpoint
      // trade, both sides expensive) or pays a materialization; the
      // lag form computes the frame ONCE and adds one weekly-grain
      // window shuffle on l_partkey — fact-scan work halves. The
      // adjacency filter (prev week exactly 7 days back) reproduces
      // the join's semantics bit-for-bit: a part with a missing week
      // pairs with nothing, exactly as the equi-join dropped it; the
      // DuckDB oracle keeps the join spelling, so parity is checked
      // across the two FORMS, not just two engines.
      val wPart = Window.partitionBy($"l_partkey").orderBy($"wk")
      weekly
        .withColumn("prev_wk", lag($"wk", 1).over(wPart))
        .withColumn("prev_rk", lag($"rk", 1).over(wPart))
        .filter($"prev_wk".isNotNull &&
          expr("date_add(prev_wk, 7) = wk"))
        .select($"wk", $"l_partkey".as("part_key"),
          $"prev_rk".as("prev_rank"), $"rk".as("cur_rank"),
          ($"prev_rk" - $"rk").as("rank_gain"))
        .orderBy(abs($"rank_gain").desc, $"wk", $"part_key")
        .limit(20)
    },
    Some("""WITH weekly AS (
           |  SELECT CAST(date_trunc('week',
           |      CAST(l_shipdate AS TIMESTAMP)) AS DATE) AS wk,
           |    l_partkey,
           |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
           |  FROM lineitem GROUP BY 1, 2
           |), ranked AS (
           |  SELECT wk, l_partkey,
           |    row_number() OVER (PARTITION BY wk
           |      ORDER BY rev DESC, l_partkey) AS rk
           |  FROM weekly
           |)
           |SELECT c.wk, c.l_partkey AS part_key,
           |  p.rk AS prev_rank, c.rk AS cur_rank,
           |  p.rk - c.rk AS rank_gain
           |FROM ranked c JOIN ranked p
           |  ON c.l_partkey = p.l_partkey
           |  AND p.wk + to_days(7) = c.wk
           |ORDER BY abs(p.rk - c.rk) DESC, c.wk, c.l_partkey
           |LIMIT 20""".stripMargin))

  /** E245: **SQL pipe syntax** — Spark 4's `|>` operator chain
    * (FROM … |> WHERE … |> AGGREGATE … |> ORDER BY), the linear
    * query-authoring surface new in this engine generation: the
    * engine side runs the PIPE form, the oracle the classic
    * equivalent — pinning that the two spellings agree is exactly
    * what a team adopting the new syntax needs hash-checked once.
    * Same decimal discipline as everywhere (revenue sums exact;
    * DOUBLE only at the output edge, per the r12 hash canon). */
  val qSqlPipeSyntax = Q("q_sql_pipe_syntax",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"pipe_orders_$tag"
      Tables.read(spark, sfDir, "orders").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""FROM $v
             ||> WHERE o_totalprice > 1000.0
             ||> EXTEND CAST(o_totalprice AS DECIMAL(18,2)) AS p
             ||> AGGREGATE count(*) AS n_orders,
             |     CAST(sum(p) AS DOUBLE) AS revenue
             |     GROUP BY o_orderpriority
             ||> ORDER BY o_orderpriority""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           |    AS DOUBLE) AS revenue
           |FROM orders WHERE o_totalprice > 1000.0
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** E246: **case-insensitive collation** — Spark 4's COLLATE
    * UTF8_LCASE in GROUP BY: mixed-case values (planted: even
    * customers lowercase their segment) collapse into one group
    * without rewriting every predicate through lower(). The oracle IS
    * the lower() rewrite — pinning that the collation path and the
    * classic normalization agree. Display value is the BINARY min of
    * the group's original strings (deterministic on both engines;
    * the collated group's "first" value would be aggregation-order
    * luck). */
  val qSqlCollation = Q("q_sql_collation",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"coll_customer_$tag"
      Tables.read(spark, sfDir, "customer").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""SELECT min(seg_mixed) AS seg_display, count(*) AS n
             |FROM (
             |  SELECT CASE WHEN c_custkey % 2 = 0
             |    THEN lower(c_mktsegment) ELSE c_mktsegment END
             |    AS seg_mixed
             |  FROM $v
             |)
             |GROUP BY seg_mixed COLLATE UTF8_LCASE
             |ORDER BY seg_display""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""SELECT min(seg_mixed) AS seg_display, count(*) AS n
           |FROM (
           |  SELECT CASE WHEN c_custkey % 2 = 0
           |    THEN lower(c_mktsegment) ELSE c_mktsegment END
           |    AS seg_mixed
           |  FROM customer
           |)
           |GROUP BY lower(seg_mixed)
           |ORDER BY seg_display""".stripMargin))

  /** E247: **named function arguments** — Spark 4's
    * `name => value` call syntax, exercised on `mask()` (the built-in
    * sibling of the regex PII scrubbers E66): arguments passed OUT of
    * positional order, every class character pinned explicitly (a
    * defaulted argument would silently couple the oracle to Spark's
    * defaults). The oracle reproduces the masking with four character-
    * class regex passes — same transform, no named-args needed, which
    * is exactly the cross-engine equivalence worth hashing. */
  val qSqlNamedArgs = Q("q_sql_named_args",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"na_customer_$tag"
      Tables.read(spark, sfDir, "customer").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""SELECT c_custkey,
             |  mask(c_name, otherChar => '#', digitChar => '0',
             |       lowerChar => 'x', upperChar => 'X') AS masked
             |FROM $v
             |ORDER BY c_custkey LIMIT 50""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""SELECT c_custkey,
           |  regexp_replace(regexp_replace(regexp_replace(
           |    regexp_replace(c_name, '[A-Z]', 'X', 'g'),
           |    '[a-z]', 'x', 'g'), '[0-9]', '0', 'g'),
           |    '[^Xx0]', '#', 'g') AS masked
           |FROM customer ORDER BY c_custkey LIMIT 50""".stripMargin))

  /** E250: **higher moments (skewness / excess kurtosis)** — the two
    * shape statistics the stddev family (A3) stops short of, per
    * event type. NOT the built-ins: Spark's `skewness`/`kurtosis` are
    * population estimators while DuckDB's are sample-adjusted, so the
    * built-ins can never hash-agree; and both accumulate doubles in
    * iteration order. Instead the E213-volatility discipline, pushed
    * to order 4: quantize to exact centi-units, take deviations from
    * the FLOOR-mean c = ⌊S/n⌋ (pmod-based on the Spark side so both
    * engines floor identically even on negative sums; per-row
    * deviations are bounded by the VALUE RANGE, never by n — the
    * n-scaled-deviation trick of E195/ACF overflows DECIMAL(38,0) at
    * fourth powers once n passes ~10⁴), accumulate Σd²,Σd³,Σd⁴
    * exactly with the 3rd/4th powers in DECIMAL(38,0)/HUGEINT from
    * the second factor on (a Long d⁴ had only 1.36× headroom at
    * sf0.1 and wraps SILENTLY under non-ANSI multiply while the
    * oracle's BIGINT throws — the worst possible divergence pair),
    * then correct the
    * c-vs-μ offset dm = r/n in ONE identical double expression on
    * both engines (binomial shift of central moments), with
    * sqrt(m2)·m2 instead of pow(m2,1.5) — Math.pow and C pow may
    * differ in the last ulp; sqrt and multiply are IEEE-exact. */
  val qAggMoments = Q("q_agg_moments",
    (spark, sfDir) => {
      import spark.implicits._
      val w = Window.partitionBy($"event_type")
      // c is the FLOOR mean: r = pmod(s, n) is the non-negative
      // remainder on both engines (Spark's bare DIV truncates toward
      // zero, which splits from DuckDB's floor // on negative sums —
      // the fixture is positive today, a regeneration need not be)
      val quant = Tables.read(spark, sfDir, "events")
        .select($"event_type",
          ($"value".cast("decimal(18,2)") * 100).cast("long").as("vi"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum($"vi").over(w))
        .withColumn("r0", pmod($"s", $"n"))
        .withColumn("c", expr("(s - r0) DIV n"))
        .withColumn("d", $"vi" - $"c")
      // d² stays in Long (|d| ≤ ~5e4 at current fixtures → ≤ ~2.5e9);
      // the 3rd/4th powers ride DECIMAL from the SECOND factor on —
      // a Long d⁴ had only 1.36× headroom at sf0.1 and would WRAP
      // silently under non-ANSI multiply while the oracle's BIGINT
      // throws (measured; the review-caught divergence pair)
      val d38 = $"d".cast("decimal(38,0)")
      val sums = quant.groupBy($"event_type")
        .agg(max($"n").as("n"), max($"r0").as("r"),
          sum(($"d" * $"d").cast("decimal(38,0)")).as("e2"),
          sum(d38 * $"d" * $"d").as("e3"),
          sum(d38 * $"d" * $"d" * $"d").as("e4"))
      sums
        .withColumn("nd", $"n".cast("double"))
        .withColumn("dm", $"r".cast("double") / $"nd")
        .withColumn("m2",
          $"e2".cast("double") / $"nd" - $"dm" * $"dm")
        .withColumn("m3",
          $"e3".cast("double") / $"nd" -
            lit(3.0) * $"dm" * ($"e2".cast("double") / $"nd") +
            lit(2.0) * $"dm" * $"dm" * $"dm")
        .withColumn("m4",
          $"e4".cast("double") / $"nd" -
            lit(4.0) * $"dm" * ($"e3".cast("double") / $"nd") +
            lit(6.0) * $"dm" * $"dm" * ($"e2".cast("double") / $"nd") -
            lit(3.0) * $"dm" * $"dm" * $"dm" * $"dm")
        .select($"event_type", $"n",
          round($"m3" / (sqrt($"m2") * $"m2"), 6).as("skewness"),
          round($"m4" / ($"m2" * $"m2") - lit(3.0), 6)
            .as("kurtosis_excess"))
        .orderBy($"event_type")
    },
    Some("""WITH quant AS (
           |  SELECT event_type,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS vi
           |  FROM events
           |), framed AS (
           |  SELECT event_type, vi,
           |    count(*) OVER w AS n, sum(vi) OVER w AS s
           |  FROM quant
           |  WINDOW w AS (PARTITION BY event_type)
           |), dev AS (
           |  SELECT event_type, n, s, s // n AS c, vi - (s // n) AS d
           |  FROM framed
           |), sums AS (
           |  SELECT event_type,
           |    CAST(max(n) AS BIGINT) AS n,
           |    CAST(max(s - n * (s // n)) AS BIGINT) AS r,
           |    sum(d * d) AS e2,
           |    sum(CAST(d AS HUGEINT) * d * d) AS e3,
           |    sum(CAST(d AS HUGEINT) * d * d * d) AS e4
           |  FROM dev GROUP BY event_type
           |), moments AS (
           |  SELECT event_type, n,
           |    CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS dm,
           |    CAST(e2 AS DOUBLE) / CAST(n AS DOUBLE) AS f2,
           |    CAST(e3 AS DOUBLE) / CAST(n AS DOUBLE) AS f3,
           |    CAST(e4 AS DOUBLE) / CAST(n AS DOUBLE) AS f4
           |  FROM sums
           |), central AS (
           |  SELECT event_type, n,
           |    f2 - dm * dm AS m2,
           |    f3 - 3.0 * dm * f2 + 2.0 * dm * dm * dm AS m3,
           |    f4 - 4.0 * dm * f3 + 6.0 * dm * dm * f2
           |      - 3.0 * dm * dm * dm * dm AS m4
           |  FROM moments
           |)
           |SELECT event_type, n,
           |  round(m3 / (sqrt(m2) * m2), 6) AS skewness,
           |  round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
           |FROM central ORDER BY event_type""".stripMargin))

  /** E254: **blocked fuzzy record linkage (key blocking)** — near-miss
    * part names (edit distance 1–3) as candidate duplicate entities:
    * STANDARD key blocking, the complement of q_er_blocking's
    * sorted-neighborhood method (the two canonical ER candidate
    * generators differ in failure mode: a key block never compares
    * across blocks, a sorted neighborhood never compares beyond its
    * window — production systems run both and union candidates).
    * The design IS the scale story, in order: (1) collapse
    * records to the DISTINCT name vocabulary first (the entity set —
    * vocabulary-sized, not record-sized; 2k records → ~80 names here,
    * and a 100 TB catalog's name vocabulary is still tiny next to its
    * rows), carrying each name's record count; (2) BLOCK on the first
    * token, so comparison pairs are per-block quadratic in the
    * VOCABULARY, never all-pairs over records; (3) only then pay
    * levenshtein, keeping 0 < dist ≤ 3 (dist 0 would be exact dedup —
    * X1's job). Identical edit-distance definition on both engines;
    * output totally ordered by (dist, name_a, name_b). */
  val qLinkBlocking = Q("q_link_blocking",
    (spark, sfDir) => {
      import spark.implicits._
      val names = Tables.read(spark, sfDir, "part")
        .groupBy($"p_name").agg(count(lit(1)).as("n_records"))
        .withColumn("blk", split($"p_name", " ").getItem(0))
      names.as("a")
        .join(names.as("b"),
          $"a.blk" === $"b.blk" && $"a.p_name" < $"b.p_name")
        .withColumn("dist",
          levenshtein($"a.p_name", $"b.p_name"))
        .filter($"dist".between(1, 3))
        .select($"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
          $"dist", $"a.n_records".as("n_records_a"),
          $"b.n_records".as("n_records_b"))
        .orderBy($"dist", $"name_a", $"name_b")
    },
    Some("""WITH names AS (
           |  SELECT p_name, count(*) AS n_records,
           |    string_split(p_name, ' ')[1] AS blk
           |  FROM part GROUP BY p_name
           |)
           |SELECT a.p_name AS name_a, b.p_name AS name_b,
           |  levenshtein(a.p_name, b.p_name) AS dist,
           |  a.n_records AS n_records_a, b.n_records AS n_records_b
           |FROM names a JOIN names b
           |  ON a.blk = b.blk AND a.p_name < b.p_name
           |WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
           |ORDER BY dist, name_a, name_b""".stripMargin))

  /** E255: **exponential-smoothing forecast (SES fold)** — the
    * one-step-ahead simple-exponential-smoothing level per event
    * type over its daily counts: s₁ = y₁, sₜ = 0.3·yₜ + 0.7·sₜ₋₁ —
    * the baseline every forecasting bake-off starts from, and the
    * EXACT recursion that q_ewma (E139) documents as inexpressible
    * as a frame aggregate and therefore truncates to 20 terms: a
    * recurrence cannot be a window frame (each state depends on the
    * previous STATE, not the previous rows), but it IS a row-local
    * fold once the series is collected to its calendar-bounded
    * array — closing that row's recorded gap. The engine shape is
    * collect-sorted-then-fold: one hash agg to the (type, day) grain
    * — calendar-bounded, so the per-type array is bounded by days,
    * never by raw rows — then `aggregate()` (Catalyst's fold HOF)
    * over the sorted series entirely row-locally. The oracle is
    * DuckDB's `list_reduce`, whose first-element-as-init left-fold
    * the Spark side mirrors exactly (init = element 1, fold over the
    * slice from 2), with every lambda constant CAST to DOUBLE on
    * both sides so the fold is double arithmetic in identical order
    * — bit-equal, then one 6dp round. */
  val qForecastSes = Q("q_forecast_ses",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"y")))
          .as("series"))
        .select($"event_type",
          size($"series").as("n_days"),
          element_at($"series", -1).getField("y").as("last_y"),
          expr("""round(aggregate(
            |  transform(slice(series, 2, size(series) - 1),
            |    x -> CAST(x.y AS DOUBLE)),
            |  CAST(element_at(series, 1).y AS DOUBLE),
            |  (acc, y) -> CAST(0.3 AS DOUBLE) * y
            |    + CAST(0.7 AS DOUBLE) * acc), 6)""".stripMargin)
            .as("forecast_next"))
        .orderBy($"event_type")
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |    count(*) AS y
           |  FROM events GROUP BY 1, 2
           |), series AS (
           |  SELECT event_type,
           |    list(CAST(y AS DOUBLE) ORDER BY day) AS ys,
           |    count(*) AS n_days,
           |    CAST(max_by(y, day) AS BIGINT) AS last_y
           |  FROM daily GROUP BY event_type
           |)
           |SELECT event_type, n_days, last_y,
           |  round(list_reduce(ys,
           |    (acc, y) -> CAST(0.3 AS DOUBLE) * y
           |      + CAST(0.7 AS DOUBLE) * acc), 6) AS forecast_next
           |FROM series ORDER BY event_type""".stripMargin))

  /** E257: **LATERAL VIEW legacy spelling** — HiveQL's generator
    * syntax (`LATERAL VIEW explode(...) t AS col`, plus the OUTER
    * variant that keeps empty-array rows), the spelling a decade of
    * warehouse code is written in and the first thing a Hive
    * migration throws at the parser. Semantics are exactly the
    * modern explode/unnest (X8/E68) — the row pins that the LEGACY
    * SYNTAX parses and agrees with the oracle's unnest, the same
    * both-spellings-one-hash contract as the pipe-syntax row (E245).
    * Exploding each part's name tokens, then counting per token:
    * vocabulary-sized output, one shuffle. The OUTER half is
    * exercised on a planted empty array (no-token names would vanish
    * under plain LATERAL VIEW; OUTER emits them with NULL — counted
    * under the 'none' bucket). */
  val qSqlLateralView = Q("q_sql_lateral_view",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"lv_part_$tag"
      Tables.read(spark, sfDir, "part").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""SELECT coalesce(tok, 'none') AS tok,
             |  count(*) AS n_parts
             |FROM (
             |  SELECT p_partkey,
             |    CASE WHEN p_partkey % 100 = 0
             |      THEN array()
             |      ELSE split(p_name, ' ') END AS toks
             |  FROM $v
             |)
             |LATERAL VIEW OUTER explode(toks) t AS tok
             |GROUP BY coalesce(tok, 'none')
             |ORDER BY tok""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""WITH exploded AS (
           |  SELECT p_partkey,
           |    unnest(CASE WHEN p_partkey % 100 = 0
           |      THEN [NULL]
           |      ELSE string_split(p_name, ' ') END) AS tok
           |  FROM part
           |)
           |SELECT coalesce(tok, 'none') AS tok, count(*) AS n_parts
           |FROM exploded
           |GROUP BY coalesce(tok, 'none')
           |ORDER BY tok""".stripMargin))

  /** E258: **DISTRIBUTE BY / SORT BY (CLUSTER BY) surface** — the
    * Hive-inherited physical-layout clauses: DISTRIBUTE BY hashes
    * rows across partitions, SORT BY orders WITHIN each partition
    * (no global sort — the whole point at 100 TB: a terasort-free
    * way to get per-partition runs for downstream merge-joins or
    * run-length-friendly files), CLUSTER BY is both on one key. The
    * RESULT SET is clause-invariant (the comparator sorts rows, so
    * parity pins that the layout clauses change no data), and
    * PlanSuite locks what the optimizer actually does with them
    * here: the DISTRIBUTE half survives as the REPARTITION_BY_COL
    * hash exchange, while the SORT half is correctly ELIMINATED —
    * the consuming hash aggregate gains nothing from sorted input,
    * so EliminateSorts drops it (write the clustered projection to a
    * sink instead and the local sort survives, E101's layout).
    * Aggregated to per-type stats after the clustered projection so
    * the fixture output stays bounded. */
  val qSqlClusterBy = Q("q_sql_cluster_by",
    (spark, sfDir) => {
      val tag = windowViewRun.incrementAndGet()
      val v = s"cb_events_$tag"
      Tables.read(spark, sfDir, "events").createOrReplaceTempView(v)
      try {
        spark.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(min(value) AS DOUBLE) AS min_value,
             |  CAST(max(value) AS DOUBLE) AS max_value
             |FROM (
             |  SELECT event_type, value FROM $v
             |  CLUSTER BY event_type
             |)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      } finally {
        spark.catalog.dropTempView(v)
        ()
      }
    },
    Some("""SELECT event_type, count(*) AS n,
           |  CAST(min(value) AS DOUBLE) AS min_value,
           |  CAST(max(value) AS DOUBLE) AS max_value
           |FROM events
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** E259: **transition dwell times** — for consecutive events per
    * user, the mean seconds spent on each (from-type → to-type)
    * edge: the FRICTION readout on the transition grid whose
    * PROBABILITY readout is q_markov_transitions (E130-family) — the
    * probabilities say where users go, the dwell says how long each
    * hop takes (a slow view→purchase edge is a checkout problem; a
    * fast error→error edge is a retry storm), and neither is
    * derivable from the other. One lag window per user timeline
    * (ts, event_id total order), then one hash agg on the bounded
    * type×type grid; dwell sums are exact integer microseconds,
    * divided once at the edge. */
  val qTransitionDwell = Q("q_transition_dwell",
    (spark, sfDir) => {
      import spark.implicits._
      val timeline = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
      Tables.read(spark, sfDir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("prev_type",
          lag($"event_type", 1).over(timeline))
        .withColumn("dwell_us",
          unix_micros($"ts") -
            unix_micros(lag($"ts", 1).over(timeline)))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type".as("from_type"),
          $"event_type".as("to_type"))
        .agg(count(lit(1)).as("n_transitions"),
          round(sum($"dwell_us").cast("double") / lit(1000000.0) /
            count(lit(1)).cast("double"), 6).as("avg_dwell_sec"))
        .orderBy($"from_type", $"to_type")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           |    event_type
           |  FROM events
           |), lagged AS (
           |  SELECT event_type,
           |    lag(event_type) OVER w AS prev_type,
           |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS dwell_us
           |  FROM ev
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |)
           |SELECT prev_type AS from_type, event_type AS to_type,
           |  count(*) AS n_transitions,
           |  round(CAST(sum(dwell_us) AS DOUBLE) / 1000000.0 /
           |    CAST(count(*) AS DOUBLE), 6) AS avg_dwell_sec
           |FROM lagged WHERE prev_type IS NOT NULL
           |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin))

  /** E260: **argument-extreme aggregates (min_by / max_by)** — "the
    * value of X at the row where Y is extreme", the lookup every
    * "latest status per key" query wants without a row_number
    * subquery: per user, the event type and value at their FIRST and
    * LAST event. Determinism is the ordering key's job: event_id is
    * unique per user timeline tie-broken nowhere — ties simply cannot
    * happen, which is the ONLY condition under which min_by/max_by
    * are reproducible (the scaladoc's warning: an ordering key with
    * duplicates makes both engines pick aggregation-order luck).
    * DuckDB spells them arg_min/arg_max. One hash agg, no window. */
  val qAggArgExtremes = Q("q_agg_arg_extremes",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          min_by($"event_type", $"event_id").as("first_type"),
          max_by($"event_type", $"event_id").as("last_type"),
          max_by($"value", $"event_id").cast("double")
            .as("last_value"))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, count(*) AS n_events,
           |  arg_min(event_type, event_id) AS first_type,
           |  arg_max(event_type, event_id) AS last_type,
           |  CAST(arg_max(value, event_id) AS DOUBLE) AS last_value
           |FROM events GROUP BY user_id ORDER BY user_id"""
      .stripMargin))

  /** E261: **string formatting scalars** — `format_string` (Java
    * printf on the Spark side, C printf as DuckDB's `printf`: %s,
    * zero-padded %06d and hex %x agree across both runtimes — the
    * float specifiers deliberately do NOT appear, because Java
    * HALF_UPs %.2f where C half-evens it), plus lpad / rpad /
    * translate / repeat — the ID-formatting row every export job
    * hits. Pure row-local projection; the LIMIT keeps the fixture
    * output bounded with the (custkey) total order. */
  val qScalarFormat = Q("q_scalar_format",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "customer")
        .select($"c_custkey", $"c_mktsegment")
        .select($"c_custkey",
          format_string("C-%06d:%x", $"c_custkey", $"c_custkey")
            .as("formatted_id"),
          lpad($"c_mktsegment", 12, ".").as("padded"),
          translate($"c_mktsegment", "AEIOU", "aeiou")
            .as("translated"),
          concat(repeat(lit("*"), 3), $"c_mktsegment").as("starred"))
        .orderBy($"c_custkey")
        .limit(50)
    },
    Some("""SELECT c_custkey,
           |  printf('C-%06d:%x', c_custkey, c_custkey)
           |    AS formatted_id,
           |  lpad(c_mktsegment, 12, '.') AS padded,
           |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
           |  repeat('*', 3) || c_mktsegment AS starred
           |FROM customer ORDER BY c_custkey LIMIT 50""".stripMargin))

  /** E262: **interval-overlap self-join** — pairs of the same
    * customer's orders whose [order, last-ship] activity windows
    * overlap: the concurrency detector (simultaneous open orders,
    * double-booked resources, overlapping sessions). The join is
    * equi on the customer key FIRST — which bounds each comparison
    * to one customer's own orders, the property that keeps an
    * interval self-join off the quadratic cliff (the keyless variant
    * is E3's binned problem; keyed overlap is just an equi join with
    * a residual `a.start ≤ b.end AND b.start ≤ a.end`). Canonical
    * a<b ordering counts each pair once; output is the per-customer
    * overlap count plus the maximum concurrent-overlap days, exact
    * integer date arithmetic throughout. */
  val qJoinIntervalOverlap = Q("q_join_interval_overlap",
    (spark, sfDir) => {
      import spark.implicits._
      val spans = Tables.read(spark, sfDir, "orders")
        .join(Tables.read(spark, sfDir, "lineitem")
            .groupBy($"l_orderkey")
            .agg(max(to_date($"l_shipdate")).as("fin")),
          $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("cust"), $"o_orderkey".as("ok"),
          to_date($"o_orderdate").as("st"), $"fin")
        .filter($"fin" >= $"st")
      spans.as("a")
        .join(spans.as("b"),
          $"a.cust" === $"b.cust" && $"a.ok" < $"b.ok" &&
            $"a.st" <= $"b.fin" && $"b.st" <= $"a.fin")
        .select($"a.cust".as("cust"),
          (datediff(least($"a.fin", $"b.fin"),
            greatest($"a.st", $"b.st")) + 1).as("overlap_days"))
        .groupBy($"cust")
        .agg(count(lit(1)).as("n_overlapping_pairs"),
          max($"overlap_days").cast("long").as("max_overlap_days"))
        .orderBy($"cust")
    },
    Some("""WITH spans AS (
           |  SELECT o.o_custkey AS cust, o.o_orderkey AS ok,
           |    CAST(o.o_orderdate AS DATE) AS st, f.fin
           |  FROM orders o
           |  JOIN (SELECT l_orderkey,
           |          max(CAST(l_shipdate AS DATE)) AS fin
           |        FROM lineitem GROUP BY l_orderkey) f
           |    ON o.o_orderkey = f.l_orderkey
           |  WHERE f.fin >= CAST(o.o_orderdate AS DATE)
           |)
           |SELECT a.cust AS cust,
           |  count(*) AS n_overlapping_pairs,
           |  CAST(max(CAST(least(a.fin, b.fin)
           |    - greatest(a.st, b.st) AS BIGINT) + 1) AS BIGINT)
           |    AS max_overlap_days
           |FROM spans a JOIN spans b
           |  ON a.cust = b.cust AND a.ok < b.ok
           |    AND a.st <= b.fin AND b.st <= a.fin
           |GROUP BY a.cust ORDER BY cust""".stripMargin))

  /** E263: **dynamic pivot** — the R1/E224 pivot WITHOUT an explicit
    * value list: `pivot(col)` first runs a distinct-values pre-pass
    * (its own collect-to-driver job, capped by
    * spark.sql.pivotMaxValues) and only then plans the aggregation —
    * the two-pass shape this row exists to pin, because the
    * convenience costs an extra scan that the explicit-list form
    * (E224's recorded 100 TB advice) avoids. Output equals the
    * explicit form exactly: pivoted status columns sort
    * alphabetically, so the schema is deterministic for the
    * fixture's F/O/P alphabet. */
  val qPivotDynamic = Q("q_pivot_dynamic",
    (spark, sfDir) => {
      import spark.implicits._
      val pivoted = Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus")
        .agg(count(lit(1)))
      // a status absent for one priority pivots to NULL where the
      // oracle's conditional count gives 0 — canonicalize
      pivoted.columns.filter(_ != "o_orderpriority")
        .foldLeft(pivoted) { (df, c) =>
          df.withColumn(c, coalesce(col(c), lit(0L)))
        }
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
           |FROM orders GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** E268: **rolling-origin forecast backtest** —
    * the evaluation loop that turns E255's SES level into a
    * credible forecaster: for every day t ≥ 2, forecast t from the
    * prefix [1, t−1] (the same first-element-init fold), compare to
    * the actual, and report per-type MAE — the "how wrong would we
    * have been every day" number a forecast sign-off needs, distinct
    * from q_markov_backtest's train/test split (one cut there; a
    * rolling origin here, the standard time-series CV). The per-day
    * refits are O(n²) in days but ROW-LOCAL on a calendar-bounded
    * array (≤31 elements — ~500 fused float ops per type), which is
    * the honest trade against carrying 30 incremental state columns.
    * Parity discipline: each forecast double is quantized ONCE to
    * integer micro-units, absolute errors are exact BIGINT, their sum
    * is order-free, and the MAE divides once at the edge. */
  val qForecastBacktest = Q("q_forecast_backtest",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"y")))
          .as("series"))
        .select($"event_type",
          expr("transform(series, s -> CAST(s.y AS DOUBLE))")
            .as("ysd"),
          expr("transform(series, s -> s.y)").as("ysl"))
        // a single-day series has nothing to evaluate — and unguarded
        // it CRASHES: sequence(2, 1) descends and slice() gets a
        // negative length (review-caught); the oracle's empty range
        // would quietly emit NULL instead, a divergence either way
        .filter(size($"ysd") >= 2)
        .select($"event_type",
          (size($"ysd") - 1).cast("long").as("n_evals"),
          expr("""aggregate(
            |  transform(sequence(2, size(ysd)), i ->
            |    abs(CAST(round(aggregate(slice(ysd, 2, i - 2),
            |        CAST(element_at(ysd, 1) AS DOUBLE),
            |        (a, y) -> CAST(0.3 AS DOUBLE) * y
            |          + CAST(0.7 AS DOUBLE) * a)
            |      * 1000000.0) AS BIGINT)
            |      - element_at(ysl, i) * 1000000L)),
            |  0L, (acc, e) -> acc + e)""".stripMargin)
            .as("abs_err_micro"))
        .select($"event_type", $"n_evals",
          round($"abs_err_micro".cast("double") / lit(1000000.0) /
            $"n_evals".cast("double"), 6).as("mae"))
        .orderBy($"event_type")
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |    count(*) AS y
           |  FROM events GROUP BY 1, 2
           |), series AS (
           |  SELECT event_type,
           |    list(CAST(y AS DOUBLE) ORDER BY day) AS ysd,
           |    list(y ORDER BY day) AS ysl
           |  FROM daily GROUP BY event_type
           |), evaled AS (
           |  SELECT event_type,
           |    CAST(len(ysd) - 1 AS BIGINT) AS n_evals,
           |    CAST(list_sum(list_transform(range(2, len(ysd) + 1),
           |      i -> abs(CAST(round(list_reduce(
           |          list_slice(ysd, 1, i - 1),
           |          (a, y) -> CAST(0.3 AS DOUBLE) * y
           |            + CAST(0.7 AS DOUBLE) * a)
           |        * 1000000.0) AS BIGINT)
           |        - ysl[i] * CAST(1000000 AS BIGINT))))
           |      AS BIGINT) AS abs_err_micro
           |  FROM series
           |  WHERE len(ysd) >= 2
           |)
           |SELECT event_type, n_evals,
           |  round(CAST(abs_err_micro AS DOUBLE) / 1000000.0 /
           |    CAST(n_evals AS DOUBLE), 6) AS mae
           |FROM evaled ORDER BY event_type""".stripMargin))

  /** E271: **language-label confusion audit** — the QA step on top of
    * the detector: cross-tabulate each document's DECLARED `lang`
    * against the X5-family heuristic's GUESS (the same
    * stopword-ratio rule as q_lang_id, inlined so this row stands
    * alone), with per-cell counts and the per-declared-label
    * agreement rate. Mislabeled-language shards are a top-3 cause of
    * silent quality loss in multilingual corpora, and the confusion
    * grid — not the per-doc verdicts — is what a data auditor
    * actually reads. Grid is |langs|×2, one fact pass, one hash agg;
    * the agreement rate is the single double edge. */
  val qLangConfusion = Q("q_lang_confusion",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy($"lang")
      Tables.read(spark, sfDir, "documents")
        .select($"lang", split(trim($"text"), " ").as("ws"))
        .select($"lang",
          when(size(filter($"ws", w => w.isin("a", "the"))) /
            size($"ws").cast("double") >= 0.08, "en")
            .otherwise("other").as("guess"))
        .groupBy($"lang", $"guess")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("lang_total", sum($"n_docs").over(tot))
        .select($"lang", $"guess", $"n_docs",
          round($"n_docs".cast("double") /
            $"lang_total".cast("double"), 6).as("share_of_declared"))
        .orderBy($"lang", $"guess")
    },
    Some("""WITH guessed AS (
           |  SELECT lang,
           |    CASE WHEN len(list_filter(
           |        string_split(trim(text), ' '),
           |        w -> w IN ('a', 'the'))) * 1.0 /
           |      len(string_split(trim(text), ' ')) >= 0.08
           |      THEN 'en' ELSE 'other' END AS guess
           |  FROM documents
           |), grid AS (
           |  SELECT lang, guess, count(*) AS n_docs
           |  FROM guessed GROUP BY lang, guess
           |)
           |SELECT lang, guess, n_docs,
           |  round(CAST(n_docs AS DOUBLE) /
           |    CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE),
           |    6) AS share_of_declared
           |FROM grid ORDER BY lang, guess""".stripMargin))

  /** E275: **largest-remainder apportionment** (Hamilton's method) —
    * allocate a FIXED total of 1000 units across nations proportional
    * to customer count, with the constraint that every allocation is
    * an integer and the total is hit EXACTLY. Floor the quotas, then
    * award the shortfall one unit each to the largest remainders
    * (ties broken by nation key, so the answer is deterministic).
    * Different operator from E-prorate (q_prorate spreads each ROW's
    * value over its own 7 days by positional remainder — row-local);
    * apportionment is a GLOBAL competition: the +1s depend on every
    * group's remainder rank, which is exactly what makes it the
    * seat-assignment / budget-split / shard-allocation primitive.
    * All-integer throughout (quota numerators, floors, remainders);
    * the only double is the reporting column `exact_quota`, rounded
    * 6dp. Scale: group cardinality (25 nations) bounds the window —
    * at 100 TB the count aggregation is the only fact-scale pass. */
  val qAllocApportion = Q("q_alloc_apportion",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val rankW = Window.orderBy($"rem".desc, $"c_nationkey".asc)
      val cc = Tables.read(spark, sfDir, "customer")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("c"))
        .withColumn("total", sum($"c").over(tot))
        .withColumn("num", $"c" * lit(1000L))
        .withColumn("fl", expr("num DIV total"))
        .withColumn("rem", pmod($"num", $"total"))
        .withColumn("xr", row_number().over(rankW))
        .withColumn("shortfall", lit(1000L) - sum($"fl").over(tot))
      cc.join(Tables.read(spark, sfDir, "nation"),
          $"c_nationkey" === $"n_nationkey")
        .select($"n_name".as("nation"), $"c".as("customers"),
          ($"fl" + when($"xr" <= $"shortfall", 1L).otherwise(0L))
            .as("seats"),
          round($"num".cast("double") / $"total".cast("double"), 6)
            .as("exact_quota"))
        .orderBy($"nation")
    },
    Some("""WITH cc AS (
           |  SELECT c_nationkey, count(*) AS c
           |  FROM customer GROUP BY 1
           |), q AS (
           |  SELECT c_nationkey, c,
           |    CAST(sum(c) OVER () AS BIGINT) AS total,
           |    c * 1000 AS num
           |  FROM cc
           |), f AS (
           |  SELECT c_nationkey, c, total, num,
           |    num // total AS fl, num % total AS rem
           |  FROM q
           |), r AS (
           |  SELECT *,
           |    row_number() OVER (ORDER BY rem DESC, c_nationkey) AS xr,
           |    1000 - CAST(sum(fl) OVER () AS BIGINT) AS shortfall
           |  FROM f
           |)
           |SELECT n_name AS nation, CAST(c AS BIGINT) AS customers,
           |  CAST(fl + CASE WHEN xr <= shortfall THEN 1 ELSE 0 END
           |    AS BIGINT) AS seats,
           |  round(CAST(num AS DOUBLE) / CAST(total AS DOUBLE), 6)
           |    AS exact_quota
           |FROM r JOIN nation ON c_nationkey = n_nationkey
           |ORDER BY nation""".stripMargin))

  /** E276: **clamped running balance** — the inventory/credit-ledger
    * fold no window frame can express: balance after each order is
    * `max(0, prev + delta)` (fulfilled orders debit, others credit),
    * and the clamp makes the recurrence NON-LINEAR — unlike a running
    * sum, each step depends on the clamped value of the one before, so
    * the only faithful formulations are an ordered fold or a stateful
    * scan. Here: per-key `sort_array(collect_list(struct(...)))` +
    * `aggregate()` with the clamp in the merge lambda — row-local,
    * zero extra shuffles beyond the one groupBy — mirrored in DuckDB
    * by `list_reduce(list_prepend(0, list(delta ORDER BY ...)))`
    * (first-element-as-init left fold, so the prepended 0 makes the
    * very first step clamp too, matching aggregate()'s explicit
    * zero). Integer cents end to end; per-key arrays are bounded by
    * orders-per-customer. At unbounded per-key history the documented
    * scale path is the same fold as a streaming
    * `transformWithState` (T6) over event-time order. */
  val qBalanceClamped = Q("q_balance_clamped",
    (spark, sfDir) => {
      import spark.implicits._
      val folded = Tables.read(spark, sfDir, "orders")
        .select($"o_custkey", to_date($"o_orderdate").as("d"),
          $"o_orderkey",
          (when($"o_orderstatus" === "F", -1L).otherwise(1L) *
            ($"o_totalprice".cast("decimal(18,2)") * 100)
              .cast("long")).as("delta"))
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sort_array(collect_list(struct($"d", $"o_orderkey", $"delta")))
            .as("tl"))
        .withColumn("final_cents",
          expr("""aggregate(transform(tl, x -> x.delta),
                 |  CAST(0 AS BIGINT),
                 |  (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))"""
            .stripMargin))
      folded
        .join(Tables.read(spark, sfDir, "customer"),
          $"o_custkey" === $"c_custkey")
        .join(Tables.read(spark, sfDir, "nation"),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name".as("nation"))
        .agg(count(lit(1)).as("n_customers"),
          sum($"n_orders").cast("long").as("n_orders"),
          sum($"final_cents").cast("long").as("clamped_cents"))
        .orderBy($"nation")
    },
    Some("""WITH d AS (
           |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
           |    o_orderkey,
           |    (CASE WHEN o_orderstatus = 'F' THEN -1 ELSE 1 END) *
           |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |        AS BIGINT) AS delta
           |  FROM orders
           |), folded AS (
           |  SELECT o_custkey, count(*) AS n_orders,
           |    list_reduce(
           |      list_prepend(CAST(0 AS BIGINT),
           |        list(delta ORDER BY d, o_orderkey)),
           |      (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))
           |      AS final_cents
           |  FROM d GROUP BY 1
           |)
           |SELECT n_name AS nation,
           |  count(*) AS n_customers,
           |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
           |  CAST(sum(final_cents) AS BIGINT) AS clamped_cents
           |FROM folded
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY 1 ORDER BY nation""".stripMargin))

  /** E278: **Mann–Whitney U (Wilcoxon rank-sum)** — the nonparametric
    * two-sample location test next to KS (E194): does the purchase
    * `value` distribution stochastically dominate click's? Exactness
    * hinges on tied ranks: with per-distinct-value counts a1, a2 and
    * cnt = a1+a2, the DOUBLED average rank of the tie group is the
    * integer 2·cumBefore + cnt + 1, so the doubled rank sum R1d =
    * Σ a1·(2·cumBefore+cnt+1) and the tie-correction Σ(cnt³−cnt) stay
    * in DECIMAL(38,0)/HUGEINT on both engines; U1 = (R1d − n1(n1+1))/2
    * is exact in double (one bit of .5), and the tie-corrected normal
    * z does its sqrt+division on the final row. Like the KS scan this
    * is one hash agg on distinct values + one global ordered window —
    * the honest single sort an exact rank test needs (KLL E61 is the
    * recorded approximate path at 100 TB). */
  val qMannWhitney = Q("q_mannwhitney",
    (spark, sfDir) => {
      import spark.implicits._
      val perV = Tables.read(spark, sfDir, "events")
        .filter($"event_type".isin("purchase", "click"))
        .select($"value".as("v"),
          when($"event_type" === "purchase", 1L).otherwise(0L).as("g1"))
        .groupBy($"v")
        .agg(sum($"g1").as("a1"), sum(lit(1L) - $"g1").as("a2"))
        .withColumn("cnt", ($"a1" + $"a2").cast("decimal(38,0)"))
      val before = Window.orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      perV
        .withColumn("cum_before",
          coalesce(sum($"cnt").over(before), lit(0))
            .cast("decimal(38,0)"))
        .agg(sum($"a1").cast("decimal(38,0)").as("n1"),
          sum($"a2").cast("decimal(38,0)").as("n2"),
          sum($"a1" * (lit(2) * $"cum_before" + $"cnt" + lit(1)))
            .as("r1d"),
          sum($"cnt" * $"cnt" * $"cnt" - $"cnt").as("tie3"))
        .select($"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
          (($"r1d" - $"n1" * ($"n1" + lit(1))).cast("double") / 2.0)
            .as("u1"),
          round(
            ((($"r1d" - $"n1" * ($"n1" + lit(1))).cast("double") / 2.0) -
              ($"n1" * $"n2").cast("double") / 2.0) /
              sqrt(($"n1" * $"n2").cast("double") / 12.0 *
                ((($"n1" + $"n2" + lit(1))).cast("double") -
                  $"tie3".cast("double") /
                    (($"n1" + $"n2").cast("double") *
                      ($"n1" + $"n2" - lit(1)).cast("double")))), 6)
            .as("z"))
    },
    Some("""WITH ev AS (
           |  SELECT value AS v,
           |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
           |  FROM events WHERE event_type IN ('purchase', 'click')
           |), perv AS (
           |  SELECT v, CAST(sum(g1) AS HUGEINT) AS a1,
           |    CAST(sum(1 - g1) AS HUGEINT) AS a2,
           |    CAST(count(*) AS HUGEINT) AS cnt
           |  FROM ev GROUP BY v
           |), ranked AS (
           |  SELECT a1, a2, cnt,
           |    coalesce(sum(cnt) OVER (ORDER BY v
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |      0) AS cum_before
           |  FROM perv
           |), s AS (
           |  SELECT sum(a1) AS n1, sum(a2) AS n2,
           |    sum(a1 * (2 * cum_before + cnt + 1)) AS r1d,
           |    sum(cnt * cnt * cnt - cnt) AS tie3
           |  FROM ranked
           |)
           |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           |  CAST(r1d - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
           |  round((CAST(r1d - n1 * (n1 + 1) AS DOUBLE) / 2.0 -
           |      CAST(n1 * n2 AS DOUBLE) / 2.0) /
           |    sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0 *
           |      (CAST(n1 + n2 + 1 AS DOUBLE) -
           |        CAST(tie3 AS DOUBLE) /
           |          (CAST(n1 + n2 AS DOUBLE) *
           |            CAST(n1 + n2 - 1 AS DOUBLE)))), 6) AS z
           |FROM s""".stripMargin))

  /** E279: **one-way ANOVA F** — does mean order value differ across
    * the five `o_orderpriority` classes? The variance decomposition
    * SStot = SSB + SSW over integral CENTS: per-group n_g, S_g = Σc
    * and SS_g = Σc² all accumulate in DECIMAL(38,0)/HUGEINT (c ≤ ~6e7
    * cents, c² ≤ 4e15, ×1e6 rows ≤ 4e21 — comfortable), so the only
    * float work is the ≤5-term Σ S_g²/n_g and the two ratio outputs:
    * F = (SSB/(k−1))/(SSW/(N−k)) and effect size η² = SSB/SStot, both
    * O(1) magnitudes where the 6dp rounding is meaningful. One hash
    * agg at the priority grain; the final frame is ≤5 rows. */
  val qAnovaF = Q("q_anova_f",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .select(($"o_totalprice".cast("decimal(18,2)") * 100)
          .cast("decimal(38,0)").as("c"), $"o_orderpriority")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).cast("decimal(38,0)").as("ng"),
          sum($"c").as("sg"), sum($"c" * $"c").as("ssg"))
        .agg(count(lit(1)).as("n_groups"),
          sum($"ng").cast("double").as("n"),
          sum($"sg".cast("double") * $"sg".cast("double") /
            $"ng".cast("double")).as("sb"),
          sum($"ssg").cast("double").as("sstot_raw"),
          sum($"sg").cast("double").as("s"))
        .select($"n_groups", $"n".cast("long").as("n"),
          round((($"sb" - $"s" * $"s" / $"n") / ($"n_groups" - 1)) /
            ((($"sstot_raw" - $"s" * $"s" / $"n") -
              ($"sb" - $"s" * $"s" / $"n")) / ($"n" - $"n_groups")), 6)
            .as("f_stat"),
          round(($"sb" - $"s" * $"s" / $"n") /
            ($"sstot_raw" - $"s" * $"s" / $"n"), 6).as("eta_sq"))
    },
    Some("""WITH g AS (
           |  SELECT o_orderpriority,
           |    CAST(count(*) AS HUGEINT) AS ng,
           |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS HUGEINT)) AS sg,
           |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |        AS HUGEINT) *
           |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |        AS HUGEINT)) AS ssg
           |  FROM orders GROUP BY 1
           |), s AS (
           |  SELECT count(*) AS n_groups,
           |    CAST(sum(ng) AS DOUBLE) AS n,
           |    sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
           |      CAST(ng AS DOUBLE)) AS sb,
           |    CAST(sum(ssg) AS DOUBLE) AS sstot_raw,
           |    CAST(sum(sg) AS DOUBLE) AS s
           |  FROM g
           |)
           |SELECT n_groups, CAST(n AS BIGINT) AS n,
           |  round(((sb - s * s / n) / (n_groups - 1)) /
           |    (((sstot_raw - s * s / n) - (sb - s * s / n)) /
           |      (n - n_groups)), 6) AS f_stat,
           |  round((sb - s * s / n) / (sstot_raw - s * s / n), 6)
           |    AS eta_sq
           |FROM s""".stripMargin))

  /** E280: **cross-correlation function** — lead/lag coupling between
    * the daily purchase-count and click-count series at calendar lags
    * −7..+7, the two-series complement to the ACF (E195): a peak at
    * negative lag says clicks LEAD purchases. Same integer-exact
    * n-scaled-deviation trick: devx = n·x − Sx and devy = n·y − Sy are
    * integral, num_k = Σ devx_t·devy_{t+k} accumulates in
    * DECIMAL(38,0)/HUGEINT, and the full-series denominator
    * sqrt(Σdevx²·Σdevy²) normalizes every lag (so r_0 is exactly the
    * Pearson r of the two series). Lag pairing is by CALENDAR day, and
    * the ±7 fan-out explodes on the ≤n-row daily aggregate joined back
    * on the shifted date — no cross join on raw rows. */
  val qCcf = Q("q_ccf",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val daily = Tables.read(spark, sfDir, "events")
        .filter($"event_type".isin("purchase", "click"))
        .groupBy(to_date($"ts").as("d"))
        .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("x"),
          sum(when($"event_type" === "click", 1L).otherwise(0L))
            .as("y"))
        .withColumn("n", count(lit(1)).over(tot))
        .withColumn("devx",
          ($"n" * $"x" - sum($"x").over(tot)).cast("decimal(38,0)"))
        .withColumn("devy",
          ($"n" * $"y" - sum($"y").over(tot)).cast("decimal(38,0)"))
        .localCheckpoint()
      val den = daily.agg(
        sqrt(sum($"devx" * $"devx").cast("double") *
          sum($"devy" * $"devy").cast("double")).as("den"))
      daily.select($"d", $"devx",
          explode(sequence(lit(-7), lit(7))).as("lag_days"))
        .join(daily.select($"d".as("d2"), $"devy".as("devy2")),
          expr("date_add(d, lag_days) = d2"))
        .groupBy($"lag_days")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"devx" * $"devy2").as("num"))
        .crossJoin(broadcast(den))
        .select($"lag_days", $"n_pairs",
          round($"num".cast("double") / $"den", 6).as("r"))
        .orderBy($"lag_days")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS x,
           |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           |      AS y
           |  FROM events WHERE event_type IN ('purchase', 'click')
           |  GROUP BY 1
           |), scaled AS (
           |  SELECT d,
           |    CAST(count(*) OVER () * x - sum(x) OVER () AS HUGEINT)
           |      AS devx,
           |    CAST(count(*) OVER () * y - sum(y) OVER () AS HUGEINT)
           |      AS devy
           |  FROM daily
           |), den AS (
           |  SELECT sqrt(CAST(sum(devx * devx) AS DOUBLE) *
           |    CAST(sum(devy * devy) AS DOUBLE)) AS den
           |  FROM scaled
           |), lags AS (
           |  SELECT CAST(k AS INTEGER) AS lag_days
           |  FROM range(-7, 8) t(k)
           |), paired AS (
           |  SELECT l.lag_days, a.devx AS devx, b.devy AS devy2
           |  FROM scaled a
           |  JOIN lags l ON true
           |  JOIN scaled b ON b.d = a.d + to_days(l.lag_days)
           |)
           |SELECT lag_days, count(*) AS n_pairs,
           |  round(CAST(sum(devx * devy2) AS DOUBLE) /
           |    (SELECT den FROM den), 6) AS r
           |FROM paired GROUP BY lag_days ORDER BY lag_days"""
      .stripMargin))

  /** E282: **FIFO lot allocation** — match each part's returned
    * quantity (`l_returnflag = 'R'`, FIFO demand) against its earliest
    * supply lots (flags A/N), the classic inventory-costing /
    * cost-basis problem that defeats naive SQL: which lots does each
    * return consume? The join-free-per-row trick is CUMULATIVE
    * INTERVALS: supply lot i covers [cumQty_{i−1}, cumQty_i) on the
    * part's supply axis, demand j covers its own [lo, hi), and FIFO
    * matching IS interval intersection — matched(i,j) =
    * max(0, min(hi_i,hi_j) − max(lo_i,lo_j)). The join is equi on
    * partkey FIRST with the overlap predicate inside the key (the
    * E262 shape that keeps interval joins off the quadratic cliff;
    * per-part lot counts bound the pair work, and a skewed part would
    * take the E2/E47 salting path). Quantities are integral in the
    * fixture but accumulate as DECIMAL(18,2) cums / DECIMAL(38,0)
    * totals so every interval endpoint is exact on both engines; lot
    * order is the total (shipdate, orderkey, linenumber). Output per
    * part: lots, matches, matched vs unmatched-demand quantity. */
  val qFifoAllocation = Q("q_fifo_allocation",
    (spark, sfDir) => {
      import spark.implicits._
      val li = Tables.read(spark, sfDir, "lineitem")
        .select($"l_partkey".as("pk"), $"l_returnflag".as("rf"),
          $"l_quantity".cast("decimal(18,2)").as("q"),
          $"l_shipdate".as("sd"), $"l_orderkey".as("ok"),
          $"l_linenumber".as("ln"))
      def lots(side: DataFrame) = {
        val w = Window.partitionBy($"pk")
          .orderBy($"sd", $"ok", $"ln")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        side.select($"pk", $"q", sum($"q").over(w).as("hi"))
          .withColumn("lo", $"hi" - $"q")
      }
      val supply = lots(li.filter($"rf" =!= "R"))
        .select($"pk", $"lo".as("slo"), $"hi".as("shi"))
      val demand = lots(li.filter($"rf" === "R"))
        .select($"pk", $"lo".as("dlo"), $"hi".as("dhi"))
      val matched = supply.join(demand, Seq("pk"))
        .filter($"slo" < $"dhi" && $"dlo" < $"shi")
        .groupBy($"pk")
        .agg(count(lit(1)).as("n_matches"),
          sum(least($"shi", $"dhi") - greatest($"slo", $"dlo"))
            .as("matched_qty"))
      demand.groupBy($"pk")
        .agg(count(lit(1)).as("n_demands"),
          sum($"dhi" - $"dlo").as("demand_qty"))
        .join(matched, Seq("pk"), "left")
        .select($"pk".as("part_key"), $"n_demands",
          coalesce($"n_matches", lit(0L)).as("n_matches"),
          $"demand_qty".cast("double").as("demand_qty"),
          coalesce($"matched_qty", lit(0).cast("decimal(18,2)"))
            .cast("double").as("matched_qty"),
          ($"demand_qty" - coalesce($"matched_qty",
            lit(0).cast("decimal(18,2)"))).cast("double")
            .as("unmatched_qty"))
        .orderBy($"part_key")
    },
    Some("""WITH li AS (
           |  SELECT l_partkey AS pk, l_returnflag AS rf,
           |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
           |    l_shipdate AS sd, l_orderkey AS ok, l_linenumber AS ln
           |  FROM lineitem
           |), supply AS (
           |  SELECT pk, q,
           |    sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln) AS shi,
           |    sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln) - q
           |      AS slo
           |  FROM li WHERE rf <> 'R'
           |), demand AS (
           |  SELECT pk, q,
           |    sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln) AS dhi,
           |    sum(q) OVER (PARTITION BY pk ORDER BY sd, ok, ln) - q
           |      AS dlo
           |  FROM li WHERE rf = 'R'
           |), m AS (
           |  SELECT s.pk, count(*) AS n_matches,
           |    sum(least(s.shi, d.dhi) - greatest(s.slo, d.dlo))
           |      AS matched_qty
           |  FROM supply s JOIN demand d ON s.pk = d.pk
           |    AND s.slo < d.dhi AND d.dlo < s.shi
           |  GROUP BY s.pk
           |), dm AS (
           |  SELECT pk, count(*) AS n_demands,
           |    sum(dhi - dlo) AS demand_qty
           |  FROM demand GROUP BY pk
           |)
           |SELECT dm.pk AS part_key, n_demands,
           |  coalesce(n_matches, 0) AS n_matches,
           |  CAST(demand_qty AS DOUBLE) AS demand_qty,
           |  CAST(coalesce(matched_qty, 0) AS DOUBLE) AS matched_qty,
           |  CAST(demand_qty - coalesce(matched_qty, 0) AS DOUBLE)
           |    AS unmatched_qty
           |FROM dm LEFT JOIN m ON dm.pk = m.pk
           |ORDER BY part_key""".stripMargin))

  /** E284: **Theil inequality indices** — per market segment, the
    * entropy-based inequality measures over positive customer spend:
    * Theil T = Σ(xᵢ/S)·ln(N·xᵢ/S) (top-sensitive) and Theil L =
    * (1/N)·Σ ln(S/(N·xᵢ)) (bottom-sensitive), the decomposable
    * complements to Gini (E133) and HHI (E196) — unlike Gini, Theil
    * splits exactly into between-group + within-group terms, which is
    * why monitoring stacks carry it. Spend aggregates exactly
    * (DECIMAL cents); S and N come from one segment window; each
    * customer's ln term is double (the JSD/E205-proven class — ln of
    * an exact rational, summed per segment and rounded 6dp; zero-spend
    * customers are EXCLUDED, as ln 0 diverges — documented, and
    * n_customers reports the included count). One join + one hash agg
    * + one segment window; ≤5-row output. */
  val qTheilIndex = Q("q_theil_index",
    (spark, sfDir) => {
      import spark.implicits._
      val seg = Window.partitionBy($"c_mktsegment")
      Tables.read(spark, sfDir, "customer")
        .join(Tables.read(spark, sfDir, "orders"),
          $"c_custkey" === $"o_custkey")
        .groupBy($"c_mktsegment", $"c_custkey")
        .agg((sum($"o_totalprice".cast("decimal(18,2)")) * 100)
          .cast("decimal(38,0)").as("x"))
        .filter($"x" > 0)
        .select($"c_mktsegment", $"x",
          sum($"x").over(seg).as("s"),
          count(lit(1)).over(seg).as("n"))
        .groupBy($"c_mktsegment")
        .agg(max($"n").as("n_customers"),
          round(sum($"x".cast("double") / $"s".cast("double") *
            log($"n".cast("double") * $"x".cast("double") /
              $"s".cast("double"))), 6).as("theil_t"),
          round(sum(log($"s".cast("double") /
            ($"n".cast("double") * $"x".cast("double")))) /
            max($"n").cast("double"), 6).as("theil_l"))
        .orderBy($"c_mktsegment")
    },
    Some("""WITH spend AS (
           |  SELECT c_mktsegment, c_custkey,
           |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
           |      AS HUGEINT) AS x
           |  FROM customer JOIN orders ON c_custkey = o_custkey
           |  GROUP BY 1, 2
           |), framed AS (
           |  SELECT c_mktsegment, x,
           |    sum(x) OVER (PARTITION BY c_mktsegment) AS s,
           |    count(*) OVER (PARTITION BY c_mktsegment) AS n
           |  FROM spend WHERE x > 0
           |)
           |SELECT c_mktsegment,
           |  max(n) AS n_customers,
           |  round(sum(CAST(x AS DOUBLE) / CAST(s AS DOUBLE) *
           |    ln(CAST(n AS DOUBLE) * CAST(x AS DOUBLE) /
           |      CAST(s AS DOUBLE))), 6) AS theil_t,
           |  round(sum(ln(CAST(s AS DOUBLE) /
           |    (CAST(n AS DOUBLE) * CAST(x AS DOUBLE)))) /
           |    CAST(max(n) AS DOUBLE), 6) AS theil_l
           |FROM framed GROUP BY c_mktsegment
           |ORDER BY c_mktsegment""".stripMargin))

  /** E285: **Holt linear-trend forecast** — double exponential
    * smoothing over each event type's daily counts, the next rung
    * after SES (E255) when the series trends: level lₜ = α·yₜ +
    * (1−α)(lₜ₋₁+bₜ₋₁), trend bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, forecast
    * ŷ = l+b. The recursion carries TWO states, so the row-local fold
    * (E255's collect-sorted-then-`aggregate()` shape — calendar-
    * bounded arrays, never raw-row-bounded) folds a STRUCT
    * accumulator, with init {l: y₁, b: 0} (the zero-trend init
    * variant, pinned) and every constant CAST to DOUBLE. The oracle
    * is a RECURSIVE CTE stepping t = 2..n with the identical update
    * expression — NOT a `list_reduce` struct fold: DuckDB v1.0
    * resolves struct-field references inside fold lambdas lazily and
    * a two-field accumulator reads the wrong generation (measured:
    * {'l': acc.l+x.l, 'b': acc.b+acc.l} over [10,12,14,13] returns
    * b=95, which is neither the old-l 68 nor the new-l 107). The
    * recursion is ~n_days steps over an event-type-keyed join — both
    * sides execute the same double ops in the same order, one 6dp
    * round at the edge. */
  val qForecastHolt = Q("q_forecast_holt",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"y")))
          .as("series"))
        .select($"event_type",
          size($"series").as("n_days"),
          expr("""aggregate(
            |  transform(slice(series, 2, size(series) - 1),
            |    x -> CAST(x.y AS DOUBLE)),
            |  named_struct(
            |    'l', CAST(element_at(series, 1).y AS DOUBLE),
            |    'b', CAST(0.0 AS DOUBLE)),
            |  (acc, y) -> named_struct(
            |    'l', CAST(0.3 AS DOUBLE) * y
            |      + CAST(0.7 AS DOUBLE) * (acc.l + acc.b),
            |    'b', CAST(0.4 AS DOUBLE) *
            |      ((CAST(0.3 AS DOUBLE) * y
            |        + CAST(0.7 AS DOUBLE) * (acc.l + acc.b)) - acc.l)
            |      + CAST(0.6 AS DOUBLE) * acc.b))""".stripMargin)
            .as("st"))
        .select($"event_type", $"n_days",
          round($"st".getField("l") + $"st".getField("b"), 6)
            .as("forecast_next"),
          round($"st".getField("b"), 6).as("trend"))
        .orderBy($"event_type")
    },
    Some("""WITH RECURSIVE daily AS (
           |  SELECT event_type,
           |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |    count(*) AS y
           |  FROM events GROUP BY 1, 2
           |), idx AS (
           |  SELECT event_type, CAST(y AS DOUBLE) AS y,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY day) AS t,
           |    count(*) OVER (PARTITION BY event_type) AS n_days
           |  FROM daily
           |), st AS (
           |  SELECT event_type, t, n_days, y AS l,
           |    CAST(0.0 AS DOUBLE) AS b
           |  FROM idx WHERE t = 1
           |  UNION ALL
           |  SELECT s.event_type, d.t, s.n_days,
           |    CAST(0.3 AS DOUBLE) * d.y
           |      + CAST(0.7 AS DOUBLE) * (s.l + s.b),
           |    CAST(0.4 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * d.y
           |      + CAST(0.7 AS DOUBLE) * (s.l + s.b)) - s.l)
           |      + CAST(0.6 AS DOUBLE) * s.b
           |  FROM st s JOIN idx d ON d.event_type = s.event_type
           |    AND d.t = s.t + 1
           |)
           |SELECT event_type, n_days,
           |  round(l + b, 6) AS forecast_next,
           |  round(b, 6) AS trend
           |FROM st WHERE t = n_days ORDER BY event_type"""
      .stripMargin))

  /** E290: **4-4-5 fiscal calendar rollup** — revenue by RETAIL fiscal
    * month: quarters are 13 whole weeks split 4-4-5, so every fiscal
    * month contains a whole number of weeks and same-month comparisons
    * aren't distorted by calendar-month length (the reporting calendar
    * most retailers actually close their books on). The mapping is
    * pure integer arithmetic both engines execute identically: week =
    * min(doy DIV 7 + 1, 52) from the fiscal-year start (Jan 1 here;
    * week 53's stub days fold into month 12, the standard treatment),
    * quarter = (week−1) DIV 13 + 1, and the 4-4-5 split inside the
    * quarter by week-in-quarter ≤ 4 / ≤ 8. One scan, one hash agg at
    * the (year, month) grain — the fiscal mapping rides the scan
    * projection, so the shuffle is the ≤84-row rollup. */
  val qFiscal445 = Q("q_fiscal_445",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .select(year($"o_orderdate").as("fiscal_year"),
          expr("""least(datediff(CAST(o_orderdate AS DATE),
            |  make_date(year(o_orderdate), 1, 1)) DIV 7 + 1, 52)"""
            .stripMargin).as("wk"),
          ($"o_totalprice".cast("decimal(18,2)") * 100)
            .cast("decimal(38,0)").as("cents"))
        .select($"fiscal_year", $"cents",
          expr("(wk - 1) DIV 13 + 1").as("q"),
          expr("(wk - 1) % 13 + 1").as("wiq"))
        .select($"fiscal_year", $"cents",
          (($"q" - 1) * 3 + when($"wiq" <= 4, 1)
            .when($"wiq" <= 8, 2).otherwise(3)).cast("int")
            .as("fiscal_month"))
        .groupBy($"fiscal_year", $"fiscal_month")
        .agg(count(lit(1)).as("n_orders"),
          sum($"cents").cast("long").as("revenue_cents"))
        .orderBy($"fiscal_year", $"fiscal_month")
    },
    Some("""WITH wk AS (
           |  SELECT CAST(year(o_orderdate) AS INTEGER) AS fiscal_year,
           |    least(datediff('day',
           |      make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1),
           |      CAST(o_orderdate AS DATE)) // 7 + 1, 52) AS wk,
           |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS HUGEINT) AS cents
           |  FROM orders
           |), mapped AS (
           |  SELECT fiscal_year, cents,
           |    ((wk - 1) // 13) * 3 +
           |      CASE WHEN (wk - 1) % 13 + 1 <= 4 THEN 1
           |           WHEN (wk - 1) % 13 + 1 <= 8 THEN 2
           |           ELSE 3 END AS fiscal_month
           |  FROM wk
           |)
           |SELECT fiscal_year, fiscal_month, count(*) AS n_orders,
           |  CAST(sum(cents) AS BIGINT) AS revenue_cents
           |FROM mapped GROUP BY 1, 2
           |ORDER BY fiscal_year, fiscal_month""".stripMargin))

  /** E299: **weighted-average-cost inventory valuation** — the
    * moving-WAC companion to FIFO lot allocation (E282): purchases
    * (rf ≠ 'R') raise on-hand qty and cost at the lot's unit price;
    * issues (rf = 'R') relieve qty at the CURRENT average unit cost,
    * clamped to on-hand (over-issue ships what exists — pinned).
    * Unlike FIFO, WAC is inherently SEQUENTIAL — each issue's unit
    * cost depends on every prior transaction — so this is the E255/
    * E285 row-local fold shape: per part, collect the year's
    * transactions sorted by (ship date, order, line) and fold a
    * THREE-field struct {qty, cost, cogs} with `aggregate()`. The
    * oracle is the E285 RECURSIVE CTE (never a DuckDB struct
    * `list_reduce` — the lazy-field-resolution misfold documented
    * there), seeded at the zero accumulator and stepping t→t+1 with
    * the textually identical CASE arithmetic, so both engines run
    * the same doubles in the same order; one 4dp round at the edge.
    * Per-part transaction lists are small (≤49 rows at every
    * fixture scale — part fan-out, not table size, bounds them); the 100 TB layout is one shuffle on
    * part key then row-local folds — no iteration over the cluster
    * (the recursion lives INSIDE a row), unlike the oracle's
    * engine-level loop. */
  val qWacInventory = Q("q_wac_inventory",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "lineitem")
        .select($"l_partkey".as("pk"),
          struct($"l_shipdate".as("sd"), $"l_orderkey".as("ok"),
            $"l_linenumber".as("ln"), $"l_returnflag".as("rf"),
            $"l_quantity".cast("double").as("q"),
            ($"l_extendedprice".cast("double") /
              $"l_quantity".cast("double")).as("p")).as("txn"))
        .groupBy($"pk")
        .agg(sort_array(collect_list($"txn")).as("series"))
        .select($"pk".as("part_key"),
          size($"series").as("n_txns"),
          expr("""aggregate(series,
            |  named_struct('qty', CAST(0.0 AS DOUBLE),
            |    'cost', CAST(0.0 AS DOUBLE),
            |    'cogs', CAST(0.0 AS DOUBLE)),
            |  (acc, x) -> CASE WHEN x.rf <> 'R' THEN named_struct(
            |      'qty', acc.qty + x.q,
            |      'cost', acc.cost + x.q * x.p,
            |      'cogs', acc.cogs)
            |    ELSE named_struct(
            |      'qty', acc.qty - least(x.q, acc.qty),
            |      'cost', acc.cost - least(x.q, acc.qty) *
            |        (CASE WHEN acc.qty > CAST(0.0 AS DOUBLE)
            |          THEN acc.cost / acc.qty
            |          ELSE CAST(0.0 AS DOUBLE) END),
            |      'cogs', acc.cogs + least(x.q, acc.qty) *
            |        (CASE WHEN acc.qty > CAST(0.0 AS DOUBLE)
            |          THEN acc.cost / acc.qty
            |          ELSE CAST(0.0 AS DOUBLE) END))
            |    END)""".stripMargin).as("st"))
        .select($"part_key", $"n_txns",
          round($"st".getField("qty"), 4).as("end_qty"),
          round($"st".getField("cost"), 4).as("end_cost"),
          round($"st".getField("cogs"), 4).as("cogs_total"),
          round(when($"st".getField("qty") > 0.0,
            $"st".getField("cost") / $"st".getField("qty")), 4)
            .as("end_unit_cost"))
        .orderBy($"part_key")
    },
    Some("""WITH RECURSIVE txns AS (
           |  SELECT l_partkey AS pk, l_returnflag AS rf,
           |    CAST(l_quantity AS DOUBLE) AS q,
           |    CAST(l_extendedprice AS DOUBLE) /
           |      CAST(l_quantity AS DOUBLE) AS p,
           |    row_number() OVER (PARTITION BY l_partkey
           |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS t,
           |    count(*) OVER (PARTITION BY l_partkey) AS n
           |  FROM lineitem
           |), st AS (
           |  SELECT pk, 0 AS t,
           |    CAST(0.0 AS DOUBLE) AS qty,
           |    CAST(0.0 AS DOUBLE) AS cost,
           |    CAST(0.0 AS DOUBLE) AS cogs
           |  FROM (SELECT DISTINCT pk FROM txns)
           |  UNION ALL
           |  SELECT s.pk, d.t,
           |    CASE WHEN d.rf <> 'R' THEN s.qty + d.q
           |      ELSE s.qty - least(d.q, s.qty) END,
           |    CASE WHEN d.rf <> 'R' THEN s.cost + d.q * d.p
           |      ELSE s.cost - least(d.q, s.qty) *
           |        (CASE WHEN s.qty > CAST(0.0 AS DOUBLE)
           |          THEN s.cost / s.qty
           |          ELSE CAST(0.0 AS DOUBLE) END) END,
           |    CASE WHEN d.rf <> 'R' THEN s.cogs
           |      ELSE s.cogs + least(d.q, s.qty) *
           |        (CASE WHEN s.qty > CAST(0.0 AS DOUBLE)
           |          THEN s.cost / s.qty
           |          ELSE CAST(0.0 AS DOUBLE) END) END
           |  FROM st s JOIN txns d ON d.pk = s.pk AND d.t = s.t + 1
           |), fin AS (
           |  SELECT pk, max(t) AS n FROM st GROUP BY pk
           |)
           |SELECT s.pk AS part_key, fin.n AS n_txns,
           |  round(s.qty, 4) AS end_qty,
           |  round(s.cost, 4) AS end_cost,
           |  round(s.cogs, 4) AS cogs_total,
           |  round(CASE WHEN s.qty > 0.0 THEN s.cost / s.qty END, 4)
           |    AS end_unit_cost
           |FROM st s JOIN fin ON s.pk = fin.pk AND s.t = fin.n
           |ORDER BY part_key""".stripMargin))

  /** E300: **Fellegi–Sunter record-linkage weights** — the
    * probabilistic model behind every production entity-resolution
    * stack (and behind i2b2-side patient matching): for each
    * comparison field f, a pair that AGREES contributes
    * log₂(m_f/u_f) and a disagreement log₂((1−m_f)/(1−u_f)), where
    * u_f (chance agreement between non-matches) is ESTIMATED FROM
    * THE DATA as Σ_v n₁(v)·n₂(v) / (N₁·N₂) — an exact integer
    * numerator (one equi-join of the two value-frequency tables, no
    * float accumulation) with ONE double division, floored at
    * 1/(N₁·N₂) so a collision-free field cannot produce log₂ 0; m_f
    * is the usual asserted prior (0.9 balance, 0.95 suffix). The
    * fixture carries no phone column, so the second comparator is
    * the name's trailing digit — a uniform low-cardinality surrogate
    * for the phone-suffix field real linkage uses. Pairs
    * come from the E119 blocking discipline (equi-join on nation —
    * never all-pairs), and the output is the canonical agreement-
    * pattern table: one row per (agree_bal, agree_suffix) cell with
    * its pair count and composite weight. The 1-row (N₁, N₂, u…)
    * stats frame broadcasts into the ≤4-row pattern table — the
    * allowlisted E147-class tiny cross, not a data cross. */
  val qLinkFellegi = Q("q_link_fellegi",
    (spark, sfDir) => {
      import spark.implicits._
      val cust = Tables.read(spark, sfDir, "customer")
        .select($"c_custkey", $"c_nationkey",
          floor($"c_acctbal" / 1000).as("cb"),
          expr("right(c_name, 1)").as("cp"))
      val supp = Tables.read(spark, sfDir, "supplier")
        .select($"s_suppkey", $"s_nationkey",
          floor($"s_acctbal" / 1000).as("sb"),
          expr("right(s_name, 1)").as("sp"))
      def uNum(l: DataFrame, lk: String, r: DataFrame, rk: String) =
        l.groupBy(col(lk)).agg(count(lit(1)).as("cl"))
          .join(r.groupBy(col(rk)).agg(count(lit(1)).as("cr")),
            col(lk) === col(rk))
          .agg(coalesce(sum($"cl" * $"cr"), lit(0L)).as("num"))
      val stats = cust.agg(count(lit(1)).as("n1"))
        .crossJoin(supp.agg(count(lit(1)).as("n2")))
        .crossJoin(uNum(cust, "cb", supp, "sb")
          .select($"num".as("num_bal")))
        .crossJoin(uNum(cust, "cp", supp, "sp")
          .select($"num".as("num_suffix")))
        .select($"n1", $"n2",
          (greatest($"num_bal", lit(1L)).cast("double") /
            ($"n1" * $"n2").cast("double")).as("u_bal"),
          (greatest($"num_suffix", lit(1L)).cast("double") /
            ($"n1" * $"n2").cast("double")).as("u_suffix"))
      val patterns = cust.join(supp, $"c_nationkey" === $"s_nationkey")
        .select(($"cb" === $"sb").cast("int").as("agree_bal"),
          ($"cp" === $"sp").cast("int").as("agree_suffix"))
        .groupBy($"agree_bal", $"agree_suffix")
        .agg(count(lit(1)).as("n_pairs"))
      patterns.crossJoin(broadcast(stats))
        .select($"agree_bal", $"agree_suffix", $"n_pairs",
          round($"u_bal", 6).as("u_bal"),
          round($"u_suffix", 6).as("u_suffix"),
          round(
            when($"agree_bal" === 1, log2(lit(0.9) / $"u_bal"))
              .otherwise(log2(lit(0.1) / (lit(1.0) - $"u_bal"))) +
            when($"agree_suffix" === 1, log2(lit(0.95) / $"u_suffix"))
              .otherwise(log2(lit(0.05) / (lit(1.0) - $"u_suffix"))),
            6).as("weight"))
        .orderBy($"agree_bal", $"agree_suffix")
    },
    Some("""WITH cust AS (
           |  SELECT c_custkey, c_nationkey,
           |    floor(c_acctbal / 1000) AS cb,
           |    right(c_name, 1) AS cp
           |  FROM customer
           |), supp AS (
           |  SELECT s_suppkey, s_nationkey,
           |    floor(s_acctbal / 1000) AS sb,
           |    right(s_name, 1) AS sp
           |  FROM supplier
           |), stats AS (
           |  SELECT
           |    (SELECT count(*) FROM cust) AS n1,
           |    (SELECT count(*) FROM supp) AS n2,
           |    (SELECT coalesce(sum(cl * cr), 0) FROM
           |      (SELECT cb, count(*) AS cl FROM cust GROUP BY cb) a
           |      JOIN (SELECT sb, count(*) AS cr FROM supp
           |        GROUP BY sb) b ON a.cb = b.sb) AS num_bal,
           |    (SELECT coalesce(sum(cl * cr), 0) FROM
           |      (SELECT cp, count(*) AS cl FROM cust GROUP BY cp) a
           |      JOIN (SELECT sp, count(*) AS cr FROM supp
           |        GROUP BY sp) b ON a.cp = b.sp) AS num_suffix
           |), u AS (
           |  SELECT n1, n2,
           |    CAST(greatest(num_bal, 1) AS DOUBLE) /
           |      CAST(n1 * n2 AS DOUBLE) AS u_bal,
           |    CAST(greatest(num_suffix, 1) AS DOUBLE) /
           |      CAST(n1 * n2 AS DOUBLE) AS u_suffix
           |  FROM stats
           |), patterns AS (
           |  SELECT CAST(cb = sb AS INT) AS agree_bal,
           |    CAST(cp = sp AS INT) AS agree_suffix,
           |    count(*) AS n_pairs
           |  FROM cust JOIN supp ON c_nationkey = s_nationkey
           |  GROUP BY 1, 2
           |)
           |SELECT agree_bal, agree_suffix, n_pairs,
           |  round(u_bal, 6) AS u_bal,
           |  round(u_suffix, 6) AS u_suffix,
           |  round(
           |    (CASE WHEN agree_bal = 1
           |      THEN log2(CAST(0.9 AS DOUBLE) / u_bal)
           |      ELSE log2(CAST(0.1 AS DOUBLE) /
           |        (CAST(1.0 AS DOUBLE) - u_bal)) END) +
           |    (CASE WHEN agree_suffix = 1
           |      THEN log2(CAST(0.95 AS DOUBLE) / u_suffix)
           |      ELSE log2(CAST(0.05 AS DOUBLE) /
           |        (CAST(1.0 AS DOUBLE) - u_suffix)) END), 6)
           |    AS weight
           |FROM patterns CROSS JOIN u
           |ORDER BY agree_bal, agree_suffix""".stripMargin))

  /** E301: **fixed-effect meta-analysis** — the multi-site pooling
    * step that IS the published 4CE Phase-1 analysis plan: each site
    * computes an effect estimate locally (here the log odds ratio of
    * return ('R') given high quantity, from an integer-exact 2×2
    * table per supplier nation), and the coordinating site pools them
    * by INVERSE-VARIANCE weighting without ever seeing row-level
    * data. Per site: Haldane–Anscombe +0.5 on every cell (guards
    * empty cells and de-biases small ones), Woolf variance
    * Σ 1/(cell+0.5). Pooled: θ̂ = Σwθ/Σw with w = 1/v, SE = √(1/Σw),
    * plus the two heterogeneity diagnostics every forest plot
    * carries — Cochran's Q = Σwθ² − (Σwθ)²/Σw and
    * I² = max(0, (Q−df)/Q)·100. The per-site table is one broadcast
    * dim join + one hash agg (integer counts — exact on both
    * engines; doubles appear only in the ≤25-row effect stage); the
    * pooled columns repeat per row via an empty-frame window over
    * that ≤25-row frame — driver-scale, not a data shuffle. At
    * 100 TB the sites ARE the partition grain: per-site cells reduce
    * map-side, and the pooling stage touches k rows, not N. */
  val qMetaAnalysis = Q("q_meta_analysis",
    (spark, sfDir) => {
      import spark.implicits._
      val supp = Tables.read(spark, sfDir, "supplier")
        .select($"s_suppkey", $"s_nationkey".as("site"))
      val cells = Tables.read(spark, sfDir, "lineitem")
        .select($"l_suppkey",
          ($"l_quantity" > 25).cast("int").as("e"),
          ($"l_returnflag" === "R").cast("int").as("y"))
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"site")
        .agg(sum($"e" * $"y").as("a"),
          sum($"e" * (lit(1) - $"y")).as("b"),
          sum((lit(1) - $"e") * $"y").as("c"),
          sum((lit(1) - $"e") * (lit(1) - $"y")).as("d"))
      val eff = cells.select($"site",
          ($"a" + $"b" + $"c" + $"d").as("n"),
          log(($"a" + 0.5) * ($"d" + 0.5) /
            (($"b" + 0.5) * ($"c" + 0.5))).as("log_or"),
          (lit(1.0) / ($"a" + 0.5) + lit(1.0) / ($"b" + 0.5) +
            lit(1.0) / ($"c" + 0.5) + lit(1.0) / ($"d" + 0.5)).as("v"))
        .withColumn("w", lit(1.0) / $"v")
      val w0 = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val q = $"swt2" - $"swt" * $"swt" / $"sw"
      eff.select($"site".as("site_key"), $"n".as("n_lines"),
          round($"log_or", 6).as("log_or"),
          round($"v", 6).as("var_log_or"),
          sum($"w" * $"log_or").over(w0).as("swt"),
          sum($"w" * $"log_or" * $"log_or").over(w0).as("swt2"),
          sum($"w").over(w0).as("sw"),
          count(lit(1)).over(w0).as("k"))
        .select($"site_key", $"n_lines", $"log_or", $"var_log_or",
          round($"swt" / $"sw", 6).as("pooled_log_or"),
          round(sqrt(lit(1.0) / $"sw"), 6).as("pooled_se"),
          round(q, 6).as("q_het"),
          round(when(q > 0.0,
            greatest(lit(0.0), (q - ($"k" - 1)) / q * 100))
            .otherwise(0.0), 2).as("i2_pct"))
        .orderBy($"site_key")
    },
    Some("""WITH cells AS (
           |  SELECT s_nationkey AS site,
           |    sum(CASE WHEN l_quantity > 25 AND l_returnflag = 'R'
           |      THEN 1 ELSE 0 END) AS a,
           |    sum(CASE WHEN l_quantity > 25 AND l_returnflag <> 'R'
           |      THEN 1 ELSE 0 END) AS b,
           |    sum(CASE WHEN l_quantity <= 25 AND l_returnflag = 'R'
           |      THEN 1 ELSE 0 END) AS c,
           |    sum(CASE WHEN l_quantity <= 25 AND l_returnflag <> 'R'
           |      THEN 1 ELSE 0 END) AS d
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1
           |), eff AS (
           |  SELECT site, a + b + c + d AS n,
           |    ln((a + 0.5) * (d + 0.5) /
           |      ((b + 0.5) * (c + 0.5))) AS log_or,
           |    1.0 / (a + 0.5) + 1.0 / (b + 0.5) +
           |      1.0 / (c + 0.5) + 1.0 / (d + 0.5) AS v
           |  FROM cells
           |), wtd AS (
           |  SELECT *, 1.0 / v AS w FROM eff
           |), pooled AS (
           |  SELECT site, n, log_or, v,
           |    sum(w * log_or) OVER () AS swt,
           |    sum(w * log_or * log_or) OVER () AS swt2,
           |    sum(w) OVER () AS sw,
           |    count(*) OVER () AS k
           |  FROM wtd
           |)
           |SELECT site AS site_key, CAST(n AS BIGINT) AS n_lines,
           |  round(log_or, 6) AS log_or, round(v, 6) AS var_log_or,
           |  round(swt / sw, 6) AS pooled_log_or,
           |  round(sqrt(1.0 / sw), 6) AS pooled_se,
           |  round(swt2 - swt * swt / sw, 6) AS q_het,
           |  round(CASE WHEN swt2 - swt * swt / sw > 0 THEN
           |      greatest(0.0, ((swt2 - swt * swt / sw) - (k - 1)) /
           |        (swt2 - swt * swt / sw) * 100)
           |    ELSE 0.0 END, 2) AS i2_pct
           |FROM pooled ORDER BY site_key""".stripMargin))

  /** E302: **Benjamini–Hochberg FDR correction** — the multiple-
    * testing step that follows any per-site / per-stratum screen
    * (the E301 meta-analysis feeds it here): k hypotheses, each with
    * a two-sided normal p-value from z = θ/√v, ranked ascending, and
    * adjusted by the BH step-up rule p̃_(i) = min_{j≥i} p_(j)·k/j
    * (capped at 1) — the suffix-min formulation, computed as a
    * running min over the ranks in DESCENDING order, which is the
    * one-pass distributed form (the textbook "step-up scan" is
    * inherently sequential; the suffix-min is the same function as a
    * window). Φ has no closed form and neither engine ships erf with
    * identical ulps, so both sides evaluate the SAME Abramowitz–
    * Stegun 7.1.26 polynomial (|ε| < 7.5e-8, far inside the 6dp
    * gate) — textually identical constants, identical operation
    * order. All windows run over the ≤25-row per-site frame;
    * upstream is E301's integer-exact 2×2 pipeline. */
  val qFdrBh = Q("q_fdr_bh",
    (spark, sfDir) => {
      import spark.implicits._
      val supp = Tables.read(spark, sfDir, "supplier")
        .select($"s_suppkey", $"s_nationkey".as("site"))
      val cells = Tables.read(spark, sfDir, "lineitem")
        .select($"l_suppkey",
          ($"l_quantity" > 25).cast("int").as("e"),
          ($"l_returnflag" === "R").cast("int").as("y"))
        .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"site")
        .agg(sum($"e" * $"y").as("a"),
          sum($"e" * (lit(1) - $"y")).as("b"),
          sum((lit(1) - $"e") * $"y").as("c"),
          sum((lit(1) - $"e") * (lit(1) - $"y")).as("d"))
      val z = log(($"a" + 0.5) * ($"d" + 0.5) /
        (($"b" + 0.5) * ($"c" + 0.5))) /
        sqrt(lit(1.0) / ($"a" + 0.5) + lit(1.0) / ($"b" + 0.5) +
          lit(1.0) / ($"c" + 0.5) + lit(1.0) / ($"d" + 0.5))
      // Abramowitz–Stegun 7.1.26 upper tail: identical text on both
      // engines so the doubles agree bit-for-bit up to libm's exp.
      val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * abs($"z"))
      val tail = (lit(0.3989422804014327) *
        exp(-abs($"z") * abs($"z") / 2)) *
        (lit(0.319381530) * t - lit(0.356563782) * t * t +
          lit(1.781477937) * t * t * t -
          lit(1.821255978) * t * t * t * t +
          lit(1.330274429) * t * t * t * t * t)
      val ranked = cells.select($"site", z.as("z"))
        .withColumn("p", lit(2.0) * tail)
        .withColumn("k", count(lit(1)).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("rnk", row_number().over(
          Window.orderBy($"p", $"site")))
      ranked
        .withColumn("p_adj", least(lit(1.0),
          min($"p" * $"k" / $"rnk").over(Window.orderBy($"rnk".desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
        .select($"site".as("site_key"),
          round($"z", 4).as("z_score"),
          round($"p", 6).as("p_value"),
          $"rnk".as("p_rank"),
          round($"p_adj", 6).as("p_adj_bh"),
          ($"p_adj" < 0.05).as("significant"))
        .orderBy($"site_key")
    },
    Some("""WITH cells AS (
           |  SELECT s_nationkey AS site,
           |    sum(CASE WHEN l_quantity > 25 AND l_returnflag = 'R'
           |      THEN 1 ELSE 0 END) AS a,
           |    sum(CASE WHEN l_quantity > 25 AND l_returnflag <> 'R'
           |      THEN 1 ELSE 0 END) AS b,
           |    sum(CASE WHEN l_quantity <= 25 AND l_returnflag = 'R'
           |      THEN 1 ELSE 0 END) AS c,
           |    sum(CASE WHEN l_quantity <= 25 AND l_returnflag <> 'R'
           |      THEN 1 ELSE 0 END) AS d
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1
           |), zs AS (
           |  SELECT site,
           |    ln((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))) /
           |      sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5) +
           |        1.0 / (c + 0.5) + 1.0 / (d + 0.5)) AS z
           |  FROM cells
           |), ts AS (
           |  SELECT site, z,
           |    1.0 / (1.0 + 0.2316419 * abs(z)) AS t
           |  FROM zs
           |), ps AS (
           |  SELECT site, z,
           |    2.0 * ((0.3989422804014327 * exp(-abs(z) * abs(z) / 2)) *
           |      (0.319381530 * t - 0.356563782 * t * t +
           |       1.781477937 * t * t * t -
           |       1.821255978 * t * t * t * t +
           |       1.330274429 * t * t * t * t * t)) AS p
           |  FROM ts
           |), ranked AS (
           |  SELECT site, z, p,
           |    count(*) OVER () AS k,
           |    row_number() OVER (ORDER BY p, site) AS rnk
           |  FROM ps
           |), adj AS (
           |  SELECT site, z, p, rnk,
           |    least(1.0, min(p * k / rnk) OVER (ORDER BY rnk DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           |      AS p_adj
           |  FROM ranked
           |)
           |SELECT site AS site_key, round(z, 4) AS z_score,
           |  round(p, 6) AS p_value, rnk AS p_rank,
           |  round(p_adj, 6) AS p_adj_bh,
           |  p_adj < 0.05 AS significant
           |FROM adj ORDER BY site_key""".stripMargin))

  /** E305: **difference-in-differences** — the workhorse causal
    * estimator for "treatment rolled out at time T": compare the
    * treated group's pre→post change against the control group's,
    * so any shared time trend cancels. Treatment is the deterministic
    * user-hash arm split the A/B rows (q_ab_test) already use; the
    * period pivot is data-derived (midpoint of the observed day span
    * — exact integer day arithmetic on both engines) and enters as a
    * 1-row broadcast cross, the allowlisted tiny-stats shape. Cell
    * means route through DECIMAL(18,6) sums (order-free, exact) with
    * ONE double division at the edge; the DiD estimate
    * (m₁₁−m₁₀)−(m₀₁−m₀₀) folds the 4-row cell table through an
    * empty-frame window (4 rows — driver scale). One map-side-
    * combined agg on (treated, post); nothing else shuffles. */
  val qDid = Q("q_did",
    (spark, sfDir) => {
      import spark.implicits._
      val ev = Tables.read(spark, sfDir, "events")
        .select($"user_id", to_date($"ts").as("d"),
          $"value".cast("decimal(18,6)").as("v"))
      val pivot = ev.agg(date_add(min($"d"),
        (datediff(max($"d"), min($"d")) / 2).cast("int")).as("cut"))
      val w0 = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      ev.crossJoin(broadcast(pivot))
        .select(($"user_id" % 2 === 1).cast("int").as("treated"),
          ($"d" >= $"cut").cast("int").as("post"), $"v")
        .groupBy($"treated", $"post")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .select($"treated", $"post", $"n",
          ($"sv".cast("double") / $"n").as("m"))
        .select($"treated", $"post", $"n",
          round($"m", 6).as("mean_value"),
          round(sum(when($"treated" === $"post", $"m")
            .otherwise(-$"m")).over(w0), 6).as("did_estimate"))
        .orderBy($"treated", $"post")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    CAST(value AS DECIMAL(18,6)) AS v
           |  FROM events
           |), piv AS (
           |  SELECT min(d) + CAST(date_diff('day', min(d), max(d)) // 2
           |    AS INT) AS cut
           |  FROM ev
           |), cells AS (
           |  SELECT CAST(user_id % 2 = 1 AS INT) AS treated,
           |    CAST(d >= cut AS INT) AS post,
           |    count(*) AS n, sum(v) AS sv
           |  FROM ev, piv GROUP BY 1, 2
           |), means AS (
           |  SELECT treated, post, n, CAST(sv AS DOUBLE) / n AS m
           |  FROM cells
           |)
           |SELECT treated, post, CAST(n AS BIGINT) AS n,
           |  round(m, 6) AS mean_value,
           |  round(sum(CASE WHEN treated = post THEN m ELSE -m END)
           |    OVER (), 6) AS did_estimate
           |FROM means ORDER BY treated, post""".stripMargin))

  /** E306: **CUPED variance reduction** — the experimentation-
    * platform standard (Deng et al., WSDM'13): regress each unit's
    * post-period metric on its own PRE-period metric and analyze the
    * residualized y_adj = y − θ(x − x̄), which keeps the mean of every
    * arm unbiased while removing the between-user variance the
    * pre-period already explains. θ = cov(x,y)/var(x) and x̄ are
    * GLOBAL (pooled across arms — the published estimator; per-arm θ
    * would bias the contrast), computed from the per-user frame by a
    * tree-reduced 1-row aggregate and broadcast-crossed back — never
    * a single-partition window over all users. Per arm the output
    * reports mean/variance of y and y_adj (manual Σ/Σ² forms,
    * identical operation order on both engines) and the realized
    * variance-reduction percentage — the number that decides whether
    * the covariate was worth collecting. Two shuffles total at any
    * scale: user-key agg, then arm-key agg. */
  val qCuped = Q("q_cuped",
    (spark, sfDir) => {
      import spark.implicits._
      val ev = Tables.read(spark, sfDir, "events")
        .select($"user_id", to_date($"ts").as("d"),
          $"value".cast("decimal(18,6)").as("v"))
      val pivot = ev.agg(date_add(min($"d"),
        (datediff(max($"d"), min($"d")) / 2).cast("int")).as("cut"))
      val per = ev.crossJoin(broadcast(pivot))
        .groupBy($"user_id")
        .agg(sum(when($"d" < $"cut", $"v")).as("sx"),
          count(when($"d" < $"cut", lit(1))).as("nx"),
          sum(when($"d" >= $"cut", $"v")).as("sy"),
          count(when($"d" >= $"cut", lit(1))).as("ny"))
        .filter($"nx" > 0 && $"ny" > 0)
        .select($"user_id", ($"user_id" % 2).cast("int").as("variant"),
          ($"sx".cast("double") / $"nx").as("x"),
          ($"sy".cast("double") / $"ny").as("y"))
      val theta = per.agg(count(lit(1)).as("k"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sx2"))
        .select((($"k" * $"sxy" - $"sx" * $"sy") /
            ($"k" * $"sx2" - $"sx" * $"sx")).as("theta"),
          ($"sx" / $"k").as("xbar"))
      per.crossJoin(broadcast(theta))
        .withColumn("y_adj", $"y" - $"theta" * ($"x" - $"xbar"))
        .groupBy($"variant")
        .agg(count(lit(1)).as("n_users"),
          sum($"y").as("sy"), sum($"y" * $"y").as("sy2"),
          sum($"y_adj").as("sa"), sum($"y_adj" * $"y_adj").as("sa2"),
          first($"theta").as("theta"))
        .select($"variant", $"n_users",
          round($"sy" / $"n_users", 6).as("mean_y"),
          round($"sa" / $"n_users", 6).as("mean_y_adj"),
          round(($"sy2" - $"sy" * $"sy" / $"n_users") /
            ($"n_users" - 1), 6).as("var_y"),
          round(($"sa2" - $"sa" * $"sa" / $"n_users") /
            ($"n_users" - 1), 6).as("var_y_adj"),
          round((lit(1.0) -
            (($"sa2" - $"sa" * $"sa" / $"n_users") /
              ($"sy2" - $"sy" * $"sy" / $"n_users"))) * 100, 2)
            .as("var_reduction_pct"),
          round($"theta", 6).as("theta"))
        .orderBy($"variant")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    CAST(value AS DECIMAL(18,6)) AS v
           |  FROM events
           |), piv AS (
           |  SELECT min(d) + CAST(date_diff('day', min(d), max(d)) // 2
           |    AS INT) AS cut
           |  FROM ev
           |), per AS (
           |  SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
           |    CAST(sum(CASE WHEN d < cut THEN v END) AS DOUBLE) /
           |      count(CASE WHEN d < cut THEN 1 END) AS x,
           |    CAST(sum(CASE WHEN d >= cut THEN v END) AS DOUBLE) /
           |      count(CASE WHEN d >= cut THEN 1 END) AS y
           |  FROM ev, piv
           |  GROUP BY 1, 2
           |  HAVING count(CASE WHEN d < cut THEN 1 END) > 0
           |     AND count(CASE WHEN d >= cut THEN 1 END) > 0
           |), th AS (
           |  SELECT (count(*) * sum(x * y) - sum(x) * sum(y)) /
           |      (count(*) * sum(x * x) - sum(x) * sum(x)) AS theta,
           |    sum(x) / count(*) AS xbar
           |  FROM per
           |), adj AS (
           |  SELECT variant, y, y - theta * (x - xbar) AS y_adj, theta
           |  FROM per, th
           |)
           |SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
           |  round(sum(y) / count(*), 6) AS mean_y,
           |  round(sum(y_adj) / count(*), 6) AS mean_y_adj,
           |  round((sum(y * y) - sum(y) * sum(y) / count(*)) /
           |    (count(*) - 1), 6) AS var_y,
           |  round((sum(y_adj * y_adj) - sum(y_adj) * sum(y_adj) /
           |    count(*)) / (count(*) - 1), 6) AS var_y_adj,
           |  round((1.0 - ((sum(y_adj * y_adj) - sum(y_adj) *
           |    sum(y_adj) / count(*)) /
           |    (sum(y * y) - sum(y) * sum(y) / count(*)))) * 100, 2)
           |    AS var_reduction_pct,
           |  round(min(theta), 6) AS theta
           |FROM adj GROUP BY variant ORDER BY variant""".stripMargin))

  /** E309: **survey raking (iterative proportional fitting)** — the
    * standard post-stratification weighting step: scale the observed
    * (nation × segment) sample cells so their weighted margins match
    * KNOWN population margins (here the per-nation and per-segment
    * ORDER totals — activity-weighted targets the customer sample
    * under-represents). IPF alternates row- and column-
    * normalization; like k-core (E253) the semantics are BOUNDED —
    * exactly 5 double sweeps, and the ORACLE UNROLLS THE SAME 5
    * sweeps, so both engines always compute the identical bounded
    * fixpoint approximation. Each half-sweep is one margin-partition
    * window (w ← w·target/Σ_margin w) over the CELL table, whose
    * grain is quasi-identifier cells (≤ |nations|×|segments|), never
    * subjects — at 100 TB the subject table reduces once to cells
    * and the raking iterates on dimension-sized data. Margins enter
    * as broadcast-joined targets. */
  val qRakeIpf = Q("q_rake_ipf",
    (spark, sfDir) => {
      import spark.implicits._
      val cust = Tables.read(spark, sfDir, "customer")
      val obs = cust.groupBy($"c_nationkey".as("nat"),
          $"c_mktsegment".as("seg"))
        .agg(count(lit(1)).as("n_obs"))
      val pop = Tables.read(spark, sfDir, "orders")
        .select($"o_custkey")
        .join(broadcast(cust.select($"c_custkey", $"c_nationkey",
          $"c_mktsegment")), $"o_custkey" === $"c_custkey")
      val rowT = pop.groupBy($"c_nationkey".as("nat"))
        .agg(count(lit(1)).as("tr"))
      val colT = pop.groupBy($"c_mktsegment".as("seg"))
        .agg(count(lit(1)).as("tc"))
      var cur = obs
        .join(broadcast(rowT), Seq("nat"))
        .join(broadcast(colT), Seq("seg"))
        .withColumn("w", $"n_obs".cast("double"))
      val byNat = Window.partitionBy($"nat")
      val bySeg = Window.partitionBy($"seg")
      for (_ <- 1 to 5) {
        cur = cur.withColumn("w", $"w" * $"tr" / sum($"w").over(byNat))
        cur = cur.withColumn("w", $"w" * $"tc" / sum($"w").over(bySeg))
      }
      cur.select($"nat".as("nation_key"), $"seg".as("segment"),
          $"n_obs", $"tr".as("nation_target"),
          $"tc".as("segment_target"), round($"w", 6).as("raked_count"))
        .orderBy($"nation_key", $"segment")
    },
    Some {
      val base =
        """WITH obs AS MATERIALIZED (
          |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
          |    count(*) AS n_obs
          |  FROM customer GROUP BY 1, 2
          |), rt AS MATERIALIZED (
          |  SELECT c_nationkey AS nat, count(*) AS tr
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  GROUP BY 1
          |), ct AS MATERIALIZED (
          |  SELECT c_mktsegment AS seg, count(*) AS tc
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  GROUP BY 1
          |), r0 AS MATERIALIZED (
          |  SELECT nat, seg, n_obs, tr, tc,
          |    CAST(n_obs AS DOUBLE) AS w
          |  FROM obs JOIN rt USING (nat) JOIN ct USING (seg)
          |)""".stripMargin
      val rounds = (1 to 5).map { i =>
        s""", r${i}a AS MATERIALIZED (
           |  SELECT nat, seg, n_obs, tr, tc,
           |    w * tr / (sum(w) OVER (PARTITION BY nat)) AS w
           |  FROM r${i - 1}
           |), r$i AS MATERIALIZED (
           |  SELECT nat, seg, n_obs, tr, tc,
           |    w * tc / (sum(w) OVER (PARTITION BY seg)) AS w
           |  FROM r${i}a
           |)""".stripMargin
      }.mkString
      base + rounds +
        """
          |SELECT nat AS nation_key, seg AS segment, n_obs,
          |  CAST(tr AS BIGINT) AS nation_target,
          |  CAST(tc AS BIGINT) AS segment_target,
          |  round(w, 6) AS raked_count
          |FROM r5 ORDER BY nation_key, segment""".stripMargin
    })

  /** E310: **covariate balance audit (standardized mean
    * differences)** — the table-one check that accompanies every
    * DiD/CUPED/PSM analysis (E305/E306): per baseline covariate, the
    * between-arm difference in units of pooled standard deviation,
    * |SMD| > 0.1 being the conventional imbalance flag. Covariates
    * are per-user baseline features (mean event value, event count,
    * distinct event types) — one user-key aggregation; the audit
    * itself runs on the per-user frame with one (covariate × arm)
    * aggregation after an explicit 3-way unpivot (stack), manual
    * Σ/Σ² variance forms so both engines execute the identical
    * arithmetic. Output grain: covariate — 3 rows. Two shuffles at
    * any scale (user key, then covariate×arm). */
  val qCovariateBalance = Q("q_covariate_balance",
    (spark, sfDir) => {
      import spark.implicits._
      val per = Tables.read(spark, sfDir, "events")
        .groupBy($"user_id")
        .agg((sum($"value".cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("mean_value"),
          count(lit(1)).cast("double").as("n_events"),
          countDistinct($"event_type").cast("double").as("n_types"))
        .select(($"user_id" % 2).cast("int").as("arm"),
          $"mean_value", $"n_events", $"n_types")
      val long = per.select($"arm", expr(
        """stack(3, 'mean_value', mean_value,
          |  'n_events', n_events,
          |  'n_types', n_types) AS (covariate, x)""".stripMargin))
      long.groupBy($"covariate", $"arm")
        .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"x" * $"x").as("sx2"))
        .select($"covariate", $"arm",
          ($"sx" / $"n").as("m"),
          (($"sx2" - $"sx" * $"sx" / $"n") / ($"n" - 1)).as("v"))
        .groupBy($"covariate")
        .agg(sum(when($"arm" === 0, $"m")).as("mean_arm0"),
          sum(when($"arm" === 1, $"m")).as("mean_arm1"),
          sum(when($"arm" === 0, $"v")).as("var_arm0"),
          sum(when($"arm" === 1, $"v")).as("var_arm1"))
        .withColumn("smd_raw",
          when($"var_arm0" + $"var_arm1" > 0,
            ($"mean_arm1" - $"mean_arm0") /
              sqrt(($"var_arm0" + $"var_arm1") / 2))
            .otherwise(0.0))
        .select($"covariate",
          round($"mean_arm0", 6).as("mean_arm0"),
          round($"mean_arm1", 6).as("mean_arm1"),
          round($"smd_raw", 6).as("smd"),
          (abs($"smd_raw") <= 0.1).as("balanced"))
        .orderBy($"covariate")
    },
    Some("""WITH per AS (
           |  SELECT CAST(user_id % 2 AS INT) AS arm,
           |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
           |      count(*) AS mean_value,
           |    CAST(count(*) AS DOUBLE) AS n_events,
           |    CAST(count(DISTINCT event_type) AS DOUBLE) AS n_types
           |  FROM events GROUP BY user_id
           |), long AS (
           |  SELECT arm, 'mean_value' AS covariate, mean_value AS x
           |    FROM per
           |  UNION ALL
           |  SELECT arm, 'n_events', n_events FROM per
           |  UNION ALL
           |  SELECT arm, 'n_types', n_types FROM per
           |), stats AS (
           |  SELECT covariate, arm,
           |    sum(x) / count(*) AS m,
           |    (sum(x * x) - sum(x) * sum(x) / count(*)) /
           |      (count(*) - 1) AS v
           |  FROM long GROUP BY 1, 2
           |), wide AS (
           |  SELECT covariate,
           |    sum(CASE WHEN arm = 0 THEN m END) AS mean_arm0,
           |    sum(CASE WHEN arm = 1 THEN m END) AS mean_arm1,
           |    sum(CASE WHEN arm = 0 THEN v END) AS var_arm0,
           |    sum(CASE WHEN arm = 1 THEN v END) AS var_arm1
           |  FROM stats GROUP BY covariate
           |), smds AS (
           |  SELECT covariate, mean_arm0, mean_arm1,
           |    CASE WHEN var_arm0 + var_arm1 > 0 THEN
           |      (mean_arm1 - mean_arm0) /
           |        sqrt((var_arm0 + var_arm1) / 2)
           |    ELSE 0.0 END AS smd_raw
           |  FROM wide
           |)
           |SELECT covariate,
           |  round(mean_arm0, 6) AS mean_arm0,
           |  round(mean_arm1, 6) AS mean_arm1,
           |  round(smd_raw, 6) AS smd,
           |  abs(smd_raw) <= 0.1 AS balanced
           |FROM smds ORDER BY covariate""".stripMargin))

  /** E316: **Theil–Sen robust slope** — the median-of-pairwise-slopes
    * trend estimator (up to ~29% outlier breakdown vs OLS's zero),
    * the standard robust companion to the OLS window row (E228): per
    * event type, every day pair (i < j) contributes
    * (yⱼ−yᵢ)/(xⱼ−xᵢ) and the estimate is the exact median. The pair
    * expansion is the E-Kendall daily-frame discipline: the per-type
    * daily series is calendar-bounded (≤31 rows at any data scale),
    * so the d₁<d₂ self-join is an equi-join on type over a broadcast
    * frame — pairs grow with the CALENDAR squared, not the data. y
    * sums route through DECIMAL (order-free); slopes become doubles
    * once, from identical operands on both engines; the median is
    * the exact interpolated percentile both engines define
    * identically. */
  val qTheilSen = Q("q_theil_sen",
    (spark, sfDir) => {
      import spark.implicits._
      val daily = Tables.read(spark, sfDir, "events")
        .groupBy($"event_type", to_date($"ts").as("d"))
        .agg(sum($"value".cast("decimal(18,6)")).as("y"))
        .select($"event_type",
          datediff($"d", lit("2024-01-01")).as("x"), $"y")
        .localCheckpoint()
      val slopes = daily.as("a")
        .join(broadcast(daily.as("b")),
          $"a.event_type" === $"b.event_type" && $"a.x" < $"b.x")
        .select($"a.event_type".as("event_type"),
          (($"b.y" - $"a.y").cast("double") /
            ($"b.x" - $"a.x").cast("double")).as("slope"))
      slopes.groupBy($"event_type")
        .agg(count(lit(1)).as("n_pairs"),
          round(percentile($"slope", lit(0.5)), 6)
            .as("theil_sen_slope"))
        .orderBy($"event_type")
    },
    Some("""WITH daily AS (
           |  SELECT event_type,
           |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           |    sum(CAST(value AS DECIMAL(18,6))) AS y
           |  FROM events GROUP BY 1, 2
           |), pts AS (
           |  SELECT event_type,
           |    date_diff('day', DATE '2024-01-01', d) AS x, y
           |  FROM daily
           |), slopes AS (
           |  SELECT a.event_type,
           |    CAST(b.y - a.y AS DOUBLE) /
           |      CAST(b.x - a.x AS DOUBLE) AS slope
           |  FROM pts a JOIN pts b
           |    ON a.event_type = b.event_type AND a.x < b.x
           |)
           |SELECT event_type, count(*) AS n_pairs,
           |  round(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
           |FROM slopes GROUP BY event_type
           |ORDER BY event_type""".stripMargin))

  /** E317: **growth accounting** — the weekly user-state decomposition
    * every product dashboard runs: each active (user, week) is NEW
    * (first week ever), RETAINED (active the prior week) or
    * RESURRECTED (active before, but not the prior week); CHURNED
    * counts users active in week w−1 and absent in w. The
    * quick ratio (new + resurrected) / churned summarizes whether
    * inflow covers outflow. Classification is one lag/lead window
    * over the deduplicated (user, week) presence frame — partitioned
    * by user, so at 100 TB the only exchange is the user key (the
    * presence dedup shares it); churn events are credited to the
    * FOLLOWING week and capped at the fixture's last observed week
    * (beyond it absence is censoring, not churn — same reasoning as
    * the Kaplan–Meier row). The week grain is Monday-truncated dates
    * on both engines. */
  val qGrowthAccounting = Q("q_growth_accounting",
    (spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val pres = Tables.read(spark, sfDir, "events")
        .select($"user_id",
          to_date(date_trunc("week", $"ts")).as("w"))
        .distinct()
      val byUser = Window.partitionBy($"user_id").orderBy($"w")
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cls = pres
        .withColumn("prev_w", lag($"w", 1).over(byUser))
        .withColumn("next_w", lead($"w", 1).over(byUser))
        .withColumn("max_w", max($"w").over(wAll))
      val states = cls.groupBy($"w")
        .agg(sum(when($"prev_w".isNull, 1L).otherwise(0L)).as("n_new"),
          sum(when($"prev_w" === date_sub($"w", 7), 1L).otherwise(0L))
            .as("n_retained"),
          sum(when($"prev_w".isNotNull &&
            $"prev_w" < date_sub($"w", 7), 1L).otherwise(0L))
            .as("n_resurrected"))
      val churn = cls
        .filter($"w" < $"max_w" &&
          ($"next_w".isNull || $"next_w" > date_add($"w", 7)))
        .groupBy(date_add($"w", 7).as("w"))
        .agg(count(lit(1)).as("n_churned"))
      states.join(churn, Seq("w"), "full_outer")
        .select($"w".as("week"),
          coalesce($"n_new", lit(0L)).as("n_new"),
          coalesce($"n_retained", lit(0L)).as("n_retained"),
          coalesce($"n_resurrected", lit(0L)).as("n_resurrected"),
          coalesce($"n_churned", lit(0L)).as("n_churned"),
          when(coalesce($"n_churned", lit(0L)) > 0,
            round((coalesce($"n_new", lit(0L)) +
              coalesce($"n_resurrected", lit(0L))).cast("double") /
              $"n_churned", 6)).as("quick_ratio"))
        .orderBy($"week")
    },
    Some("""WITH pres AS (
           |  SELECT DISTINCT user_id,
           |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
           |      AS w
           |  FROM events
           |), cls AS (
           |  SELECT user_id, w,
           |    lag(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w,
           |    lead(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w,
           |    max(w) OVER () AS max_w
           |  FROM pres
           |), states AS (
           |  SELECT w,
           |    sum(CASE WHEN prev_w IS NULL THEN 1 ELSE 0 END) AS n_new,
           |    sum(CASE WHEN prev_w = w - 7 THEN 1 ELSE 0 END)
           |      AS n_retained,
           |    sum(CASE WHEN prev_w IS NOT NULL AND prev_w < w - 7
           |      THEN 1 ELSE 0 END) AS n_resurrected
           |  FROM cls GROUP BY w
           |), churn AS (
           |  SELECT w + 7 AS w, count(*) AS n_churned
           |  FROM cls
           |  WHERE w < max_w AND (next_w IS NULL OR next_w > w + 7)
           |  GROUP BY 1
           |)
           |SELECT COALESCE(s.w, c.w) AS week,
           |  CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
           |  CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
           |  CAST(COALESCE(n_resurrected, 0) AS BIGINT)
           |    AS n_resurrected,
           |  CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned,
           |  CASE WHEN COALESCE(n_churned, 0) > 0 THEN
           |    round(CAST(COALESCE(n_new, 0) + COALESCE(n_resurrected, 0)
           |      AS DOUBLE) / n_churned, 6) END AS quick_ratio
           |FROM states s FULL OUTER JOIN churn c ON s.w = c.w
           |ORDER BY week""".stripMargin))

  /** E318: **logistic-regression IRLS step** — the distributed-GLM
    * architecture the 4CE Phase-2 analyses (severity models) actually
    * run, reduced to its load-bearing shape: ONE aggregation pass
    * computes the sufficient statistics (X'X, X'(y−p)), the
    * driver-scale solve inverts a d×d matrix, and iterations repeat
    * the pass — the map-reduce GLM from the MLlib literature, joining
    * the k-means (assignment) and PCA (power-iteration) step rows.
    * This row pins the FIRST Newton/IRLS step from β = 0, where
    * p = ½ and W = ¼I exactly, so β₁ = 4(X'X)⁻¹X'(y−½) in closed
    * form. Design: y = URGENT order, x = total price. All sufficient
    * statistics are INTEGER-EXACT (price in cents; Σc, Σc², Σcy as
    * BIGINT/DECIMAL(38,0) sums — order-free on both engines; the
    * only doubles are the 2×2 cofactor solve at the edge, identical
    * operation order both sides). Output: the stats, both
    * coefficients, and the fitted probability at the mean price —
    * one row. At 100 TB: one map-side-combined scan per iteration,
    * zero shuffles beyond the final 1-row reduce. */
  val qGlmIrlsStep = Q("q_glm_irls_step",
    (spark, sfDir) => {
      import spark.implicits._
      val base = Tables.read(spark, sfDir, "orders")
        .select(
          (($"o_totalprice".cast("decimal(18,2)") * 100)
            .cast("long")).as("cents"),
          ($"o_orderpriority" === "1-URGENT" ||
            $"o_orderpriority" === "URGENT").cast("long").as("y"))
      val stats = base.agg(
        count(lit(1)).as("n"),
        sum($"cents").as("sc"),
        sum(($"cents" * $"cents").cast("decimal(38,0)")).as("sc2"),
        sum($"y").as("sy"),
        sum($"cents" * $"y").as("scy"))
      // scale x = cents * 1e-7 (price in units of $100k) so the
      // normal-matrix entries are O(1); the 2x2 cofactor solve
      stats.select($"n", $"sy",
          ($"sc".cast("double") * 1e-7).as("bx"),
          ($"sc2".cast("double") * 1e-14).as("cx"),
          ($"sy".cast("double") - $"n".cast("double") / 2).as("u"),
          (($"scy".cast("double") - $"sc".cast("double") / 2) * 1e-7)
            .as("v"))
        .select($"n", $"sy",
          (($"n" * $"cx" - $"bx" * $"bx")).as("det"),
          $"bx", $"cx", $"u", $"v")
        .select($"n", $"sy",
          round(lit(4.0) * ($"cx" * $"u" - $"bx" * $"v") / $"det", 6)
            .as("beta_intercept"),
          round(lit(4.0) * ($"n" * $"v" - $"bx" * $"u") / $"det", 6)
            .as("beta_price"),
          round(lit(1.0) / (lit(1.0) + exp(-(
            (lit(4.0) * ($"cx" * $"u" - $"bx" * $"v") / $"det") +
              (lit(4.0) * ($"n" * $"v" - $"bx" * $"u") / $"det") *
                ($"bx" / $"n")))), 6).as("p_at_mean_price"))
    },
    Some("""WITH base AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) AS cents,
           |    CASE WHEN o_orderpriority IN ('1-URGENT', 'URGENT')
           |      THEN 1 ELSE 0 END AS y
           |  FROM orders
           |), stats AS (
           |  SELECT count(*) AS n,
           |    CAST(sum(cents) AS BIGINT) AS sc,
           |    sum(CAST(cents * cents AS DECIMAL(38,0))) AS sc2,
           |    CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(cents * y) AS BIGINT) AS scy
           |  FROM base
           |), scaled AS (
           |  SELECT n, sy,
           |    CAST(sc AS DOUBLE) * 1e-7 AS bx,
           |    CAST(sc2 AS DOUBLE) * 1e-14 AS cx,
           |    CAST(sy AS DOUBLE) - CAST(n AS DOUBLE) / 2 AS u,
           |    (CAST(scy AS DOUBLE) - CAST(sc AS DOUBLE) / 2) * 1e-7
           |      AS v
           |  FROM stats
           |), solved AS (
           |  SELECT n, sy, bx, cx, u, v,
           |    (n * cx - bx * bx) AS det
           |  FROM scaled
           |)
           |SELECT CAST(n AS BIGINT) AS n, sy,
           |  round(4.0 * (cx * u - bx * v) / det, 6)
           |    AS beta_intercept,
           |  round(4.0 * (n * v - bx * u) / det, 6) AS beta_price,
           |  round(1.0 / (1.0 + exp(-(
           |    (4.0 * (cx * u - bx * v) / det) +
           |      (4.0 * (n * v - bx * u) / det) * (bx / n)))), 6)
           |    AS p_at_mean_price
           |FROM solved""".stripMargin))

  /** E321: **split-conformal prediction intervals** — the
    * distribution-free uncertainty wrapper modern ML evals put around
    * ANY point predictor: fit on a train split, take q̂ = the 90th
    * percentile of absolute residuals on a held-out CALIBRATION
    * split, and the interval prediction ± q̂ then covers ≥90% of
    * fresh points by the exchangeability argument alone — no model
    * assumptions. The splits are the deterministic-hash discipline
    * (user_id mod 4: train {0,1}, calibrate 2, test 3 — the E25
    * leakage-safe grouping, so one user never straddles splits).
    * Predictor: per-type train mean from DECIMAL-exact sums; q̂: the
    * exact interpolated percentile both engines define identically;
    * the output audits the EMPIRICAL test coverage next to the
    * nominal 0.9. Two broadcast stat joins (5-row frames) + three
    * conditional aggregations — one fact scan each at any scale. */
  val qConformal = Q("q_conformal",
    (spark, sfDir) => {
      import spark.implicits._
      val ev = Tables.read(spark, sfDir, "events")
        .select($"event_type", ($"user_id" % 4).cast("int").as("split"),
          $"value")
      val fit = ev.filter($"split" <= 1).groupBy($"event_type")
        .agg(count(lit(1)).as("n_train"),
          (sum($"value".cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("mu"))
      val cal = ev.filter($"split" === 2)
        .join(broadcast(fit), Seq("event_type"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_cal"),
          percentile(abs($"value" - $"mu"), lit(0.9)).as("qhat"))
      ev.filter($"split" === 3)
        .join(broadcast(fit), Seq("event_type"))
        .join(broadcast(cal), Seq("event_type"))
        .groupBy($"event_type")
        .agg(first($"n_train").as("n_train"),
          first($"n_cal").as("n_cal"),
          count(lit(1)).as("n_test"),
          round(first($"mu"), 6).as("mu"),
          round(first($"qhat"), 6).as("qhat"),
          round(sum((abs($"value" - $"mu") <= $"qhat").cast("long"))
            .cast("double") / count(lit(1)), 6).as("coverage"))
        .orderBy($"event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type,
           |    CAST(user_id % 4 AS INT) AS split, value
           |  FROM events
           |), fit AS (
           |  SELECT event_type, count(*) AS n_train,
           |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) /
           |      count(*) AS mu
           |  FROM ev WHERE split <= 1 GROUP BY 1
           |), cal AS (
           |  SELECT e.event_type, count(*) AS n_cal,
           |    quantile_cont(abs(value - mu), 0.9) AS qhat
           |  FROM ev e JOIN fit USING (event_type)
           |  WHERE split = 2 GROUP BY 1
           |)
           |SELECT e.event_type,
           |  CAST(min(n_train) AS BIGINT) AS n_train,
           |  CAST(min(n_cal) AS BIGINT) AS n_cal,
           |  count(*) AS n_test,
           |  round(min(mu), 6) AS mu,
           |  round(min(qhat), 6) AS qhat,
           |  round(CAST(sum(CASE WHEN abs(value - mu) <= qhat
           |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
           |    AS coverage
           |FROM ev e JOIN fit USING (event_type)
           |  JOIN cal USING (event_type)
           |WHERE split = 3
           |GROUP BY 1 ORDER BY event_type""".stripMargin))

  private val windowViewRun =
    new java.util.concurrent.atomic.AtomicLong(0)

  val all: Seq[Q] = Seq(qKsTest, qAcf, qHhi, qLorenzCurve,
    qKendallTau, qCramersV, qCohensKappa, qF1Threshold,
    qTwap, qOhlcBars, qBusinessDays, qJsDivergence,
    qAggKmvDistinct, qArraySetops, qRunsTest, qQqMap, qAggKmvMerge,
    qAnomalyMad, qSurvivalKm, qSqlWindowClause, qTukeyFences,
    qSqlNotInNull, qSeasonalDecompose, qPivotMultiAgg, qSqlSugar,
    qRollingSlope, qSqlAggModifiers, qWindowRangeInterval,
    qHistogramEquiDepth, qTypedPipeline, qVolatility,
    qHistogram2d, qNewVsReturning, qAudienceOverlap,
    qFanoutProfile, qRevenueBridge, qParetoCutoff,
    qSurvivorship, qTopMovers, qSqlPipeSyntax, qSqlCollation,
    qSqlNamedArgs, qAggMoments,
    qLinkBlocking, qForecastSes,
    qSqlLateralView, qSqlClusterBy, qTransitionDwell,
    qAggArgExtremes, qScalarFormat, qJoinIntervalOverlap,
    qPivotDynamic, qForecastBacktest, qLangConfusion,
    qAllocApportion, qBalanceClamped,
    qMannWhitney, qAnovaF, qCcf,
    qFifoAllocation, qTheilIndex, qForecastHolt, qFiscal445,
    qWacInventory, qLinkFellegi, qMetaAnalysis, qFdrBh,
    qDid, qCuped, qRakeIpf, qCovariateBalance,
    qTheilSen, qGrowthAccounting, qGlmIrlsStep, qConformal)
}
