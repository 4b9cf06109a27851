package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** De-identification and disclosure-risk operators (SURVEY.md §2.12,
  * round 13 continuation — E297–E298).
  *
  * The reference system's entire reason to exist is sharing clinical
  * aggregates WITHOUT sharing patients: its Phase-1 files are
  * obfuscated counts (blur + small-cell masking, F5/E26) and its SQL
  * carries the masking constants inline. This module adds the two
  * disclosure controls that sit UPSTREAM of count obfuscation in a
  * real release pipeline:
  *
  *  - the k-anonymity / l-diversity AUDIT that decides whether a
  *    quasi-identifier cut is releasable at all, and
  *  - per-subject deterministic DATE SHIFTING, the standard HIPAA
  *    safe-harbor companion (shift every subject's timeline by a
  *    subject-keyed offset so absolute dates are destroyed but every
  *    within-subject interval — the thing the analyses consume — is
  *    preserved bit-exactly).
  *
  * Both are plain one-shuffle aggregations/projections: nothing here
  * needs state beyond a hash agg, so the 100 TB story is the same as
  * every other agg row (partial aggregation map-side, one exchange on
  * the grouping key).
  */
object Privacy {

  /** E297: **k-anonymity / l-diversity audit** — the releasability
    * gate run before any row-level extract leaves the enclave: group
    * subjects by the quasi-identifier cut (nation × market segment ×
    * balance sign — deliberately one attribute finer than the E26
    * demographics cut so small cells actually occur at fixture
    * scale), and per equivalence class report k (distinct subjects)
    * and l (distinct values of the sensitive attribute, here the
    * priority of the subject's orders). A class is at risk when
    * k < 10 (the reference's own masking threshold, FIXTURES.md §2)
    * or l < 2 (everyone in the class shares the sensitive value, so
    * membership alone discloses it). Two global columns repeat the
    * release decision per row — min k over the cut and the fraction
    * of subjects in at-risk classes — computed by one empty-frame
    * window over the ≤250-row class table (driver-scale, NOT a data
    * shuffle). One broadcast dim join + two hash aggs; at 100 TB the
    * only exchange is on the class key. */
  val qKAnonymity = Q("q_k_anonymity",
    (spark, sfDir) => {
      import spark.implicits._
      val cust = Tables.read(spark, sfDir, "customer")
        .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
          ($"c_acctbal" < 0).cast("int").as("neg_bal"))
      val classes = Tables.read(spark, sfDir, "orders")
        .select($"o_custkey", $"o_orderpriority")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"c_nationkey", $"c_mktsegment", $"neg_bal")
        .agg(countDistinct($"o_custkey").as("k"),
          countDistinct($"o_orderpriority").as("l"))
        .withColumn("at_risk", $"k" < 10 || $"l" < 2)
      val w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      classes.select(
          $"c_nationkey".as("nation_key"),
          $"c_mktsegment".as("segment"),
          $"neg_bal", $"k", $"l", $"at_risk",
          min($"k").over(w).as("min_k_overall"),
          round(sum(when($"at_risk", $"k").otherwise(0L)).over(w)
            .cast("double") / sum($"k").over(w), 6)
            .as("frac_subjects_at_risk"))
        .orderBy($"nation_key", $"segment", $"neg_bal")
    },
    Some("""WITH classes AS (
           |  SELECT c_nationkey AS nation_key,
           |         c_mktsegment AS segment,
           |         CAST(c_acctbal < 0 AS INT) AS neg_bal,
           |         count(DISTINCT o_custkey) AS k,
           |         count(DISTINCT o_orderpriority) AS l
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  GROUP BY 1, 2, 3
           |), flagged AS (
           |  SELECT *, (k < 10 OR l < 2) AS at_risk FROM classes
           |)
           |SELECT nation_key, segment, neg_bal, k, l, at_risk,
           |  min(k) OVER () AS min_k_overall,
           |  round(CAST(sum(CASE WHEN at_risk THEN k ELSE 0 END)
           |      OVER () AS DOUBLE) / sum(k) OVER (), 6)
           |    AS frac_subjects_at_risk
           |FROM flagged
           |ORDER BY nation_key, segment, neg_bal""".stripMargin))

  /** E298: **deterministic per-subject date shifting** — the HIPAA
    * de-identification move the reference's host platform (i2b2)
    * applies at export: every subject's entire timeline moves by a
    * subject-keyed offset in [−30, +30] days, so absolute dates (a
    * re-identification vector when combined with public events) are
    * destroyed while every within-subject interval is preserved
    * exactly. The offset is the F5 Knuth multiplicative hash of the
    * subject key — plain integer ops both engines compute
    * identically, and (unlike RAND-based shifting) stable under task
    * retry and across incremental re-exports, which is what makes
    * longitudinal joins against earlier extracts possible. The output
    * proves the invariant it exists for: per subject, the original
    * and shifted span-in-days side by side (equal by construction —
    * the oracle recomputes both from raw timestamps, so a drifting
    * shift would hash-fail), plus the shifted endpoints a downstream
    * consumer would receive. One hash agg on the subject key; the
    * shift itself is a zero-shuffle projection. */
  val qDateShift = Q("q_date_shift",
    (spark, sfDir) => {
      import spark.implicits._
      val shift = ($"user_id" * 2654435761L % 2147483648L % 61 - 30)
        .cast("int")
      Tables.read(spark, sfDir, "events")
        .select($"user_id", to_date($"ts").as("d"),
          shift.as("shift_days"))
        .groupBy($"user_id", $"shift_days")
        .agg(count(lit(1)).as("n_events"),
          datediff(max($"d"), min($"d")).as("span_orig_days"),
          datediff(date_add(max($"d"), $"shift_days"),
            date_add(min($"d"), $"shift_days"))
            .as("span_shifted_days"),
          date_add(min($"d"), $"shift_days").as("first_shifted"),
          date_add(max($"d"), $"shift_days").as("last_shifted"))
        .orderBy($"user_id")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(ts AS DATE) AS d,
           |    CAST(user_id * 2654435761 % 2147483648 % 61 - 30
           |      AS INT) AS shift_days
           |  FROM events
           |)
           |SELECT user_id, shift_days,
           |  count(*) AS n_events,
           |  date_diff('day', min(d), max(d)) AS span_orig_days,
           |  date_diff('day', min(d) + shift_days,
           |    max(d) + shift_days) AS span_shifted_days,
           |  min(d) + shift_days AS first_shifted,
           |  max(d) + shift_days AS last_shifted
           |FROM ev
           |GROUP BY user_id, shift_days
           |ORDER BY user_id""".stripMargin))

  /** E300: **Fellegi–Sunter probabilistic record linkage** — the
    * decision-theoretic core of every privacy-preserving matching
    * pipeline (and of dedup across registries, the i2b2 multi-site
    * patient-linkage problem). Two files (customers as file A,
    * suppliers as file B) are compared on discrete fields; each
    * candidate pair reduces to an AGREEMENT PATTERN, and the
    * pattern's log2(m/u) weight decides link / possible / non-link.
    *
    * The scale architecture is the textbook one: (1) BLOCKING — the
    * candidate generator is an equi-join on nation key, never the
    * A×B cross product, so pair count is Σ_block |A_b|·|B_b|, not
    * N1·N2; (2) u-probabilities estimated from DATA, not assumed —
    * per-field value-frequency tables (2 and 10 rows) joined A-side
    * to B-side and reduced to Σ_v p_A(v)·p_B(v), the exact
    * random-agreement probability; (3) the resulting 1-row
    * (N1, N2, u_sign, u_digit) stats frame is CROSSED into the ≤4
    * pattern rows — a broadcast of one row, the allowlisted shape,
    * never a data-sized nested-loop. m-probabilities are the
    * standard fixed initialization (0.98 / 0.95); EM refinement
    * would iterate exactly this pattern-count table, which is why
    * the pattern table (not per-pair scores) is the output grain.
    * Per pattern: pair count, the data-estimated random-agreement
    * probability, the expected count under the non-match hypothesis
    * (u_pattern × total candidate pairs), the Fellegi–Sunter log2
    * composite weight, and the three-way decision at ±1. One
    * blocked join + one tiny hash agg; at 100 TB the only exchange
    * is the block key (and B broadcasts when it is dimension-sized,
    * as here). */
  val qLinkFellegi = Q("q_link_fellegi",
    (spark, sfDir) => {
      import spark.implicits._
      def fields(df: org.apache.spark.sql.DataFrame, key: String,
          nat: String, bal: String, side: String) =
        df.select(col(key).as(s"${side}_id"),
          col(nat).as(s"${side}_nat"),
          (col(bal) >= 0).cast("int").as(s"${side}_sign"),
          pmod(floor(abs(col(bal))).cast("long"), lit(10L))
            .cast("int").as(s"${side}_digit"))
      val a = fields(Tables.read(spark, sfDir, "customer"),
        "c_custkey", "c_nationkey", "c_acctbal", "a")
      val b = fields(Tables.read(spark, sfDir, "supplier"),
        "s_suppkey", "s_nationkey", "s_acctbal", "b")
      // per-field u = sum_v pA(v) * pB(v), from tiny frequency
      // tables (2 and 10 values). The two file counts are dimension
      // metadata (1500 / 100 rows at sf0.01) — a driver-side count
      // is the honest plan, not a hidden data-sized collect.
      val n1 = a.count()
      val n2 = b.count()
      val uSign = a.groupBy($"a_sign".as("v")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy($"b_sign".as("v")).agg(count(lit(1)).as("cb")), "v")
        .agg((sum($"ca" * $"cb").cast("double") / (n1.toDouble * n2))
          .as("u_sign"))
      val uDigit = a.groupBy($"a_digit".as("v")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy($"b_digit".as("v")).agg(count(lit(1)).as("cb")), "v")
        .agg((sum($"ca" * $"cb").cast("double") / (n1.toDouble * n2))
          .as("u_digit"))
      val stats = uSign.crossJoin(uDigit) // 1 row x 1 row
      val mS = 0.98; val mD = 0.95
      val patterns = a.join(b, $"a_nat" === $"b_nat") // blocked candidates
        .select(($"a_sign" === $"b_sign").cast("int").as("agree_sign"),
          ($"a_digit" === $"b_digit").cast("int").as("agree_digit"))
        .groupBy($"agree_sign", $"agree_digit")
        .agg(count(lit(1)).as("n_pairs"))
      patterns.crossJoin(broadcast(stats))
        .select($"agree_sign", $"agree_digit", $"n_pairs",
          round(when($"agree_sign" === 1, $"u_sign")
            .otherwise(lit(1.0) - $"u_sign") *
            when($"agree_digit" === 1, $"u_digit")
              .otherwise(lit(1.0) - $"u_digit"), 6).as("u_pattern"),
          round((when($"agree_sign" === 1, log2(lit(mS) / $"u_sign"))
            .otherwise(log2(lit(1 - mS) / (lit(1.0) - $"u_sign")))) +
            (when($"agree_digit" === 1, log2(lit(mD) / $"u_digit"))
              .otherwise(log2(lit(1 - mD) / (lit(1.0) - $"u_digit")))), 4)
            .as("weight_log2"),
          sum($"n_pairs").over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
            .as("total_pairs"))
        .withColumn("decision",
          when($"weight_log2" > 1.0, "link")
            .when($"weight_log2" < -1.0, "non-link")
            .otherwise("possible"))
        .orderBy($"agree_sign", $"agree_digit")
    },
    Some("""WITH a AS (
           |  SELECT c_custkey AS a_id, c_nationkey AS a_nat,
           |    CAST(c_acctbal >= 0 AS INT) AS a_sign,
           |    CAST(CAST(floor(abs(c_acctbal)) AS BIGINT) % 10
           |      AS INT) AS a_digit
           |  FROM customer
           |), b AS (
           |  SELECT s_suppkey AS b_id, s_nationkey AS b_nat,
           |    CAST(s_acctbal >= 0 AS INT) AS b_sign,
           |    CAST(CAST(floor(abs(s_acctbal)) AS BIGINT) % 10
           |      AS INT) AS b_digit
           |  FROM supplier
           |), n AS (
           |  SELECT (SELECT count(*) FROM a) AS n1,
           |         (SELECT count(*) FROM b) AS n2
           |), us AS (
           |  SELECT CAST(sum(ca * cb) AS DOUBLE) /
           |      ((SELECT n1 FROM n) * (SELECT n2 FROM n)) AS u_sign
           |  FROM (SELECT a_sign AS v, count(*) AS ca FROM a GROUP BY 1) fa
           |  JOIN (SELECT b_sign AS v, count(*) AS cb FROM b GROUP BY 1) fb
           |    USING (v)
           |), ud AS (
           |  SELECT CAST(sum(ca * cb) AS DOUBLE) /
           |      ((SELECT n1 FROM n) * (SELECT n2 FROM n)) AS u_digit
           |  FROM (SELECT a_digit AS v, count(*) AS ca FROM a GROUP BY 1) fa
           |  JOIN (SELECT b_digit AS v, count(*) AS cb FROM b GROUP BY 1) fb
           |    USING (v)
           |), patterns AS (
           |  SELECT CAST(a_sign = b_sign AS INT) AS agree_sign,
           |         CAST(a_digit = b_digit AS INT) AS agree_digit,
           |         count(*) AS n_pairs
           |  FROM a JOIN b ON a_nat = b_nat
           |  GROUP BY 1, 2
           |)
           |SELECT agree_sign, agree_digit, n_pairs,
           |  round((CASE WHEN agree_sign = 1 THEN u_sign
           |      ELSE 1.0 - u_sign END) *
           |    (CASE WHEN agree_digit = 1 THEN u_digit
           |      ELSE 1.0 - u_digit END), 6) AS u_pattern,
           |  round((CASE WHEN agree_sign = 1 THEN log2(0.98 / u_sign)
           |      ELSE log2(0.02 / (1.0 - u_sign)) END) +
           |    (CASE WHEN agree_digit = 1 THEN log2(0.95 / u_digit)
           |      ELSE log2(0.05 / (1.0 - u_digit)) END), 4)
           |    AS weight_log2,
           |  sum(n_pairs) OVER () AS total_pairs,
           |  CASE WHEN round((CASE WHEN agree_sign = 1
           |        THEN log2(0.98 / u_sign)
           |        ELSE log2(0.02 / (1.0 - u_sign)) END) +
           |      (CASE WHEN agree_digit = 1 THEN log2(0.95 / u_digit)
           |        ELSE log2(0.05 / (1.0 - u_digit)) END), 4) > 1.0
           |      THEN 'link'
           |    WHEN round((CASE WHEN agree_sign = 1
           |        THEN log2(0.98 / u_sign)
           |        ELSE log2(0.02 / (1.0 - u_sign)) END) +
           |      (CASE WHEN agree_digit = 1 THEN log2(0.95 / u_digit)
           |        ELSE log2(0.05 / (1.0 - u_digit)) END), 4) < -1.0
           |      THEN 'non-link'
           |    ELSE 'possible' END AS decision
           |FROM patterns, us, ud
           |ORDER BY agree_sign, agree_digit""".stripMargin))

  val all: Seq[Q] = Seq(qKAnonymity, qDateShift, qLinkFellegi)
}
