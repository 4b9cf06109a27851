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

  val all: Seq[Q] = Seq(qKAnonymity, qDateShift)
}
