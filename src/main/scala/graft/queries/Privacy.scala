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

  /** E303: **k-anonymity generalization ladder** — the step AFTER
    * the E297 audit flags a cut as unreleasable: instead of masking
    * whole cells, generalize the quasi-identifier just enough that
    * every released class reaches k ≥ 10. The ladder is fixed and
    * documented (level 0 = nation × segment × $1000 balance band,
    * 1 = nation × segment × balance sign, 2 = nation × segment,
    * 3 = segment only), and each level-0 class is released at the
    * FINEST level that clears the threshold — the minimal-information-
    * loss rule from the k-anonymity literature, restricted to a fixed
    * ladder so the search is four hash aggregations instead of a
    * lattice walk. The sign at level 1 derives from the level-0 band
    * (band < 0 ⇔ balance < 0 under floor division), so the ladder
    * nests exactly. All four class tables are dimension-bounded
    * (≤ |nations|×|segments|×bands); the joins that stitch them are
    * broadcasts. At 100 TB the shape is unchanged: four map-side-
    * combined aggs over the subject table, then dimension joins. */
  val qKGeneralize = Q("q_k_generalize",
    (spark, sfDir) => {
      import spark.implicits._
      val base = Tables.read(spark, sfDir, "customer")
        .select($"c_nationkey".as("nat"), $"c_mktsegment".as("seg"),
          floor($"c_acctbal" / 1000).cast("long").as("band"))
      val k0 = base.groupBy($"nat", $"seg", $"band")
        .agg(count(lit(1)).as("k0"))
      val k1 = base.groupBy($"nat", $"seg",
          ($"band" < 0).cast("int").as("neg"))
        .agg(count(lit(1)).as("k1"))
      val k2 = base.groupBy($"nat", $"seg").agg(count(lit(1)).as("k2"))
      val k3 = base.groupBy($"seg").agg(count(lit(1)).as("k3"))
      k0.withColumn("neg", ($"band" < 0).cast("int"))
        .join(broadcast(k1), Seq("nat", "seg", "neg"))
        .join(broadcast(k2), Seq("nat", "seg"))
        .join(broadcast(k3), Seq("seg"))
        .select($"nat".as("nation_key"), $"seg".as("segment"),
          $"band".as("bal_band"), $"k0", $"k1", $"k2", $"k3",
          when($"k0" >= 10, 0).when($"k1" >= 10, 1)
            .when($"k2" >= 10, 2).otherwise(3).as("release_level"),
          when($"k0" >= 10, $"k0").when($"k1" >= 10, $"k1")
            .when($"k2" >= 10, $"k2").otherwise($"k3")
            .as("k_released"))
        .orderBy($"nation_key", $"segment", $"bal_band")
    },
    Some("""WITH base AS (
           |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
           |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
           |  FROM customer
           |), k0 AS (
           |  SELECT nat, seg, band, count(*) AS k0
           |  FROM base GROUP BY 1, 2, 3
           |), k1 AS (
           |  SELECT nat, seg, CAST(band < 0 AS INT) AS neg,
           |    count(*) AS k1
           |  FROM base GROUP BY 1, 2, 3
           |), k2 AS (
           |  SELECT nat, seg, count(*) AS k2 FROM base GROUP BY 1, 2
           |), k3 AS (
           |  SELECT seg, count(*) AS k3 FROM base GROUP BY 1
           |)
           |SELECT k0.nat AS nation_key, k0.seg AS segment,
           |  k0.band AS bal_band, k0, k1, k2, k3,
           |  CASE WHEN k0 >= 10 THEN 0 WHEN k1 >= 10 THEN 1
           |    WHEN k2 >= 10 THEN 2 ELSE 3 END AS release_level,
           |  CASE WHEN k0 >= 10 THEN k0 WHEN k1 >= 10 THEN k1
           |    WHEN k2 >= 10 THEN k2 ELSE k3 END AS k_released
           |FROM k0
           |JOIN k1 ON k1.nat = k0.nat AND k1.seg = k0.seg
           |  AND k1.neg = CAST(k0.band < 0 AS INT)
           |JOIN k2 ON k2.nat = k0.nat AND k2.seg = k0.seg
           |JOIN k3 ON k3.seg = k0.seg
           |ORDER BY nation_key, segment, bal_band""".stripMargin))

  /** E304: **Laplace-mechanism count release** — the differential-
    * privacy counterpart of the reference's blur-and-mask (F5):
    * released count = true count + Laplace(Δ/ε) noise, Δ = 1
    * (one subject moves one cell), ε = 0.5. The noise draw uses the
    * INVERSE-CDF transform −b·sign(u)·ln(1−2|u|) on u ∈ (−½, ½)
    * derived from a class-keyed Knuth multiplicative hash — the F5/
    * E298 determinism discipline: this pins the MECHANISM's plumbing
    * (sensitivity, scale, inverse-CDF, post-processing clamp) under
    * the oracle gate, which a true-random draw never could. The
    * scaladoc is explicit that a production release swaps the hash
    * for a CSPRNG draw per cell — determinism is the test harness's
    * property, not the privacy claim's. The class seed mixes nation
    * key and the segment's first character (the five fixture
    * segments differ in initial — documented fixture coupling, same
    * class as FIXTURES.md §2's masking threshold). Zero-shuffle
    * beyond one hash agg on the class key; the noise is a row-local
    * projection. */
  val qDpCounts = Q("q_dp_counts",
    (spark, sfDir) => {
      import spark.implicits._
      val counts = Tables.read(spark, sfDir, "customer")
        .groupBy($"c_nationkey".as("nation_key"),
          $"c_mktsegment".as("segment"))
        .agg(count(lit(1)).as("true_count"))
      val seed = $"nation_key" * 256 + ascii(substring($"segment", 1, 1))
      val u0 = (seed * 2654435761L % 2147483648L).cast("double") /
        lit(2147483648.0)
      counts
        .withColumn("u", u0 - 0.5)
        .withColumn("noise",
          round(lit(-2.0) * signum($"u") * log(lit(1.0) -
            lit(2.0) * abs($"u")), 4))
        .select($"nation_key", $"segment", $"true_count",
          $"noise".as("laplace_noise"),
          greatest(lit(0L),
            round($"true_count" + $"noise", 0).cast("long"))
            .as("released_count"))
        .orderBy($"nation_key", $"segment")
    },
    Some("""WITH counts AS (
           |  SELECT c_nationkey AS nation_key,
           |    c_mktsegment AS segment, count(*) AS true_count
           |  FROM customer GROUP BY 1, 2
           |), seeded AS (
           |  SELECT nation_key, segment, true_count,
           |    CAST((nation_key * 256 + ascii(substr(segment, 1, 1)))
           |        * 2654435761 % 2147483648 AS DOUBLE)
           |      / 2147483648.0 - 0.5 AS u
           |  FROM counts
           |), noised AS (
           |  SELECT nation_key, segment, true_count,
           |    round(-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 4)
           |      AS laplace_noise
           |  FROM seeded
           |)
           |SELECT nation_key, segment,
           |  CAST(true_count AS BIGINT) AS true_count, laplace_noise,
           |  greatest(0, CAST(round(true_count + laplace_noise, 0)
           |    AS BIGINT)) AS released_count
           |FROM noised
           |ORDER BY nation_key, segment""".stripMargin))

  val all: Seq[Q] =
    Seq(qKAnonymity, qDateShift, qKGeneralize, qDpCounts)
}
