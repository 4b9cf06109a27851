package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function breadth (SURVEY.md §2.8): date arithmetic, string ops
  * (the ICD 3-char-rollup family), math, conditional/null handling, JSON
  * and array higher-order functions. All built-in `functions._` — every
  * expression stays inside WholeStageCodegen (no UDFs in these paths).
  */
object Scalars {

  /** F1: date arithmetic — datediff/date_add/date_trunc, the reference's
    * days_since_admission computations. */
  val qScalarDate = Q("q_scalar_date",
    (spark, sfDir) => {
      import spark.implicits._
      val o = Tables.read(spark, sfDir, "orders")
      val l = Tables.read(spark, sfDir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(
          datediff($"l_shipdate", $"o_orderdate").as("ship_delay_days"),
          to_date(date_trunc("month", $"o_orderdate")).as("order_month"))
        .groupBy($"order_month", $"ship_delay_days")
        .agg(count(lit(1)).as("n"))
        .orderBy($"order_month", $"ship_delay_days")
    },
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
           |         AS order_month,
           |       date_diff('day', CAST(o_orderdate AS DATE),
           |         CAST(l_shipdate AS DATE)) AS ship_delay_days,
           |       count(*) AS n
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY 1, 2 ORDER BY order_month, ship_delay_days"""
      .stripMargin))

  /** F2: string functions — the LEFT(concept_cd,3) rollup, REPLACE,
    * UPPER, concat, split-part. */
  val qScalarString = Q("q_scalar_string",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "part")
        .select(
          $"p_partkey",
          substring($"p_name", 1, 3).as("name3"),
          upper($"p_brand").as("brand_upper"),
          regexp_replace($"p_brand", "Brand#", "B").as("brand_short"),
          element_at(split($"p_type", " "), 1).as("type_head"),
          concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
          length($"p_name").as("name_len"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |       substring(p_name, 1, 3) AS name3,
           |       upper(p_brand) AS brand_upper,
           |       replace(p_brand, 'Brand#', 'B') AS brand_short,
           |       split_part(p_type, ' ', 1) AS type_head,
           |       concat_ws('/', p_brand, p_type) AS brand_type,
           |       length(p_name) AS name_len
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** F3: math functions — log/exp/round/abs/floor/sqrt + scale-factor
    * multiply (the reference's units normalization). */
  val qScalarMath = Q("q_scalar_math",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "supplier")
        .select(
          $"s_suppkey",
          round(log($"s_acctbal" + 10000.0), 6).as("log_bal"),
          round(sqrt(abs($"s_acctbal")), 6).as("sqrt_abs_bal"),
          floor($"s_acctbal" / 100).cast("long").as("bal_bucket"),
          round($"s_acctbal" * 1.1, 6).as("scaled_bal"),
          round(pow($"s_acctbal" / 1000.0, 2), 6).as("bal_sq"))
        .orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey,
           |       round(ln(s_acctbal + 10000.0), 6) AS log_bal,
           |       round(sqrt(abs(s_acctbal)), 6) AS sqrt_abs_bal,
           |       CAST(floor(s_acctbal / 100) AS BIGINT) AS bal_bucket,
           |       round(s_acctbal * 1.1, 6) AS scaled_bal,
           |       round(pow(s_acctbal / 1000.0, 2), 6) AS bal_sq
           |FROM supplier ORDER BY s_suppkey""".stripMargin))

  /** F4: conditional / null handling — CASE buckets (the age-group
    * pattern), coalesce, nullif. */
  val qScalarCase = Q("q_scalar_case",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "customer")
        .select(
          $"c_custkey",
          when($"c_acctbal" < 0, "negative")
            .when($"c_acctbal" < 1000, "low")
            .when($"c_acctbal" < 5000, "mid")
            .otherwise("high").as("bal_bucket"),
          coalesce(nullif($"c_mktsegment", lit("MACHINERY")),
            lit("OTHER")).as("segment_masked"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey,
           |  CASE WHEN c_acctbal < 0 THEN 'negative'
           |       WHEN c_acctbal < 1000 THEN 'low'
           |       WHEN c_acctbal < 5000 THEN 'mid'
           |       ELSE 'high' END AS bal_bucket,
           |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER')
           |    AS segment_masked
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** F7: JSON extraction from the events props column (extension —
    * the reference's EAV model has no JSON, harness events do). */
  val qScalarJson = Q("q_scalar_json",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .select($"event_id",
          get_json_object($"props", "$.k").cast("long").as("k_val"))
        .filter($"k_val".isNotNull)
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |       CAST(json_extract_string(props, '$.k') AS BIGINT)
           |         AS k_val
           |FROM events
           |WHERE json_extract_string(props, '$.k') IS NOT NULL
           |ORDER BY event_id""".stripMargin))

  /** F8: array higher-order functions over the embedding column —
    * aggregate (fold) for the L2 norm², transform+filter for counting.
    * Pure codegen'd HOFs, the scalar building blocks of X3 cosine. */
  val qArrayHof = Q("q_array_hof",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "embeddings")
        .select(
          $"vec_id",
          size($"embedding").as("dim"),
          round(aggregate($"embedding", lit(0.0d),
            (acc, x) => acc + x.cast("double") * x.cast("double")), 6)
            .as("norm_sq"),
          size(filter($"embedding", x => x > 0.0f)).as("n_positive"))
        .orderBy($"vec_id")
    },
    Some("""SELECT vec_id,
           |       len(embedding) AS dim,
           |       round(list_sum(list_transform(embedding,
           |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)
           |         AS norm_sq,
           |       len(list_filter(embedding, x -> x > 0)) AS n_positive
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  /** F8b: MAP higher-order functions — the map half of the nested-type
    * surface (qArrayHof covers arrays): per user, build a
    * type→count map from grouped entries (`map_from_entries` over a
    * SORTED collect — the deterministic-collect contract, E11),
    * transform its values (`transform_values`), drop small entries
    * (`map_filter`), and explode the survivors back to rows. DuckDB
    * has no map lambdas, so the oracle replicates the SEMANTICS
    * relationally (group → arithmetic → HAVING) and the row-level
    * hash proves the map round-trip (build→transform→filter→explode)
    * lost or altered nothing. Map ops are row-local; the only shuffle
    * is the grouped build. */
  val qMapHof = Q("q_map_hof",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("n")) // distinct keys by construction
        .groupBy($"user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct($"event_type", $"n")))).as("counts"))
        .select($"user_id", explode(
          map_filter(
            transform_values($"counts", (_, v) => v * 2L),
            (_, v) => v >= 12L)))
        .orderBy($"user_id", $"key")
    },
    Some("""SELECT user_id, event_type AS key,
           |       CAST(count(*) * 2 AS BIGINT) AS value
           |FROM events GROUP BY user_id, event_type
           |HAVING count(*) * 2 >= 12
           |ORDER BY user_id, key""".stripMargin))

  /** F2b: regex scalar family — extract / replace-all / match (the
    * reference's loyalty-code and local-code pattern munging,
    * i2b2-style `concept_cd` prefixes). Patterns stay in the
    * RE2∩Java-regex common subset (character classes, anchors, greedy
    * quantifiers — no backrefs/lookaround) so Spark's java.util.regex
    * and DuckDB's RE2 agree. DuckDB's regexp_replace needs the
    * explicit 'g' flag to match Spark's replace-ALL default. All three
    * are row-local codegen'd expressions — no shuffle, pushdown
    * unaffected. */
  val qScalarRegex = Q("q_scalar_regex",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "customer")
        .select($"c_custkey",
          regexp_extract($"c_name", "Customer#(\\d+)", 1)
            .cast("long").as("cust_id"),
          regexp_replace($"c_name", "0+", "0").as("name_squeezed"),
          $"c_name".rlike("[02468]$").as("id_even"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey,
           |       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1)
           |         AS BIGINT) AS cust_id,
           |       regexp_replace(c_name, '0+', '0', 'g')
           |         AS name_squeezed,
           |       regexp_matches(c_name, '[02468]$') AS id_even
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** F4b: ANSI-safe scalar error handling — Spark 4 runs ANSI mode by
    * default, where a bad cast or division-by-zero THROWS; `try_cast`
    * and `try_divide` are the per-expression escape hatch that returns
    * NULL instead (the dirty-data posture every 100 TB ingest needs —
    * one malformed row must not kill a 6-hour job). Both null classes
    * are non-empty at every sf (p_type never parses; p_size = 11 rows
    * make the divisor zero: 2/45/376 rows). DuckDB: TRY_CAST is 1:1;
    * try_divide is expressed as the equivalent NULLIF guard. */
  val qScalarTry = Q("q_scalar_try",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "part")
        .select($"p_partkey",
          expr("try_cast(substring(p_brand, 7) AS INT)")
            .as("brand_num"),
          expr("try_cast(p_type AS INT)").as("type_num"),
          round(expr("try_divide(p_retailprice, p_size - 11)"), 6)
            .as("price_per"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |       TRY_CAST(substring(p_brand, 7) AS INTEGER)
           |         AS brand_num,
           |       TRY_CAST(p_type AS INTEGER) AS type_num,
           |       round(p_retailprice / NULLIF(p_size - 11, 0), 6)
           |         AS price_per
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** VARIANT semi-structured access (Spark 4) — the 100 TB upgrade
    * over F7's string-JSON scalars: `parse_json` decodes once into the
    * binary VARIANT encoding and `variant_get` does typed path access
    * without re-parsing the string per extraction (and the encoding
    * shreds into parquet in newer writers, getting columnar pruning on
    * semi-structured data). Values and grouping are identical to the
    * string-JSON path, so the oracle runs DuckDB's native JSON
    * extraction over the same rows — engine-neutral semantics, engine-
    * specific encodings. `k` is non-negative in the fixture contract
    * (props is the synthetic `{"k": 0..99}` payload), so `%` and pmod
    * agree. */
  val qScalarVariant = Q("q_scalar_variant",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .select(
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
          $"value")
        .groupBy(pmod($"k", lit(10L)).as("k_mod"))
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast("decimal(18,6)")), 6)
            .cast("double").as("sum_value"))
        .orderBy($"k_mod")
    },
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
           |         % 10 AS k_mod,
           |       count(*) AS n,
           |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin))

  /** Parameterized SQL — the injection-safe text surface (named
    * parameters, Spark 3.4+): the parameter is BOUND, not spliced, so
    * caller-supplied values can never alter query structure — the
    * contract every multi-tenant i2b2-style deployment needs when
    * thresholds/code-lists arrive from a UI. The oracle inlines the
    * same constant, so binding must be semantically identical to
    * splicing for value parameters. */
  val qSqlParams = Q("q_sql_params",
    (spark, sfDir) => {
      // per-invocation view name (the qSqlRecursive concurrency rule)
      val view = s"params_orders_${paramsRun.incrementAndGet()}"
      Tables.read(spark, sfDir, "orders")
        .createOrReplaceTempView(view)
      try {
        spark.sql(
          s"""SELECT o_orderpriority, count(*) AS n,
             |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6)
             |    AS DOUBLE) AS sum_price
             |FROM $view WHERE o_totalprice > :floor
             |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
            .stripMargin,
          Map("floor" -> 200000.0))
      } finally {
        spark.catalog.dropTempView(view)
        ()
      }
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
           |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6)
           |    AS DOUBLE) AS sum_price
           |FROM orders WHERE o_totalprice > 200000.0
           |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
      .stripMargin))

  private val paramsRun = new java.util.concurrent.atomic.AtomicLong()

  // ------------------------------------------------- edit distance
  /** Edit-distance fuzzy matching — the record-linkage scalar (typo
    * detection, near-identical field matching) the equality/regex
    * families cannot express: Levenshtein distance between each
    * document's 30-char prefix and its successor's within the same
    * source, plus the length-normalized ratio matchers actually
    * threshold on. `lead()` over the source partition pairs rows with
    * ZERO joins (one source-key shuffle); the distance itself is
    * row-local O(len²) DP — bounded by the fixed prefix, the standard
    * way to keep edit distance affordable at corpus scale (never run
    * unbounded DP on full documents; candidate-pair it with LSH first,
    * which is exactly what the dedup family does). Both engines
    * implement classic unit-cost Levenshtein, so values match
    * exactly. */
  val qScalarEditDist = Q("q_scalar_editdist",
    (spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      Tables.read(spark, sfDir, "documents")
        .select($"doc_id", $"source",
          substring($"text", 1, 30).as("p"))
        .withColumn("nextp", lead($"p", 1).over(w))
        .filter($"nextp".isNotNull)
        .select($"doc_id",
          levenshtein($"p", $"nextp").as("edit_dist"),
          round(levenshtein($"p", $"nextp") * lit(1.0) /
            greatest(length($"p"), length($"nextp")), 6)
            .as("edit_ratio"))
        .orderBy($"doc_id")
    },
    Some("""WITH p AS (
           |  SELECT doc_id, source, substr(text, 1, 30) AS p
           |  FROM documents
           |), l AS (
           |  SELECT doc_id, p,
           |         lead(p) OVER (PARTITION BY source ORDER BY doc_id)
           |           AS nextp
           |  FROM p
           |)
           |SELECT doc_id,
           |       CAST(levenshtein(p, nextp) AS INT) AS edit_dist,
           |       round(levenshtein(p, nextp) * 1.0 /
           |         greatest(length(p), length(nextp)), 6)
           |         AS edit_ratio
           |FROM l WHERE nextp IS NOT NULL
           |ORDER BY doc_id""".stripMargin))

  /** E128: **Jaro-Winkler fuzzy similarity** — the name-matching
    * complement to Levenshtein (E81: edit OPERATIONS; Jaro-Winkler:
    * positional agreement with a prefix bonus, the record-linkage
    * standard since the Census literature). Spark has no built-in, so
    * this is the (b) rung of SURVEY §4.2 done fully: a native Catalyst
    * `Expression` (functions/JaroWinkler.scala) whose `doGenCode`
    * emits a static call — the scorer stays inside whole-stage
    * codegen, where a Scala UDF would fence off the generated loop at
    * every pair. Semantics are pinned to DuckDB's
    * `jaro_winkler_similarity` (empirically verified: empty → 0.0,
    * boost only when jaro > 0.7, prefix cap 4, scale 0.1) so the
    * oracle is the real function, not a reimplementation. Same
    * bounded-prefix discipline as E81: fixed 30-char inputs keep the
    * O(l²) inner loop constant per row; at corpus scale the pair
    * generator is LSH (X2), never all-pairs. */
  val qScalarJaroWinkler = Q("q_scalar_jarowinkler",
    (spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val jw = call_function("jaro_winkler", $"p", $"nextp")
      Tables.read(spark, sfDir, "documents")
        .select($"doc_id", $"source",
          substring($"text", 1, 30).as("p"))
        .withColumn("nextp", lead($"p", 1).over(w))
        .filter($"nextp".isNotNull)
        .select($"doc_id",
          round(jw, 6).as("jw_sim"),
          (round(jw, 6) > 0.85).as("is_match"))
        .orderBy($"doc_id")
    },
    Some("""WITH p AS (
           |  SELECT doc_id, source, substr(text, 1, 30) AS p
           |  FROM documents
           |), l AS (
           |  SELECT doc_id, p,
           |         lead(p) OVER (PARTITION BY source ORDER BY doc_id)
           |           AS nextp
           |  FROM p
           |)
           |SELECT doc_id,
           |       round(jaro_winkler_similarity(p, nextp), 6) AS jw_sim,
           |       round(jaro_winkler_similarity(p, nextp), 6) > 0.85
           |         AS is_match
           |FROM l WHERE nextp IS NOT NULL
           |ORDER BY doc_id""".stripMargin))

  /** E274: **Damerau-Levenshtein fuzzy distance** — the
    * transposition-aware member of the fuzzy-matching family (E81
    * levenshtein counts a swap as TWO edits; Jaro-Winkler E128 scores
    * position agreement but is not a metric). The native expression
    * (functions/DamerauLevenshtein.scala) implements the TRUE
    * Lowrance–Wagner variant — `dl('CA','ABC') = 2`, where the common
    * "optimal string alignment" shortcut returns 3 — because that is
    * the variant DuckDB's `damerau_levenshtein` exposes, so the oracle
    * is the real function, not a reimplementation. The output keeps
    * plain levenshtein beside it: `dl ≤ lev` universally (every
    * transposition is two substitutions), and the rows where they
    * differ are exactly the transposition-dominated typo pairs the
    * function exists to catch. Same bounded-prefix discipline as
    * E81/E128: fixed 30-char inputs, pair generation by window — at
    * corpus scale the pair generator is LSH/blocking, never
    * all-pairs. */
  val qScalarDamerau = Q("q_scalar_damerau",
    (spark, sfDir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val dl = call_function("damerau_levenshtein", $"p", $"nextp")
      Tables.read(spark, sfDir, "documents")
        .select($"doc_id", $"source",
          substring($"text", 1, 30).as("p"))
        .withColumn("nextp", lead($"p", 1).over(w))
        .filter($"nextp".isNotNull)
        .select($"doc_id",
          dl.as("dl_dist"),
          levenshtein($"p", $"nextp").as("lev_dist"),
          (dl < levenshtein($"p", $"nextp"))
            .as("has_transposition_gain"))
        .orderBy($"doc_id")
    },
    Some("""WITH p AS (
           |  SELECT doc_id, source, substr(text, 1, 30) AS p
           |  FROM documents
           |), l AS (
           |  SELECT doc_id, p,
           |         lead(p) OVER (PARTITION BY source ORDER BY doc_id)
           |           AS nextp
           |  FROM p
           |)
           |SELECT doc_id,
           |       CAST(damerau_levenshtein(p, nextp) AS INT) AS dl_dist,
           |       CAST(levenshtein(p, nextp) AS INT) AS lev_dist,
           |       damerau_levenshtein(p, nextp) < levenshtein(p, nextp)
           |         AS has_transposition_gain
           |FROM l WHERE nextp IS NOT NULL
           |ORDER BY doc_id""".stripMargin))

  /** E159: **optimizer-injected similarity prefilter** — the
    * demonstration row for [[graft.plans.EditDistPrefilter]]: a
    * plain fuzzy-search filter `levenshtein(name, probe) <= 2`
    * written the naive way; the injected optimizer rule adds the
    * implied `abs(length(a) − length(b)) <= 2` conjunct (edit
    * distance is bounded below by length difference), so rows whose
    * lengths already disagree never reach the O(n·m) DP. The rule is
    * semantics-preserving, so the oracle runs the ORIGINAL predicate
    * — any rewrite bug breaks the hash; PlanSuite locks the injected
    * conjunct's presence and the rule's fixpoint idempotence. At
    * 100 TB this is the difference between DP on every row and DP on
    * the length-compatible sliver — for free, for every query in the
    * session. */
  val qRuleEditdistPrefilter = Q("q_rule_editdist_prefilter",
    (spark, sfDir) => {
      import spark.implicits._
      val probe = "Customer#000000042"
      Tables.read(spark, sfDir, "customer")
        .filter(levenshtein($"c_name", lit(probe)) <= 2)
        .select($"c_custkey", $"c_name",
          levenshtein($"c_name", lit(probe)).as("dist"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name,
           |       CAST(levenshtein(c_name, 'Customer#000000042')
           |         AS INT) AS dist
           |FROM customer
           |WHERE levenshtein(c_name, 'Customer#000000042') <= 2
           |ORDER BY c_custkey""".stripMargin))

  /** E270: **date-format pattern parity** — rendering timestamps to
    * strings is where every migration leaks: Spark speaks Java
    * SimpleDateFormat-ish patterns ('yyyy-MM-dd', 'EEEE', 'DDD'),
    * the SQL world speaks C strftime ('%Y-%m-%d', '%A', '%j') — two
    * pattern LANGUAGES that must land on byte-identical strings.
    * This row pins the safe translatable subset: the ISO minute
    * stamp, the English day name (both engines' default locale),
    * the zero-padded 3-digit day-of-year, and the month
    * abbreviation. Deliberately NOT pinned: week-of-year ('ww' vs
    * '%W' — three incompatible conventions, the E238 lesson says use
    * Monday-date arithmetic instead) and any locale-sensitive
    * output beyond default-English. Row-local projection; bounded
    * deterministic export. */
  val qScalarDatefmt = Q("q_scalar_datefmt",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "events")
        .select($"event_id", $"ts")
        .orderBy($"event_id").limit(50)
        .select($"event_id",
          date_format($"ts", "yyyy-MM-dd HH:mm").as("iso_minute"),
          date_format($"ts", "EEEE").as("day_name"),
          date_format($"ts", "DDD").as("day_of_year"),
          date_format($"ts", "MMM").as("month_abbrev"))
    },
    Some("""SELECT event_id,
           |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M')
           |    AS iso_minute,
           |  strftime(CAST(ts AS TIMESTAMP), '%A') AS day_name,
           |  strftime(CAST(ts AS TIMESTAMP), '%j') AS day_of_year,
           |  strftime(CAST(ts AS TIMESTAMP), '%b') AS month_abbrev
           |FROM events ORDER BY event_id LIMIT 50""".stripMargin))

  /** E293: **calendar-interval arithmetic** — the month-addition
    * CLAMPING semantics every billing system trips over: Jan 31 + 1
    * month must be Feb 28/29, not Mar 2/3. Spark's `add_months` and
    * DuckDB's `+ INTERVAL 1 MONTH` both clamp to month end — pinned
    * here side by side with `last_day` and day-time interval addition
    * on the timestamp axis (+90 minutes), the three interval classes
    * (year-month clamped, month-end anchor, exact day-time) that
    * date_add/datediff rows (F1, E203) don't touch. The `clamped`
    * flag marks exactly the order dates where naive +30-days logic
    * would diverge — the fixture's month-end orders exercise it. Pure
    * projection, no shuffle beyond the output sort. */
  val qScalarInterval = Q("q_scalar_interval",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .select($"o_orderkey",
          add_months(to_date($"o_orderdate"), 1).as("plus_month"),
          last_day(to_date($"o_orderdate")).as("month_end"),
          ($"o_orderdate" + expr("INTERVAL 90 MINUTES"))
            .as("plus_90min"),
          (dayofmonth(to_date($"o_orderdate")) =!=
            dayofmonth(add_months(to_date($"o_orderdate"), 1)))
            .as("clamped"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH
           |    AS DATE) AS plus_month,
           |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
           |  CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 MINUTE
           |    AS plus_90min,
           |  day(CAST(o_orderdate AS DATE)) <>
           |    day(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH
           |      AS DATE)) AS clamped
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** E322: **URL parsing scalars** — `parse_url`'s component
    * extraction (HOST / PATH / QUERY / REF and the two-argument
    * query-parameter form), the scalar family every clickstream/log
    * pipeline leans on and the dedup-by-canonical-URL step needs.
    * The fixture carries no URL column, so URLs are BUILT
    * deterministically from document attributes (host from source,
    * path from doc id, query from lang) — the parse must invert the
    * construction exactly, and the oracle does the inversion with
    * plain string/regexp functions (DuckDB has no parse_url), so the
    * two engines cross-check each other's parsers. Adds the
    * canonical-URL projection (scheme+host+path, query and fragment
    * stripped, the dedup key) per row. Zero shuffles beyond the
    * ORDER BY. */
  val qScalarUrl = Q("q_scalar_url",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "documents")
        .select($"doc_id",
          concat(lit("https://"), $"source", lit(".example.com/docs/"),
            $"doc_id", lit("?lang="), $"lang", lit("&v=2#sec"),
            ($"doc_id" % 5)).as("url"))
        .select($"doc_id", $"url",
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'REF')").as("fragment"),
          expr("parse_url(url, 'QUERY', 'lang')").as("lang_param"),
          concat(lit("https://"),
            expr("parse_url(url, 'HOST')"),
            expr("parse_url(url, 'PATH')")).as("canonical_url"))
        .orderBy($"doc_id")
    },
    Some("""WITH u AS (
           |  SELECT doc_id,
           |    'https://' || source || '.example.com/docs/' ||
           |      doc_id || '?lang=' || lang || '&v=2#sec' ||
           |      (doc_id % 5) AS url
           |  FROM documents
           |)
           |SELECT doc_id, url,
           |  regexp_extract(url, 'https://([^/]+)', 1) AS host,
           |  regexp_extract(url, 'https://[^/]+(/[^?#]*)', 1) AS path,
           |  regexp_extract(url, '\?([^#]*)', 1) AS query,
           |  regexp_extract(url, '#(.*)$', 1) AS fragment,
           |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           |  'https://' || regexp_extract(url, 'https://([^/]+)', 1) ||
           |    regexp_extract(url, 'https://[^/]+(/[^?#]*)', 1)
           |    AS canonical_url
           |FROM u ORDER BY doc_id""".stripMargin))

  val all: Seq[Q] = Seq(qScalarDate, qScalarString, qScalarMath,
    qScalarCase, qScalarJson, qScalarVariant, qArrayHof, qScalarRegex,
    qScalarTry, qSqlParams, qScalarEditDist, qMapHof,
    qScalarJaroWinkler, qRuleEditdistPrefilter, qScalarDatefmt,
    qScalarDamerau, qScalarInterval, qScalarUrl)
}
