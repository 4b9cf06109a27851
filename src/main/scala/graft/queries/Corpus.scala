package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-analytics operators added in rounds 12–13 (SURVEY.md §2.12
  * E212–E215, E221, E223, E229; round 13's E251, E265–E266) — the
  * collocation / novelty / consistent-sampling /
  * embedding-geometry layer on top of the LLMOps text family
  * (tokenize E X5, TF-IDF E37, BM25 E74, quality E65/E131, dedup
  * E X1–X2/E172).
  */
object Corpus {

  private def toks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, sfDir, "documents")
      .select($"doc_id", split(trim($"text"), " ").as("toks"))
  }

  /** E212: **pointwise mutual information collocations** — which token
    * pairs co-occur in the same document more than independence
    * predicts: PMI = log2(c_xy·N / (c_x·c_y)), the classic
    * collocation/phrase-mining signal. Counts stay exact integers
    * (per-doc DISTINCT tokens, self-joined on doc_id with t1<t2 so
    * each unordered pair counts once); document frequencies join back
    * over the ≤vocab-sized frame, and the corpus size N crosses in as
    * the usual 1-row broadcast. The support-≥5 filter is the same
    * sparsity guard as the graph module's min-support edges (E192) —
    * the dense pair explosion dies at the first aggregation. Log
    * terms are double, rounded 6dp at the edge. */
  val qPmiCooccur = Q("q_pmi_cooccur",
    (spark, sfDir) => {
      import spark.implicits._
      val dt = toks(spark, sfDir)
        .select($"doc_id", explode(array_distinct($"toks")).as("tok"))
      val pairs = dt.as("a")
        .join(dt.as("b"),
          $"a.doc_id" === $"b.doc_id" && $"a.tok" < $"b.tok")
        .groupBy($"a.tok".as("t1"), $"b.tok".as("t2"))
        .agg(count(lit(1)).as("c_xy"))
        .filter($"c_xy" >= 5)
      val df = dt.groupBy($"tok").agg(count(lit(1)).as("c"))
      val n = Tables.read(spark, sfDir, "documents")
        .agg(count(lit(1)).as("n_docs"))
      pairs
        .join(broadcast(df.select($"tok".as("t1"), $"c".as("c1"))),
          Seq("t1"))
        .join(broadcast(df.select($"tok".as("t2"), $"c".as("c2"))),
          Seq("t2"))
        .crossJoin(broadcast(n))
        .select($"t1", $"t2", $"c_xy",
          round(log2($"c_xy".cast("double") * $"n_docs".cast("double") /
            ($"c1".cast("double") * $"c2".cast("double"))), 6)
            .as("pmi"))
        .orderBy($"t1", $"t2")
    },
    Some("""WITH dt AS (
           |  SELECT doc_id,
           |    unnest(list_distinct(string_split(trim(text), ' ')))
           |      AS tok
           |  FROM documents
           |), pairs AS (
           |  SELECT a.tok AS t1, b.tok AS t2, count(*) AS c_xy
           |  FROM dt a JOIN dt b
           |    ON a.doc_id = b.doc_id AND a.tok < b.tok
           |  GROUP BY 1, 2 HAVING count(*) >= 5
           |), df AS (
           |  SELECT tok, count(*) AS c FROM dt GROUP BY tok
           |), n AS (SELECT count(*) AS n_docs FROM documents)
           |SELECT p.t1, p.t2, p.c_xy,
           |  round(log2(CAST(p.c_xy AS DOUBLE) *
           |    CAST(n.n_docs AS DOUBLE) /
           |    (CAST(d1.c AS DOUBLE) * CAST(d2.c AS DOUBLE))), 6)
           |    AS pmi
           |FROM pairs p
           |JOIN df d1 ON p.t1 = d1.tok
           |JOIN df d2 ON p.t2 = d2.tok
           |CROSS JOIN n
           |ORDER BY t1, t2""".stripMargin))

  /** E213: **bigram novelty curve** — per document, what fraction of
    * its distinct bigrams appear here FIRST (no earlier doc_id has
    * them): the marginal-novelty signal dedup pipelines read to decide
    * when a source is mined out, and the document-level complement of
    * the corpus dup-rate telemetry (E190). Bigrams form row-locally
    * (lead over token position — the same zip both engines compute),
    * first occurrence is one min-window over the bigram key, and the
    * per-doc rollup is one hash agg. The only wide shuffle is on the
    * bigram key — at 100 TB that is the same shuffle exact dedup
    * already pays, and the recorded scale path is the E64 Bloom tier
    * in front of it. */
  val qNgramNovelty = Q("q_ngram_novelty",
    (spark, sfDir) => {
      import spark.implicits._
      val seq = Window.partitionBy($"doc_id").orderBy($"pos")
      val bigrams = toks(spark, sfDir)
        .select($"doc_id", posexplode($"toks").as(Seq("pos", "tok")))
        .withColumn("nxt", lead($"tok", 1).over(seq))
        .filter($"nxt".isNotNull)
        .select($"doc_id",
          concat($"tok", lit(" "), $"nxt").as("bigram"))
        .distinct()
      bigrams
        .withColumn("first_doc",
          min($"doc_id").over(Window.partitionBy($"bigram")))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(($"first_doc" === $"doc_id").cast("long"))
            .as("n_novel"))
        .select($"doc_id", $"n_bigrams", $"n_novel",
          round($"n_novel".cast("double") /
            $"n_bigrams".cast("double"), 6).as("novelty_rate"))
        .orderBy($"doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id,
           |    unnest(string_split(trim(text), ' ')) AS tok,
           |    unnest(range(len(string_split(trim(text), ' '))))
           |      AS pos
           |  FROM documents
           |), bigrams AS (
           |  SELECT DISTINCT doc_id,
           |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id
           |      ORDER BY pos) AS bigram
           |  FROM toks
           |  QUALIFY bigram IS NOT NULL
           |), flagged AS (
           |  SELECT doc_id,
           |    min(doc_id) OVER (PARTITION BY bigram) AS first_doc
           |  FROM bigrams
           |)
           |SELECT doc_id, count(*) AS n_bigrams,
           |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_novel,
           |  round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1
           |      ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           |    AS novelty_rate
           |FROM flagged GROUP BY doc_id ORDER BY doc_id"""
      .stripMargin))

  /** E214: **bottom-k consistent sample** — the k documents with the
    * smallest portable content hashes (E206's md5-prefix encoding):
    * a uniform sample that is CONSISTENT under corpus growth (a doc
    * stays sampled until k better hashes exist — the property that
    * makes eval subsets and A/B carve-outs stable across snapshots,
    * which rand()-based sampling cannot give) and coordinated across
    * tables (same hash → same verdict everywhere). It is also exactly
    * the KMV sketch's state (E210) wearing its sample hat. Top-k by
    * hash plans as TakeOrderedAndProject — no global sort. */
  val qSampleBottomk = Q("q_sample_bottomk",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "documents")
        .select($"doc_id", $"source",
          conv(substring(md5($"text".cast("binary")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .orderBy($"h", $"doc_id").limit(100)
        .orderBy($"doc_id")
        .select($"doc_id", $"source", $"h")
    },
    Some("""SELECT doc_id, source, h FROM (
           |  SELECT doc_id, source,
           |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
           |      AS h
           |  FROM documents
           |  ORDER BY h, doc_id LIMIT 100
           |) ORDER BY doc_id""".stripMargin))

  /** E215: **embedding label-separation audit** — the mean pairwise
    * cosine within and across labels (the 3×3 upper-triangular label
    * matrix): the first-look geometry check before trusting labels
    * for classifier training or ANN ground truth. Cosines come from
    * the native codegen'd `vec_dot` (X6's ladder rung b) with norms
    * precomputed once per vector; each pair's cosine is rounded 6dp
    * and then accumulated as DECIMAL(18,6) so the 10⁴-term means are
    * order-exact on both engines (the kmeans float-parity recipe).
    * The all-pairs join is honest about its bounds: embeddings is a
    * fixed 500-row reference table (pairs = 125k at every sf); the
    * recorded 100 TB path for pairwise structure is the bucketed ANN
    * family (X3/E-ANN), not all-pairs. */
  val qEmbedSeparation = Q("q_embed_separation",
    (spark, sfDir) => {
      import spark.implicits._
      val vecs = Tables.read(spark, sfDir, "embeddings")
        .select($"vec_id", $"label", $"embedding",
          sqrt(call_function("vec_dot", $"embedding", $"embedding"))
            .as("nrm"))
      val pairs = vecs.as("a")
        .join(broadcast(vecs.as("b")), $"a.vec_id" < $"b.vec_id")
        .select(least($"a.label", $"b.label").as("label_a"),
          greatest($"a.label", $"b.label").as("label_b"),
          round(call_function("vec_dot", $"a.embedding", $"b.embedding")
            / ($"a.nrm" * $"b.nrm"), 6).cast("decimal(18,6)").as("cos"))
      pairs.groupBy($"label_a", $"label_b")
        .agg(count(lit(1)).as("n_pairs"),
          round(sum($"cos").cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_cos"))
        .orderBy($"label_a", $"label_b")
    },
    Some("""WITH vecs AS (
           |  SELECT vec_id, label, embedding,
           |    sqrt(list_sum(list_transform(
           |      list_zip(embedding, embedding),
           |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))
           |      AS nrm
           |  FROM embeddings
           |), pairs AS (
           |  SELECT least(a.label, b.label) AS label_a,
           |    greatest(a.label, b.label) AS label_b,
           |    CAST(round(list_sum(list_transform(
           |        list_zip(a.embedding, b.embedding),
           |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           |      / (a.nrm * b.nrm), 6) AS DECIMAL(18,6)) AS cos
           |  FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
           |)
           |SELECT label_a, label_b, count(*) AS n_pairs,
           |  round(CAST(sum(cos) AS DOUBLE) /
           |    CAST(count(*) AS DOUBLE), 6) AS mean_cos
           |FROM pairs GROUP BY label_a, label_b
           |ORDER BY label_a, label_b""".stripMargin))

  /** E221: **generator-expression bigrams** — per-language top-5
    * bigrams through the custom `text_bigrams` GENERATOR
    * ([[graft.functions.TextBigramsExpr]]): the pairs form row-locally
    * inside GenerateExec, so unlike the posexplode→window-lead route
    * (E155 q_ngram_freq) there is NO per-document window sort before
    * the counting aggregate — the only Window left is the ≤vocab-sized
    * per-lang rank AFTER it (PlanSuite pins the custom generator in
    * the plan). The oracle reproduces the pairs with DuckDB's lead()
    * — semantics identical, plan deliberately not. */
  val qGenBigrams = Q("q_gen_bigrams",
    (spark, sfDir) => {
      import spark.implicits._
      val pairs = Tables.read(spark, sfDir, "documents")
        .select($"lang",
          call_function("text_bigrams", trim($"text")).as("bigram"))
      pairs.groupBy($"lang", $"bigram")
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(Window.partitionBy($"lang")
          .orderBy($"n".desc, $"bigram")))
        .filter($"rk" <= 5)
        .select($"lang", $"rk", $"bigram", $"n")
        .orderBy($"lang", $"rk")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, lang,
           |    unnest(string_split(trim(text), ' ')) AS tok,
           |    unnest(range(len(string_split(trim(text), ' '))))
           |      AS pos
           |  FROM documents
           |), paired AS (
           |  SELECT lang,
           |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id
           |      ORDER BY pos) AS bigram
           |  FROM toks WHERE tok <> ''
           |  QUALIFY bigram IS NOT NULL
           |), counted AS (
           |  SELECT lang, bigram, count(*) AS n
           |  FROM paired GROUP BY 1, 2
           |), ranked AS (
           |  SELECT lang, bigram, n,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY n DESC, bigram) AS rk
           |  FROM counted
           |)
           |SELECT lang, rk, bigram, n
           |FROM ranked WHERE rk <= 5
           |ORDER BY lang, rk""".stripMargin))

  /** E223: **BPE merge step** — one iteration of byte-pair-encoding
    * vocabulary training: weight every ADJACENT CHARACTER PAIR by its
    * word's corpus frequency and rank the merge candidates — the
    * inner loop of every tokenizer build, expressed as two hash aggs.
    * The heavy part (token counting over the corpus) is the same
    * shuffle TF (X5) pays; the char-pair explosion happens on the
    * DISTINCT VOCABULARY (∝ vocab × word length, independent of
    * corpus size — the reason real BPE trainers also work off the
    * word-frequency dict, not the raw text). Counts are exact
    * integers; ties rank deterministically by pair. Top-10 merge
    * candidates with their weighted counts. */
  val qBpeMergeStep = Q("q_bpe_merge_step",
    (spark, sfDir) => {
      import spark.implicits._
      val vocab = toks(spark, sfDir)
        .select(explode($"toks").as("w"))
        .filter($"w" =!= "")
        .groupBy($"w").agg(count(lit(1)).as("wc"))
      val seqW = Window.partitionBy($"w").orderBy($"pos")
      vocab
        .select($"w", $"wc",
          posexplode(split($"w", "")).as(Seq("pos", "ch")))
        .withColumn("nxt", lead($"ch", 1).over(seqW))
        .filter($"nxt".isNotNull)
        .groupBy(concat($"ch", $"nxt").as("pair"))
        .agg(sum($"wc").as("n"))
        .orderBy($"n".desc, $"pair")
        .limit(10)
    },
    Some("""WITH words AS (
           |  SELECT unnest(string_split(trim(text), ' ')) AS w
           |  FROM documents
           |), vocab AS (
           |  SELECT w, count(*) AS wc FROM words
           |  WHERE w <> '' GROUP BY w
           |), chars AS (
           |  SELECT w, wc,
           |    unnest(string_split_regex(w, '')) AS ch,
           |    unnest(range(len(string_split_regex(w, '')))) AS pos
           |  FROM vocab
           |), paired AS (
           |  SELECT wc,
           |    ch || lead(ch) OVER (PARTITION BY w ORDER BY pos)
           |      AS pair
           |  FROM chars
           |  QUALIFY pair IS NOT NULL
           |)
           |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
           |FROM paired GROUP BY pair
           |ORDER BY n DESC, pair LIMIT 10""".stripMargin))

  /** E229: **temperature-scaled mixture sampling** — the multilingual-
    * corpus balancing rule: sample source s with probability ∝ cₛ^α
    * (α = 0.7 here, the standard up-weighting of small sources that
    * pure proportional sampling starves and uniform sampling
    * over-trusts). Per-source targets come from one dimension-sized
    * aggregate (counts → powered weights → normalized share of the
    * 200-doc budget); the row-level keep decision is the sampling
    * family's portable Knuth-spread hash against rate·2³¹ — no
    * rand(), so the sample is deterministic under retries and
    * reproducible by the oracle. Output: per-source planned target vs
    * realized draw (the hash-threshold binomial), the telemetry a
    * mixture build reports. One fact pass + a broadcast of the
    * 20-row rate table. */
  val qSampleTemperature = Q("q_sample_temperature",
    (spark, sfDir) => {
      import spark.implicits._
      val tot = Window.partitionBy()
      val rates = Tables.read(spark, sfDir, "documents")
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .withColumn("w", pow($"n_docs".cast("double"), 0.7))
        .withColumn("target",
          lit(200.0) * $"w" / sum($"w").over(tot))
        .withColumn("rate",
          least(lit(1.0), $"target" / $"n_docs".cast("double")))
      val picked = Tables.read(spark, sfDir, "documents")
        .join(broadcast(rates), Seq("source"))
        .filter(graft.queries.LLMOps.knuthSpread($"doc_id")
          .cast("double") < $"rate" * 2147483648.0)
        .groupBy($"source").agg(count(lit(1)).as("n_sampled"))
      rates.join(picked, Seq("source"), "left")
        .select($"source", $"n_docs", round($"w", 6).as("weight"),
          round($"target", 6).as("target"),
          coalesce($"n_sampled", lit(0L)).as("n_sampled"))
        .orderBy($"source")
    },
    Some("""WITH counts AS (
           |  SELECT source, count(*) AS n_docs
           |  FROM documents GROUP BY source
           |), rates AS (
           |  SELECT source, n_docs,
           |    pow(CAST(n_docs AS DOUBLE), 0.7) AS w,
           |    200.0 * pow(CAST(n_docs AS DOUBLE), 0.7) /
           |      sum(pow(CAST(n_docs AS DOUBLE), 0.7)) OVER ()
           |      AS target
           |  FROM counts
           |), picked AS (
           |  SELECT d.source, count(*) AS n_sampled
           |  FROM documents d JOIN rates r ON d.source = r.source
           |  WHERE CAST(((d.doc_id % 2147483648 + 2147483648)
           |      % 2147483648) * 2654435761 % 2147483648 AS DOUBLE)
           |    < least(1.0, r.target / CAST(r.n_docs AS DOUBLE))
           |      * 2147483648.0
           |  GROUP BY d.source
           |)
           |SELECT r.source, r.n_docs, round(r.w, 6) AS weight,
           |  round(r.target, 6) AS target,
           |  coalesce(p.n_sampled, 0) AS n_sampled
           |FROM rates r LEFT JOIN picked p ON r.source = p.source
           |ORDER BY r.source""".stripMargin))

  /** E251: **lexical richness (hapax / type-token ratio)** — per
    * source, the vocabulary-health panel quality pipelines read
    * before training: token volume, distinct types, hapax legomena
    * (frequency-1 types — the long tail that dominates natural text
    * and vanishes in template/boilerplate corpora), TTR =
    * types/tokens, and the hapax share of the vocabulary. A corpus
    * whose TTR or hapax share collapses is repeating itself — the
    * corpus-level complement to the per-document repetition signals
    * (E65). Tokenization is the house whitespace convention (X5).
    * One (source, token) aggregation — vocabulary-sized, Zipf-thin —
    * then one per-source rollup with conditional counting; the two
    * ratios are the 6dp double edge. */
  val qTextHapax = Q("q_text_hapax",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "documents")
        .select($"source",
          explode(split(trim($"text"), " ")).as("tok"))
        .filter($"tok" =!= "")
        .groupBy($"source", $"tok").agg(count(lit(1)).as("cnt"))
        .groupBy($"source")
        .agg(sum($"cnt").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when($"cnt" === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select($"source", $"n_tokens", $"n_types", $"n_hapax",
          round($"n_types".cast("double") /
            $"n_tokens".cast("double"), 6).as("ttr"),
          round($"n_hapax".cast("double") /
            $"n_types".cast("double"), 6).as("hapax_share"))
        .orderBy($"source")
    },
    Some("""WITH tf AS (
           |  SELECT source, w AS tok, count(*) AS cnt
           |  FROM (SELECT source,
           |          unnest(string_split(trim(text), ' ')) AS w
           |        FROM documents) u
           |  WHERE w <> '' GROUP BY 1, 2
           |), rolled AS (
           |  SELECT source,
           |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
           |    count(*) AS n_types,
           |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_hapax
           |  FROM tf GROUP BY source
           |)
           |SELECT source, n_tokens, n_types, n_hapax,
           |  round(CAST(n_types AS DOUBLE) /
           |    CAST(n_tokens AS DOUBLE), 6) AS ttr,
           |  round(CAST(n_hapax AS DOUBLE) /
           |    CAST(n_types AS DOUBLE), 6) AS hapax_share
           |FROM rolled ORDER BY source""".stripMargin))

  /** E265: **PCA power-iteration step** — one matrix-free power
    * iteration toward the corpus embedding's dominant principal
    * component: v₁ ∝ Σᵣ (xᵣ·v₀)·xᵣ from the uniform start
    * v₀ = (1/8,…,1/8) (unit for d=64, and exactly representable —
    * no irrational seed). The single-STEP framing mirrors
    * q_kmeans_step: one iteration is the distributed primitive
    * (two row-local passes + one dimension-keyed aggregation);
    * driver-looping it is orchestration, not a new operator. The
    * whole computation is ORDER-FREE integers until two float ops:
    * embeddings quantize once to nano-units (round → BIGINT; the
    * float grid cannot produce engine-splitting .5 cases with
    * opposite signs), the row dot (×8) is a BIGINT fold, the
    * per-dimension accumulation rides DECIMAL(38,0)/HUGEINT, and
    * only the normalization (milli-quantized norm, one sqrt, one
    * divide) touches doubles — identically on both engines, then
    * 6dp. Output: 64 (dimension, loading) rows, a unit vector. */
  val qPcaPowerStep = Q("q_pca_power_step",
    (spark, sfDir) => {
      import spark.implicits._
      val byDim = Tables.read(spark, sfDir, "embeddings")
        .select($"vec_id", expr(
          """transform(embedding,
            |  x -> CAST(round(CAST(x AS DOUBLE) * 1e9) AS BIGINT))"""
            .stripMargin).as("nanos"))
        .select($"vec_id", $"nanos",
          expr("aggregate(nanos, 0L, (a, x) -> a + x)").as("dot8"))
        .select(posexplode($"nanos").as(Seq("dim", "n")), $"dot8")
        .groupBy($"dim")
        .agg(sum($"dot8".cast("decimal(38,0)") * $"n").as("w8e18"))
        .select($"dim",
          ($"w8e18".cast("double") / lit(8.0e18)).as("w"))
      val norm = byDim
        .select(($"w" * 1000.0).as("wm"))
        .select(expr("CAST(round(wm) AS BIGINT)").as("wmi"))
        .agg(sum($"wmi" * $"wmi").as("norm2_milli"))
      byDim.crossJoin(broadcast(norm))
        .select($"dim",
          round($"w" / (sqrt($"norm2_milli".cast("double")) / 1000.0),
            6).as("loading"))
        .orderBy($"dim")
    },
    Some("""WITH nanos AS (
           |  SELECT vec_id,
           |    list_transform(embedding,
           |      x -> CAST(round(CAST(x AS DOUBLE) * 1e9) AS BIGINT))
           |      AS ns
           |  FROM embeddings
           |), dotted AS (
           |  SELECT vec_id, ns, list_sum(ns) AS dot8 FROM nanos
           |), exploded AS (
           |  SELECT unnest(range(len(ns))) AS dim,
           |    unnest(ns) AS n, dot8
           |  FROM dotted
           |), byd AS (
           |  SELECT dim,
           |    CAST(sum(CAST(dot8 AS HUGEINT) * n) AS DOUBLE) / 8e18
           |      AS w
           |  FROM exploded GROUP BY dim
           |), nrm AS (
           |  SELECT sum(CAST(round(w * 1000.0) AS BIGINT)
           |    * CAST(round(w * 1000.0) AS BIGINT)) AS norm2_milli
           |  FROM byd
           |)
           |SELECT CAST(dim AS INTEGER) AS dim,
           |  round(w / (sqrt(CAST(norm2_milli AS DOUBLE)) / 1000.0), 6)
           |    AS loading
           |FROM byd CROSS JOIN nrm ORDER BY dim""".stripMargin))

  /** E266: **readability panel (Flesch-style)** — per source, average
    * sentence length, vowel-group "syllable" density and the Flesch
    * reading-ease score computed from them: the classic prose-
    * complexity proxy quality pipelines bucket corpora by (low score
    * = dense/legalese, implausibly high = fragmented/listy). Every
    * count is an exact integer from one regexp pass (words =
    * whitespace tokens, sentences = terminal-punctuation runs
    * clamped to ≥1 so punctuation-free synthetic docs don't divide
    * by zero, syllables = [aeiouy]+ runs — the standard cheap proxy,
    * stated as such); the Flesch formula is the one double edge,
    * identical constants both sides, 6dp. */
  val qTextReadability = Q("q_text_readability",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "documents")
        .select($"source",
          // count via regexp like the oracle: split("") yields [""]
          // (count 1) where regexp_extract_all('\S+') yields 0 — an
          // empty/whitespace-only doc would split the engines
          expr("CAST(regexp_count(text, '\\\\S+') AS BIGINT)").as("w"),
          greatest(lit(1L),
            expr("CAST(regexp_count(text, '[.!?]+') AS BIGINT)"))
            .as("s"),
          expr("CAST(regexp_count(lower(text), '[aeiouy]+') AS BIGINT)")
            .as("y"))
        .groupBy($"source")
        .agg(sum($"w").as("n_words"), sum($"s").as("n_sentences"),
          sum($"y").as("n_syllables"))
        .select($"source", $"n_words", $"n_sentences", $"n_syllables",
          round(lit(206.835) -
            lit(1.015) * ($"n_words".cast("double") /
              $"n_sentences".cast("double")) -
            lit(84.6) * ($"n_syllables".cast("double") /
              $"n_words".cast("double")), 6).as("flesch"))
        .orderBy($"source")
    },
    Some("""WITH counted AS (
           |  SELECT source,
           |    CAST(len(regexp_extract_all(trim(text), '\S+'))
           |      AS BIGINT) AS w,
           |    greatest(CAST(1 AS BIGINT),
           |      CAST(len(regexp_extract_all(text, '[.!?]+'))
           |        AS BIGINT)) AS s,
           |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
           |      AS BIGINT) AS y
           |  FROM documents
           |)
           |SELECT source, CAST(sum(w) AS BIGINT) AS n_words,
           |  CAST(sum(s) AS BIGINT) AS n_sentences,
           |  CAST(sum(y) AS BIGINT) AS n_syllables,
           |  round(206.835
           |    - 1.015 * (CAST(sum(w) AS DOUBLE) /
           |        CAST(sum(s) AS DOUBLE))
           |    - 84.6 * (CAST(sum(y) AS DOUBLE) /
           |        CAST(sum(w) AS DOUBLE)), 6) AS flesch
           |FROM counted GROUP BY source ORDER BY source"""
      .stripMargin))

  /** E286: **prefix-filtered set-similarity join (PPJoin →
    * pair-key prefixes)** — all order pairs whose PART BASKETS have
    * Jaccard ≥ 0.5. Baskets are ordered by GLOBAL token rarity
    * (df asc, partkey asc); candidates are generated from 2-TOKEN
    * prefix keys (AdaptJoin-class, see the derivation at the
    * candidate block below), after three scale rungs each killed a
    * weaker form: the unfiltered prefix join at sf0.1 (5.1 s), the
    * positional-filterless form at sf1 (136.8 s), and the
    * single-token form at sf10 (token df grows with corpus size over
    * a FIXED part catalog, so Σ df² candidates grew ×10⁴ and the run
    * spilled >60 GB and died — pair-df stays ~O(1) in the same
    * regime, restoring ~linear candidates). The filter stack's
    * losslessness is PROVEN by the gate itself — the oracle runs the
    * NAIVE all-pairs join, so any qualifying pair a filter drops
    * fails parity. Verification is row-local (`array_intersect` on
    * the two collected baskets — no second shuffle); candidates dedup
    * before the verify join. J ≥ 0.5 compares exactly on both
    * engines (0.5 is a power of two; c and sizes are integers). */
  /** The full pair-key PPJoin pipeline over an arbitrary basket
    * frame `tok(k: long, t: long)` (distinct rows) — factored out of
    * the Q so OperatorSuite can fuzz it against a brute-force
    * all-pairs join on RANDOM basket sets, locking the ℓ₂-prefix
    * derivation independent of the lineitem fixture's shape. */
  private[graft] def setsimPairs(
      spark: org.apache.spark.sql.SparkSession,
      tok: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    setsimPairsFrom(spark, setsimSets(spark, tok).localCheckpoint())

  /** The basket table of `tok`: global-rarity-ordered token arrays +
    * sizes — the frame every downstream setsim stage (prefix keys,
    * tiny side path, both verify joins) consumes. Pure; callers pick
    * the materialization (localCheckpoint for one-shot use, the Memo
    * persist for the fixture table shared by both setsim rows). */
  private[graft] def setsimSets(
      spark: org.apache.spark.sql.SparkSession,
      tok: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dfm = tok.groupBy($"t").agg(count(lit(1)).as("df"))
    tok.join(dfm, Seq("t"))
      .groupBy($"k")
      .agg(sort_array(collect_list(struct($"df", $"t"))).as("st"))
      .select($"k",
        expr("transform(st, x -> x.t)").as("toks"),
        size($"st").as("n"))
  }

  /** The FIXTURE basket table, memoized per (session, sfDir) — the
    * mh_bands discipline (round 20, guide §2.4: do the work once):
    * q_join_setsim_prefix and q_join_setsim_topk build the IDENTICAL
    * frame (distinct + df aggregate + rarity-sorted collect_list)
    * from the identical input before their candidate pipelines
    * diverge; without the memo each row re-ran it at every
    * construction (the eager localCheckpoint), 2× per benched run. */
  private[graft] def setsimBaskets(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    graft.Memo.cached(spark, s"setsim_sets:$sfDir") {
      import spark.implicits._
      setsimSets(spark,
        Tables.read(spark, sfDir, "lineitem")
          .select($"l_orderkey".as("k"), $"l_partkey".as("t"))
          .distinct())
    }

  private[graft] def setsimPairsFrom(
      spark: org.apache.spark.sql.SparkSession,
      sets: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    {
      // Candidate generation, round-14 form: PAIR-key prefixes
      // (AdaptJoin-style ℓ=2 prefix keys, Wang et al. SIGMOD'12
      // class), adopted after the sf10 rung KILLED the single-token
      // form — baskets draw tokens from the UNSCALED part catalog, so
      // at ×100 data every token's df grows ×100 and the single-token
      // candidate join (Σ prefix-df² by construction) grows ×10⁴: the
      // sf10 run spilled >60 GB of shuffle and died on disk. With
      // 2-token keys the candidate count is Σ pair-df², and pair-df
      // (orders containing BOTH parts) stays ~O(1) when single df is
      // thousands — candidates return to ~linear in rows.
      //
      // Exactness (τ = 0.5, oracle = naive all-pairs, so any dropped
      // qualifying pair fails parity):
      //  - J ≥ τ ⟹ c ≥ ⌈(n₁+n₂)/3⌉ and sizes within 2× — so for
      //    n₁,n₂ ≥ 2, c ≥ 2: the pair of the FIRST TWO common tokens
      //    (in the shared global-rarity order) exists;
      //  - position bound: c common tokens in n slots put the 2nd
      //    common token at 0-based position ≤ n − c + 1, and the
      //    smallest c a size-n basket can qualify with (partner ≥
      //    max(2, ⌈n/2⌉)) is cmin(n) = max(2, ⌈(n+max(2,⌈n/2⌉))/3⌉) —
      //    so both of the first two common tokens lie in the ℓ₂(n) =
      //    min(n, n − cmin(n) + 2)-prefix of each side, and the pair
      //    is emitted by both;
      //  - positional filter (pair form): beyond the 2nd common token
      //    at position j, all further common tokens sit in both
      //    suffixes: c ≤ 2 + min(n₁−j₁−1, n₂−j₂−1); the true
      //    (1st,2nd)-common instance always satisfies it, so distinct
      //    (k1,k2) survives;
      //  - baskets of size 1 qualify only against sizes ≤ 2
      //    (J = 1/n₂ ≥ τ), handled by a single-token side path over
      //    the ≤2-token baskets only.
      val withPairs = sets.filter($"n" >= 2)
        .withColumn("l2", expr(
          """least(n, n - greatest(2,
            |  (n + greatest(2, (n + 1) DIV 2) + 2) DIV 3) + 2)"""
            .stripMargin))
        .select($"k", $"n", explode(expr(
          """flatten(transform(sequence(0, l2 - 2), i ->
            |  transform(sequence(i + 1, l2 - 1), j ->
            |    struct(toks[i] AS t1, toks[j] AS t2, j AS jp))))"""
            .stripMargin)).as("pr"))
        .select($"k", $"n", $"pr.t1", $"pr.t2", $"pr.jp")
      val candPairs = withPairs.as("a")
        .join(withPairs.as("b"),
          $"a.t1" === $"b.t1" && $"a.t2" === $"b.t2" &&
            $"a.k" < $"b.k" &&
            $"a.n" <= $"b.n" * 2 && $"b.n" <= $"a.n" * 2 &&
            (lit(2) + least($"a.n" - $"a.jp" - 1,
              $"b.n" - $"b.jp" - 1)) * 3 >= $"a.n" + $"b.n")
        .select($"a.k".as("k1"), $"b.k".as("k2"))
      val tiny = sets.filter($"n" <= 2)
        .select($"k", $"n", explode($"toks").as("t"))
      val candTiny = tiny.as("a")
        .join(tiny.as("b"), $"a.t" === $"b.t" && $"a.k" < $"b.k" &&
          least($"a.n", $"b.n") === 1)
        .select($"a.k".as("k1"), $"b.k".as("k2"))
      val cand = candPairs.union(candTiny).distinct()
      cand
        .join(sets.select($"k".as("k1"), $"toks".as("ta"),
          $"n".as("n1")), Seq("k1"))
        .join(sets.select($"k".as("k2"), $"toks".as("tb"),
          $"n".as("n2")), Seq("k2"))
        .withColumn("c", size(array_intersect($"ta", $"tb")))
        .filter($"c" / ($"n1" + $"n2" - $"c") >= 0.5)
        .select($"k1".as("order_a"), $"k2".as("order_b"),
          $"c".cast("long").as("n_common"),
          round($"c" / ($"n1" + $"n2" - $"c"), 6).as("jaccard"))
      // deliberately UNSORTED: the enumeration form sorts for its
      // output contract, but the top-k form feeds TopKPerKey (which
      // re-distributes by key), and a global sort of a potentially
      // quadratic pair set in between would be pure waste
    }
  }

  val qJoinSetsimPrefix = Q("q_join_setsim_prefix",
    (spark, sfDir) => {
      import spark.implicits._
      setsimPairsFrom(spark, setsimBaskets(spark, sfDir))
        .orderBy($"order_a", $"order_b")
    },
    Some("""WITH tok AS (
           |  SELECT DISTINCT l_orderkey AS k, l_partkey AS t
           |  FROM lineitem
           |), sizes AS (
           |  SELECT k, count(*) AS n FROM tok GROUP BY 1
           |), common AS (
           |  SELECT a.k AS k1, b.k AS k2, count(*) AS c
           |  FROM tok a JOIN tok b ON a.t = b.t AND a.k < b.k
           |  GROUP BY 1, 2
           |)
           |SELECT k1 AS order_a, k2 AS order_b,
           |  CAST(c AS BIGINT) AS n_common,
           |  round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
           |FROM common
           |JOIN sizes s1 ON s1.k = k1
           |JOIN sizes s2 ON s2.k = k2
           |WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.5
           |ORDER BY order_a, order_b""".stripMargin))

  /** E343: **emit-bounded set-similarity: top-k partners per key** —
    * the form a production pipeline actually runs at 100 TB (VERDICT
    * r14 item 5). Full pair ENUMERATION (`q_join_setsim_prefix`) is
    * the audit tool; its output is inherently quadratic on a
    * clone-heavy corpus (~10⁹ pairs / 732 s at the sf10 rung,
    * output-bound). Downstream consumers — canonical selection,
    * near-dup linking, similar-item recommendation — only ever need
    * each key's BEST partners, so this form keeps the identical
    * candidate generation + verification (same provably lossless
    * pair-key prefix filter stack, same exactness argument) and bounds
    * the EMIT: the verified pairs are symmetrized into directed
    * (key, partner) rows and run through the [[graft.plans.TopKPerKey]]
    * physical operator (bounded heap per key, spill-safe), so the
    * emitted rows, the post-verify shuffle, and anything downstream
    * are ≤ k·|keys| ∝ corpus size — never pair-count — and the
    * quadratic set dies inside the verify stage instead of being
    * sorted, shuffled and materialized. No global sort anywhere
    * (enumeration pays a full-output sort for its contract; top-k
    * re-distributes by key only). Ranking is (jaccard DESC, partner
    * ASC) — a total order per key, so the selected set is
    * deterministic and the DuckDB row_number() oracle reproduces it
    * exactly; both engines rank the same round-6 jaccard values the
    * enumeration gate already proved equal at two scales. */
  val qJoinSetsimTopk = Q("q_join_setsim_topk",
    (spark, sfDir) => {
      import spark.implicits._
      val pairs = setsimPairsFrom(spark, setsimBaskets(spark, sfDir))
      // symmetrize with a single-pass explode, NOT a self-union: a
      // union of two selects over `pairs` makes Spark COMPUTE THE
      // WHOLE CANDIDATE+VERIFY PIPELINE TWICE (one subtree per
      // branch), doubling every upstream shuffle — measured fatally
      // at the quadratic-output sf10 rung (the union form died on
      // disk at stage 66 where the enumeration form's 1× footprint
      // had just fit at 732 s; BASELINE round-15). The explode emits
      // both directions from ONE verified row, and the map-side
      // TopKPerKeyPartial consumes the exploded iterator pipelined —
      // the only post-verify shuffle WRITE is the heap output,
      // ≤ k·keys·partitions rows, never pair-count.
      val directed = pairs
        .select(explode(array(
          struct($"order_a".as("k"), $"order_b".as("partner"),
            $"n_common", $"jaccard"),
          struct($"order_b".as("k"), $"order_a".as("partner"),
            $"n_common", $"jaccard"))).as("d"))
        .select($"d.k", $"d.partner", $"d.n_common", $"d.jaccard")
      graft.plans.TopKPerKey.of(directed, partitionCols = Seq("k"),
          orderCol = "jaccard", desc = true, tiebreak = "partner",
          k = 3)
        .select($"k".as("order_k"), $"partner", $"n_common",
          $"jaccard")
    },
    Some("""WITH tok AS (
           |  SELECT DISTINCT l_orderkey AS k, l_partkey AS t
           |  FROM lineitem
           |), sizes AS (
           |  SELECT k, count(*) AS n FROM tok GROUP BY 1
           |), common AS (
           |  SELECT a.k AS k1, b.k AS k2, count(*) AS c
           |  FROM tok a JOIN tok b ON a.t = b.t AND a.k < b.k
           |  GROUP BY 1, 2
           |), pairs AS (
           |  SELECT k1, k2, CAST(c AS BIGINT) AS n_common,
           |    round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
           |  FROM common
           |  JOIN sizes s1 ON s1.k = k1
           |  JOIN sizes s2 ON s2.k = k2
           |  WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.5
           |), directed AS (
           |  SELECT k1 AS k, k2 AS partner, n_common, jaccard
           |  FROM pairs
           |  UNION ALL
           |  SELECT k2 AS k, k1 AS partner, n_common, jaccard
           |  FROM pairs
           |)
           |SELECT k AS order_k, partner, n_common, jaccard
           |FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY k ORDER BY jaccard DESC, partner) AS rn
           |  FROM directed
           |)
           |WHERE rn <= 3""".stripMargin))

  /** E287: **repeated-substring detection** — which 40-char windows
    * (stride 10) appear in MORE THAN ONE document: the substring-level
    * dedup signal (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better") that document- and shingle-level dedup
    * (X1/X2) miss — boilerplate headers, licence blocks and template
    * runs shared across otherwise-distinct docs. Window extraction is
    * row-local (one `transform(sequence(...))` per doc, no join); the
    * only shuffle is the window-key aggregation — the same shuffle
    * class exact dedup pays. The literal window string is the key here
    * so the oracle can replay it; the recorded 100 TB variant keys on
    * `xxhash64(win)` (8-byte keys instead of 40-char strings) and
    * strides 1 on the probe side when exact recall across unaligned
    * offsets is required (stride s only guarantees catching shared
    * runs whose offsets agree mod s). */
  val qDedupSubstring = Q("q_dedup_substring",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "documents")
        .filter(length($"text") >= 40)
        .select($"doc_id", explode(expr(
          """transform(sequence(1, CAST(length(text) AS INT) - 39, 10),
            |  i -> substring(text, i, 40))""".stripMargin)).as("win"))
        .groupBy($"win")
        .agg(countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min($"doc_id").as("first_doc"))
        .filter($"n_docs" >= 2)
        .orderBy($"win")
    },
    Some("""WITH w AS (
           |  SELECT doc_id,
           |    unnest(list_transform(
           |      generate_series(1, CAST(length(text) AS INTEGER) - 39,
           |        10),
           |      i -> substr(text, CAST(i AS INTEGER), 40))) AS win
           |  FROM documents WHERE length(text) >= 40
           |)
           |SELECT win, count(DISTINCT doc_id) AS n_docs,
           |  count(*) AS n_occurrences, min(doc_id) AS first_doc
           |FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2
           |ORDER BY win""".stripMargin))

  /** E288: **hashed repeated-substring detection** — the recorded
    * 100 TB path of E287, made real: the native `rolling_hashes`
    * expression (RollingHash.scala, codegen'd Rabin–Karp) fingerprints
    * every 40-char/stride-10 window in ONE O(n) pass per document, so
    * the shuffle key is an 8-byte LONG instead of a 40-char string —
    * 5× less shuffle volume and no window materialization in the scan
    * stage. The aggregation (distinct docs, occurrences, first doc)
    * runs entirely on hashes; only the ≥2-doc SURVIVORS (a few hundred
    * rows against 13k windows at sf0.01) are joined back — broadcast —
    * to one representative document to re-extract the literal window
    * for display. The oracle is E287's string-window SQL verbatim:
    * parity holds iff no 64-bit collision occurred among the corpus
    * windows (expected ≈ m²/2⁶⁵ ≈ 10⁻¹¹ here), so the gate doubles as
    * the collision check, and OperatorSuite pins hashed ≡ literal
    * row-for-row. */
  val qDedupSubstringHashed = Q("q_dedup_substring_hashed",
    (spark, sfDir) => {
      import spark.implicits._
      val docs = Tables.read(spark, sfDir, "documents")
      val agg = docs
        .select($"doc_id",
          posexplode(expr("rolling_hashes(text, 40, 10)")))
        .groupBy($"col")
        .agg(countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min($"doc_id").as("first_doc"),
          min(struct($"doc_id", $"pos")).as("rep"))
        .filter($"n_docs" >= 2)
      docs.select($"doc_id".as("rd"), $"text")
        .join(broadcast(agg), $"rd" === $"rep.doc_id")
        .select(
          expr("substring(text, rep.pos * 10 + 1, 40)").as("win"),
          $"n_docs", $"n_occurrences", $"first_doc")
        .orderBy($"win")
    },
    Some("""WITH w AS (
           |  SELECT doc_id,
           |    unnest(list_transform(
           |      generate_series(1, CAST(length(text) AS INTEGER) - 39,
           |        10),
           |      i -> substr(text, CAST(i AS INTEGER), 40))) AS win
           |  FROM documents WHERE length(text) >= 40
           |)
           |SELECT win, count(DISTINCT doc_id) AS n_docs,
           |  count(*) AS n_occurrences, min(doc_id) AS first_doc
           |FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2
           |ORDER BY win""".stripMargin))

  val all: Seq[Q] = Seq(qPmiCooccur, qNgramNovelty, qSampleBottomk,
    qEmbedSeparation, qGenBigrams, qBpeMergeStep, qSampleTemperature,
    qTextHapax, qPcaPowerStep, qTextReadability,
    qJoinSetsimPrefix, qJoinSetsimTopk, qDedupSubstring,
    qDedupSubstringHashed)
}
