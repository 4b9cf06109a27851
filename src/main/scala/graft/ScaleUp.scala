package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator (VERDICT r8 item 3): replicate the
  * driver fixture N× into parallel key universes so the marquee scale
  * queries can be EXECUTED (not just plan-argued) at sf1+ and their
  * sf0.1→sf1 scaling ratios recorded in BASELINE.md.
  *
  * Per copy `i`, every intra-fact key is shifted by `i·STRIDE`
  * (consistent across tables, so events⋈customer and lineitem⋈orders
  * joins keep their per-universe selectivity); foreign keys into the
  * UNSCALED dimension tables (nation/region/part/supplier) are left
  * untouched, matching how a real corpus grows against fixed
  * dimensions. Document text gets its VOCABULARY renamed per copy
  * (every word suffixed with a copy tag): within a copy every
  * pairwise Jaccard / exact-dup relation is preserved bit-for-bit
  * (two docs sharing bigram "a b" both map it to "a#i b#i"), while
  * cross-copy shingle overlap is exactly ZERO — so near-dup
  * candidate density scales LINEARLY in the factor, like a naturally
  * larger corpus. (The first cut of this generator replaced only
  * every 5th word, which still left ~60% of bigrams shared between
  * every doc and its 9 copies: shingle document frequency grew ~10×
  * and the inverted-index candidate join — Σ df² by construction —
  * grew ~100× at factor 10. That measured as a 475 s cold
  * q_dedup_cluster at sf1, a property of the synthetic corpus, not
  * of the operators; see BASELINE.md round-9 addendum.)
  * Embedding vectors are cyclically rotated by `i` dims — norms and
  * intra-copy distances are preserved, cross-copy cosine decorrelates.
  * Timestamps are unchanged: N× more events in the same window, the
  * realistic densification.
  *
  * `--grow-keys` (VERDICT r14 item 1) additionally scales the
  * part/supplier KEY UNIVERSES with the factor: `p_partkey` /
  * `s_suppkey` are shifted per copy and `lineitem` shifts
  * `l_partkey`/`l_suppkey` to match. The default mode models a corpus
  * growing against FIXED dimensions — realistic for star joins, but it
  * saturates density-sensitive workloads: the co-purchase graph's edge
  * count froze at 1.196M from sf1 onward (every copy re-draws the same
  * 2k-part catalog, so new rows stop creating new part pairs once the
  * pair space is covered — measured in the round-14 sf10 rung), and
  * order baskets get F−1 verbatim clones (identical part sets), so
  * set-similarity output grows quadratically in F by construction.
  * With grow-keys each copy is a DISJOINT part universe: graph
  * vertices AND edges grow ∝ F at constant degree distribution, and
  * cross-copy basket overlap is exactly zero, so setsim output grows
  * ∝ F — the shape of a naturally larger catalog, and the fixture on
  * which "BFS/k-core/label-prop survive a 100× graph" is actually
  * falsifiable. Dimension-table realism flips accordingly: part and
  * supplier stop being broadcastable at high factors, which is itself
  * the honest 100 TB condition for the catalog-join family.
  *
  * Usage: `runMain graft.ScaleUp <srcSfDir> <outDir> <factor>
  * [--grow-keys]`. */
object ScaleUp {

  private val STRIDE = 10000000L

  def main(args: Array[String]): Unit = {
    val growKeys = args.contains("--grow-keys")
    val Array(src, out, fStr) = args.filterNot(_ == "--grow-keys")
    val factor = fStr.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = Sessions.local("graft-scaleup")
    import spark.implicits._

    def copies(table: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables.read(spark, src, table)
      val scaled = (0 until factor).map(i => tx(base, i))
        .reduce(_ unionAll _)
      scaled.write.mode("overwrite")
        .parquet(s"$out/$table.parquet")
      ()
    }
    def shift(df: DataFrame, i: Int, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(i * STRIDE)))

    copies("customer")((d, i) => shift(d, i, "c_custkey"))
    copies("orders")((d, i) => shift(d, i, "o_orderkey", "o_custkey"))
    if (growKeys)
      copies("lineitem")((d, i) =>
        shift(d, i, "l_orderkey", "l_partkey", "l_suppkey"))
    else
      copies("lineitem")((d, i) => shift(d, i, "l_orderkey"))
    // ts passes through as TimestampType and is written as parquet
    // timestamp[µs] (outputTimestampType below), matching the current
    // fixture encoding; Tables.read's footer probe takes the native path.
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    copies("events")((d, i) => shift(d, i, "event_id", "user_id"))
    copies("documents") { (d, i) =>
      val s = shift(d, i, "doc_id")
      if (i == 0) s
      else s.withColumn("text",
        // per-copy vocabulary rename — see class doc: preserves every
        // within-copy similarity relation, zeroes cross-copy overlap
        array_join(
          transform(split(col("text"), " "),
            w => when(w === "", w).otherwise(concat(w, lit(s"#$i")))),
          " "))
        .withColumn("n_chars", length(col("text")))
    }
    copies("embeddings") { (d, i) =>
      val s = shift(d, i, "vec_id")
      if (i == 0) s
      else {
        val dim = Tables.read(spark, src, "embeddings")
          .select(size(col("embedding"))).head().getInt(0)
        val r = i % dim
        if (r == 0) s
        else s.withColumn("embedding",
          concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r)))
      }
    }
    // dimension tables: nation/region always pass through (genuinely
    // fixed geography); part/supplier grow with the factor under
    // --grow-keys so the catalog joins stay key-consistent with the
    // shifted lineitem FKs, and pass through otherwise
    if (growKeys) {
      copies("part")((d, i) => shift(d, i, "p_partkey"))
      copies("supplier")((d, i) => shift(d, i, "s_suppkey"))
    }
    val fixed = if (growKeys) Seq("nation", "region")
                else Seq("nation", "region", "part", "supplier")
    fixed.foreach { t =>
      Tables.read(spark, src, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}
