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
  * Usage: `runMain graft.ScaleUp <srcSfDir> <outDir> <factor>`. */
object ScaleUp {

  private val STRIDE = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, fStr) = args
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
    // dimension tables pass through unscaled (broadcast side stays
    // realistic as facts grow)
    Seq("nation", "region", "part", "supplier").foreach { t =>
      Tables.read(spark, src, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}
