package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet (SURVEY.md §2.1 S4/S5):
  * CSV and JSON-lines round-trips with declared schemas (never
  * inferred — an inference pass would double-scan at 100 TB), and the
  * approximate-aggregate variants used instead of exact distinct counts
  * at scale. The round-trip queries exercise write → read → aggregate;
  * their oracles aggregate the original parquet, so any loss in the
  * round-trip (formatting, quoting, nulls) fails parity. */
object Formats {

  private val slim = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Oracle shared by both round-trips: per-type stats off parquet. */
  private val roundtripOracle =
    """SELECT event_type,
      |       count(*) AS n,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6)
      |         AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  private def roundtrip(fmt: String) = Q(s"q_source_${fmt}_roundtrip",
    (spark, sfDir) => {
      import spark.implicits._
      val dir = s"target/fmt/${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/$fmt"
      val slimmed = Tables.read(spark, sfDir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value")
      slimmed.write.mode("overwrite").format(fmt).save(dir)
      spark.read.schema(slim).format(fmt).load(dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("n_users"),
          round(sum($"value".cast("decimal(18,6)")), 6)
            .cast("double").as("sum_value"))
        .orderBy($"event_type")
    },
    Some(roundtripOracle))

  /** S4: CSV sink + source round-trip. */
  val qSourceCsv = roundtrip("csv")

  /** JSON-lines sink + source round-trip. */
  val qSourceJson = roundtrip("json")

  /** ORC sink + source round-trip (the other columnar format Spark
    * bundles natively — common as the i2b2-site export format on
    * Hive-era warehouses). The oracle reads the original parquet, so
    * the check is format-independent. */
  val qSourceOrc = roundtrip("orc")

  /** 100 TB variants (SURVEY.md §2.4 note): HyperLogLog++ distinct and
    * quantile sketches — sketch implementations are engine-specific, so
    * no DuckDB oracle (driver records rows>0); accuracy is asserted
    * against the exact values in ScalaTest instead. */
  val qAggApprox = Q("q_agg_approx",
    (spark, sfDir) => {
      import spark.implicits._
      Tables.read(spark, sfDir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          approx_count_distinct($"o_custkey", 0.02).as("approx_customers"),
          round(approx_percentile($"o_totalprice", lit(0.5), lit(1000)), 6)
            .as("approx_median_price"))
        .orderBy($"o_orderpriority")
    },
    None)

  /** S1b: Hive-style partitioned parquet layout — the 100-TB table
    * organization. Writes events partitioned by event_type (low
    * cardinality: 5 directories), reads back filtered to two types,
    * and aggregates. The filter must resolve at PLANNING time from the
    * directory listing (`PartitionFilters` in the scan, pruned before
    * any file is opened) — the property that makes a 100 TB scan touch
    * 2/5ths of the data; PlanSuite locks it. The oracle aggregates the
    * original parquet under the same predicate, so any row lost or
    * duplicated by the partitioned write fails parity. */
  val qSourcePartitioned = Q("q_source_partitioned_roundtrip",
    (spark, sfDir) => {
      import spark.implicits._
      val dir = "target/fmt/" +
        s"${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/part_events"
      val slimmed = Tables.read(spark, sfDir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value")
      slimmed.write.mode("overwrite")
        .partitionBy("event_type").parquet(dir)
      spark.read.schema(slim).parquet(dir)
        .filter($"event_type".isin("click", "error"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("n_users"),
          round(sum($"value".cast("decimal(18,6)")), 6)
            .cast("double").as("sum_value"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type,
           |       count(*) AS n,
           |       count(DISTINCT user_id) AS n_users,
           |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6)
           |         AS DOUBLE) AS sum_value
           |FROM events WHERE event_type IN ('click', 'error')
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  val all: Seq[Q] = Seq(qSourceCsv, qSourceJson, qSourceOrc, qAggApprox,
    qSourcePartitioned)
}
