package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Pinned schemas + readers for the harness tables (TESTDATA.md).
  *
  * Schemas are declared, never inferred, per SURVEY.md §1.4: the reference
  * (GriffinWeber/covid19i2b2) reads fixed relational i2b2 CRC tables
  * [SURVEY.md §1.1], so our engine likewise treats every source as a
  * fixed-schema scan. Declared schemas also make DuckDB-oracle parity
  * byte-stable and are required for Structured Streaming sources.
  *
  * Note on `events.ts`: the parquet stores nanosecond timestamps, which
  * Spark 4.x's vectorized reader refuses to read as TimestampType
  * (SchemaColumnConvertNotSupportedException). We therefore read `ts` as
  * raw nanos (LongType, via spark.sql.legacy.parquet.nanosAsLong) and
  * convert to a microsecond TimestampType in [[read]]. The DuckDB oracle
  * must apply the same µs truncation (`CAST(ts AS TIMESTAMP)` casts
  * DuckDB's TIMESTAMP_NS to µs TIMESTAMP) so boundary predicates agree —
  * see FIXTURES.md §1.
  */
object Tables {

  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** On-disk schema: `ts` is declared LongType because the parquet column
    * is timestamp[ns] (read as raw nanos; converted to TimestampType in
    * [[read]]). */
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Scan one harness table with its pinned schema. Column pruning and
    * predicate pushdown reach the parquet scan because the schema is
    * declared up front (no inference pass).
    *
    * `events.ts` special case: the file stores timestamp[ns]; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` the vectorized reader
    * yields raw nanos as LongType, which we floor-divide to µs and wrap in
    * TimestampType. Division of positive epoch-nanos is exact truncation,
    * matching DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs cast. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // defensive: callers may pass a session built outside Sessions.local
    // (e.g. the harness smoke check); without this flag every events
    // scan throws on the timestamp[ns] column
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Structured Streaming file source over the same fixture, same pinned
    * schema and ts conversion — the batch/stream symmetry that makes the
    * batch-equivalence self-tests (SURVEY.md §5.2.6) meaningful. */
  def readStream(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    // The file-stream source requires a directory or glob (a bare file
    // path fails the basePath-must-be-a-directory check), so glob the
    // one fixture file.
    val df = spark.readStream.schema(schemas(name))
      .parquet(s"$sfDir/*$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
