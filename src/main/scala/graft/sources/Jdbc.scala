package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S5 — the JDBC source (SURVEY.md §2.1): the reference runs INSIDE an
  * RDBMS (its tables *are* the database), so the Spark equivalent is a
  * partitioned `spark.read.jdbc` pull of the i2b2 star tables into
  * DataFrames, after which every other operator in this library applies
  * unchanged.
  *
  * The scale contract is the partitioned read: a single-connection JDBC
  * scan serializes 100 TB through one executor, so every fact-table
  * pull MUST declare a numeric `partitionColumn` (the reference schema
  * has `patient_num`/`encounter_num` on every fact row) with bounds, so
  * Spark issues `numPartitions` parallel range queries
  * (`WHERE col >= lo AND col < hi`). Dimension-sized tables may use the
  * single-partition [[readTable]]. Catalyst pushes filters/column
  * pruning into the generated SQL (`PushedFilters` in `.explain` — the
  * same pushdown story as parquet scans).
  *
  * Tested against the embedded Derby that ships on the Spark classpath
  * (JdbcSuite) — no server required; the same code points at any
  * RDBMS by changing the URL/driver. */
object Jdbc {

  /** Single-partition read — dimension tables only (the whole result
    * flows through one connection). */
  def readTable(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, toProps(props))

  /** Partitioned parallel read — the fact-table path. `numPartitions`
    * range queries on `partitionColumn` ∈ [lowerBound, upperBound].
    * Rows outside the bounds are still read (Spark widens the first
    * and last stride), so bounds tune parallelism, never correctness. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      props: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, toProps(props))

  /** [[readPartitioned]] with bounds discovered by one scalar
    * min/max query — the convenience form for ad-hoc pulls. Costs a
    * few extra metadata round-trips (stored-name probe, bounds
    * subquery schema, then the bounds row itself); skip it (pass
    * bounds) when the caller already knows the key range — the
    * documented fast path for repeated production pulls. */
  def readPartitionedAuto(spark: SparkSession, url: String,
      table: String, partitionColumn: String, numPartitions: Int,
      props: Map[String, String] = Map.empty): DataFrame = {
    // the column's stored case depends on how the table was created
    // (Spark's jdbc writer quotes → lowercase; plain DDL case-folds →
    // e.g. uppercase on Derby), so an unquoted or naively-quoted
    // reference can miss it. Resolve the actual stored name from the
    // table's JDBC schema (one WHERE-1=0 metadata query) and quote
    // THAT via the url's dialect — the same resolve-then-quote Spark
    // applies to the range predicates in readPartitioned.
    val stored = spark.read.jdbc(url, table, toProps(props))
      .schema.fieldNames
      .find(_.equalsIgnoreCase(partitionColumn))
      .getOrElse(partitionColumn)
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(stored)
    val bounds = spark.read
      .jdbc(url,
        s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM $table) b",
        toProps(props))
      .head()
    if (bounds.isNullAt(0)) // empty table: any single partition works
      readTable(spark, url, table, props)
    else
      readPartitioned(spark, url, table, partitionColumn,
        bounds.getAs[Number](0).longValue(),
        bounds.getAs[Number](1).longValue(),
        numPartitions, props)
  }

  /** JDBC write — the reverse path (publishing computed outputs back
    * to a site RDBMS). Each partition writes over its own connection;
    * `batchsize` batches inserts. */
  def writeTable(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      props: Map[String, String] = Map.empty): Unit =
    df.write.mode(mode).jdbc(url, table, toProps(props))

  private def toProps(m: Map[String, String]): Properties = {
    val p = new Properties()
    m.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }
}
