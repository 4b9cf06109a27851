package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField,
  StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DataSource-V2 READ connector: a deterministic time-series
  * GENERATOR table with real **filter pushdown** and **column
  * pruning** — the connector-development surface a platform team
  * writing an internal source (device registry, feed gateway, range
  * generator) actually implements. The repo's other DSv2 piece
  * (MemRowCatalog) covers the catalog + row-level-operation side;
  * this covers the scan side:
  *
  *  - `SupportsPushDownFilters`: range predicates on the row index
  *    `i` (>, >=, <, <=, =) NARROW THE GENERATED RANGE ITSELF — the
  *    pushdown is not cosmetic, rows outside [lo, hi) are never
  *    materialized (the generator analogue of parquet row-group
  *    pruning). Non-index filters are returned as residuals for
  *    Spark to evaluate — the contract that keeps pushdown SAFE
  *    (claiming a filter you don't fully apply is the classic
  *    correctness bug; E-row parity would catch it).
  *  - `SupportsPushDownRequiredColumns`: the reader materializes
  *    only the requested columns (a pruned-away `value` is never
  *    computed).
  *  - The narrowed range splits into `slices` InputPartitions, so
  *    the generator parallelizes like any table scan.
  *
  * Schema: `i BIGINT, ts TIMESTAMP (2024-01-01T00:00:00Z + i
  * seconds), value DOUBLE` with value = Knuth-hash(i) scaled to
  * [0, 100) — deterministic, so a DuckDB `range()` computes the
  * identical rows and the E319 oracle hash-gates both the pushdown
  * arithmetic and the generator. Usage:
  * `spark.read.format("graft.sources.SeriesSource")
  *   .option("rows", n).option("slices", k).load()`. */
class SeriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesSource.schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong)
      .getOrElse(1000L)
    val slices = Option(properties.get("slices")).map(_.toInt)
      .getOrElse(4)
    val maxRows = Option(properties.get("maxRowsPerBatch"))
      .map(_.toLong).getOrElse(rows)
    new SeriesTable(rows, slices, maxRows)
  }
}

object SeriesSource {
  val schema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** 2024-01-01T00:00:00Z in epoch micros. */
  val epochStartMicros: Long = 1704067200000000L

  def valueAt(i: Long): Double =
    (i * 2654435761L % 2147483648L % 10000L) / 100.0
}

private[sources] class SeriesTable(rows: Long, slices: Int,
    maxRowsPerBatch: Long)
  extends Table with SupportsRead {
  override def name(): String = s"graft_series($rows)"
  override def schema(): StructType = SeriesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(rows, slices, maxRowsPerBatch)
}

private[sources] class SeriesScanBuilder(rows: Long, slices: Int,
    maxRowsPerBatch: Long)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SeriesSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // literals arrive as whatever boxed numeric Catalyst folded to;
    // match Number, not Long — a stricter match silently demotes the
    // filter to a residual and the pushdown evaporates
    val (ours, residual) = filters.partition {
      case GreaterThan("i", _: Number) => true
      case GreaterThanOrEqual("i", _: Number) => true
      case LessThan("i", _: Number) => true
      case LessThanOrEqual("i", _: Number) => true
      case EqualTo("i", _: Number) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("i", v: Number) =>
        lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("i", v: Number) =>
        lo = math.max(lo, v.longValue)
      case LessThan("i", v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("i", v: Number) =>
        hi = math.min(hi, v.longValue + 1)
      case EqualTo("i", v: Number) =>
        lo = math.max(lo, v.longValue)
        hi = math.min(hi, v.longValue + 1)
      case _ =>
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SeriesScan(lo, math.max(lo, hi), slices, required,
      maxRowsPerBatch)
}

private[sources] class SeriesScan(lo: Long, hi: Long, slices: Int,
    required: StructType, maxRowsPerBatch: Long)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SeriesScan[lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    SeriesScan.split(lo, hi, slices)

  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory(required.fieldNames)

  /** Streaming face of the same scan: the row index IS the offset
    * (exactly-once replay = regenerate [start, end)), and admission
    * control caps each micro-batch at `maxRowsPerBatch` — the custom-
    * source analogue of maxFilesPerTrigger, driven through Spark's
    * own ReadLimit contract rather than a side channel. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeriesMicroBatchStream(lo, hi, slices, maxRowsPerBatch,
      required.fieldNames)
}

private[sources] object SeriesScan {
  def split(lo: Long, hi: Long, slices: Int): Array[InputPartition] = {
    val n = math.max(1, slices)
    val len = hi - lo
    (0 until n).map { k =>
      val s = lo + len * k / n
      val e = lo + len * (k + 1) / n
      SeriesPartition(s, e): InputPartition
    }.toArray
  }
}

private[sources] case class SeriesOffset(v: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

private[sources] class SeriesMicroBatchStream(lo: Long, hi: Long,
    slices: Int, maxRowsPerBatch: Long, cols: Array[String])
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset,
    ReadLimit, SupportsAdmissionControl}

  override def initialOffset(): Offset = SeriesOffset(lo)
  override def deserializeOffset(json: String): Offset =
    SeriesOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch >= hi - lo) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxRowsPerBatch)

  // plain latestOffset() is the no-admission-control legacy path;
  // Spark calls the (start, limit) overload when the source declares
  // SupportsAdmissionControl
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeriesOffset].v
    val cap = limit match {
      case r: org.apache.spark.sql.connector.read.streaming
        .ReadMaxRows => math.min(hi, s + r.maxRows())
      case _ => hi
    }
    SeriesOffset(cap)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] =
    SeriesScan.split(start.asInstanceOf[SeriesOffset].v,
      end.asInstanceOf[SeriesOffset].v, slices)

  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory(cols)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class SeriesPartition(start: Long, end: Long)
  extends InputPartition

/** Serializable factory: only the pruned column names travel. */
private[sources] class SeriesReaderFactory(cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeriesPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val vals = cols.map {
          case "i" => java.lang.Long.valueOf(cur)
          case "ts" => java.lang.Long.valueOf(
            SeriesSource.epochStartMicros + cur * 1000000L)
          case "value" =>
            java.lang.Double.valueOf(SeriesSource.valueAt(cur))
          case other => throw new IllegalArgumentException(
            s"unknown series column $other")
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
