package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.{Column => V2Column,
  Identifier, MetadataColumn, SupportsMetadataColumns, SupportsNamespaces,
  SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table,
  TableCapability, TableCatalog}
import org.apache.spark.sql.connector.expressions.{Expressions,
  NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo,
  SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.collection.concurrent.TrieMap

/** Minimal in-memory DataSource-V2 `TableCatalog` whose tables support
  * SQL **`MERGE INTO`** (E86 / VERDICT r8 item 4) — the statement-level
  * upsert surface that E15 (`q_merge_upsert`, Extras.scala) proves only
  * as a full-outer-join *expression*. Spark plans `MERGE INTO` solely
  * against DSv2 tables implementing [[SupportsRowLevelOperations]]; no
  * built-in runtime catalog does, so a user of the engine needs this
  * shim to run the statement users of warehouse MERGE actually write.
  *
  * Design: the GROUP-BASED row-level path (not delta-based). Our
  * operation advertises `Command.MERGE` plus an ordinary whole-table
  * scan and a replace-on-commit write; Catalyst's own
  * `RewriteMergeIntoTable` rule then rewrites the statement into the
  * exact plan E15 hand-builds — target ⟗ source on the key, per-clause
  * projections, cardinality check — and `ReplaceData` writes back the
  * surviving rows. The MERGE *machinery* is therefore Spark's, fully
  * codegen'd and shuffle-planned like any join; only the storage here
  * is a harness device. At 100 TB the same statement runs unchanged
  * against any production DSv2 format (Iceberg/Delta implement this
  * same contract with per-file groups + runtime file pruning); this
  * catalog is the in-session stand-in, exactly like the memory sink
  * stands in for kafka in §2.10.
  *
  * Storage: rows are kept as serialized `UnsafeRow` bytes and shipped
  * to executors INSIDE the `InputPartition`s (no driver callback at
  * read time, works across JVMs); the scan prunes columns
  * ([[SupportsPushDownRequiredColumns]]) so `SELECT key` over a wide
  * table deserializes narrow rows only. Writes collect per-task bytes
  * into commit messages; `commit` installs them atomically
  * (append / truncate-replace / merge-replace). State is JVM-global
  * per catalog NAME (companion-object store): a catalog is a shared
  * service — the production analogue keeps table state in an external
  * store every session sees — and instance-scoped state (the first
  * cut) broke the streaming case specifically, because `foreachBatch`
  * runs in a CLONED session whose catalog manager re-instantiates the
  * plugin, so a MERGE inside the batch could not see tables created
  * outside the stream. Callers keep per-invocation table names (the
  * `mergeRun`/`upsertRun` counters), so concurrent suites stay
  * isolated by name exactly as before. */
class MemRowTableCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = "memrow"
  private def tables = MemRowTableCatalog.store(catName)

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catName = name
  override def name(): String = catName

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val prefix = if (ns.isEmpty) "" else ns.mkString(".") + "."
    tables.keys.filter(_.startsWith(prefix))
      .map(k => Identifier.of(ns, k.stripPrefix(prefix))).toArray
  }

  /** Plain lookup, plus the `.history` METADATA table: when no real
    * table owns the identifier and its last segment is `history`, the
    * parent table's snapshot log is served as a read-only relation —
    * `SELECT * FROM cat.db.t.history` — the Iceberg metadata-table /
    * `DESCRIBE HISTORY` surface. A real table literally named
    * `history` always wins (exact key match is tried first). */
  override def loadTable(ident: Identifier): Table =
    tables.get(key(ident)) match {
      case Some(t) => t
      case None if ident.name() == "history" && ident.namespace().nonEmpty =>
        tables.getOrElse(ident.namespace().mkString("."),
          throw new NoSuchTableException(ident)).historyTable()
      case None => throw new NoSuchTableException(ident)
    }

  /** DDL existence is REAL tables only — the virtual `.history`
    * relation must not block `CREATE TABLE db.t.history` (the default
    * implementation probes loadTable, which would resolve it). */
  override def tableExists(ident: Identifier): Boolean =
    tables.contains(key(ident))

  /** Time travel (`VERSION AS OF n`): version n is the table state
    * after its n-th commit (0 = the empty state at creation — the
    * Delta/Iceberg snapshot-id convention). Returns a READ-ONLY
    * snapshot table; writes must target the current version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = tables.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"VERSION AS OF expects an integer snapshot id, got '$version'")
    }
    t.snapshotAt(v)
  }

  /** Time travel (`TIMESTAMP AS OF t`): latest version whose commit
    * time is ≤ t (µs since epoch, per the DSv2 contract). Wall-clock
    * based — deterministic queries should prefer VERSION AS OF. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = tables.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    t.snapshotAtTime(timestamp)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "MemRowTableCatalog does not support partitioned tables")
    val t = new MemRowTable(key(ident), schema)
    if (tables.putIfAbsent(key(ident), t).isDefined)
      throw new TableAlreadyExistsException(ident)
    t
  }

  /** `ALTER TABLE ... ADD COLUMNS` only (the schema-evolution DDL a
    * growing 100 TB table needs without rewriting history); every
    * other change fails loudly. */
  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*)
      : Table = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val t = tables.getOrElse(key(ident),
      throw new NoSuchTableException(ident))
    val adds = changes.map {
      case a: TableChange.AddColumn => a
      case other => throw new UnsupportedOperationException(
        s"MemRowTableCatalog supports ALTER TABLE ADD COLUMNS only, " +
          s"got ${other.getClass.getSimpleName}")
    }
    t.applyAddColumns(adds)
    t
  }

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(key(ident)).isDefined

  override def renameTable(from: Identifier, to: Identifier): Unit =
    tables.remove(key(from)) match {
      case Some(t) => tables.put(key(to), t); ()
      case None => throw new NoSuchTableException(from)
    }

  // -- SupportsNamespaces: every namespace "exists" (tables are keyed
  // by their full dotted name; there is no namespace-level state) --
  override def listNamespaces(): Array[Array[String]] =
    tables.keys.map(_.split('.').dropRight(1)).filter(_.nonEmpty)
      .toSet.toArray
  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    Array.empty
  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] =
    new util.HashMap[String, String]()
  override def createNamespace(ns: Array[String],
      metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(ns: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*)
      : Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (cascade) throw new NoSuchNamespaceException(ns)
    false
  }
}

/** JVM-global table store, keyed by catalog name — see the class doc
  * for why state must outlive a single plugin instance (streaming's
  * cloned sessions re-instantiate catalogs). */
object MemRowTableCatalog {
  private val stores =
    TrieMap.empty[String, TrieMap[String, MemRowTable]]
  private[sources] def store(name: String): TrieMap[String, MemRowTable] =
    stores.getOrElseUpdate(name, TrieMap.empty)
}

/** One in-memory table: serialized UnsafeRow bytes behind the DSv2
  * facets MERGE needs (read, write, metadata columns, row-level ops).
  *
  * Why the `_split` METADATA column exists: Spark's group-based
  * row-level write applies its row projection — which strips the
  * MergeRows instruction column off the plan output — only on the
  * metadata-carrying task (`ReplaceDataExec.writingTask` selects
  * `DataAndMetadataWritingSparkTask` iff the operation requires
  * metadata attributes; the plain task hands the writer the RAW plan
  * rows, instruction column included). Declaring the scan-split
  * ordinal as a metadata column — the moral equivalent of a file
  * source's `_metadata.file_path`, it identifies the "group" a row
  * came from — keeps us on the projected path, which is the contract
  * production formats (Iceberg `_file`/`_pos`) use too. */
final class MemRowTable(tableName: String, initialSchema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  /** Current committed contents; replaced atomically on commit. */
  @volatile private[sources] var data: Array[Array[Byte]] = Array.empty

  /** Current schema — mutable because `ALTER TABLE ADD COLUMNS`
    * evolves it in place (under the table lock, with a simultaneous
    * row migration, so `data` and `tableSchema` always agree).
    * Historical snapshots carry their OWN commit-time schema (the
    * schema-per-snapshot contract production formats keep in
    * metadata), so time travel across an evolution reads each version
    * with the shape it had. */
  @volatile private[sources] var tableSchema: StructType = initialSchema

  /** Version history: one [[MemRowTable.Snap]] per commit (state after
    * that commit, commit µs, operation label). Entry for version 0 is
    * the empty creation state. Appended under the same lock `commit`
    * takes, so a snapshot read never sees a torn state. Row arrays are
    * immutable-by-convention (commit installs fresh arrays), so
    * snapshots alias them without copying. Retention: only the most
    * recent [[MemRowTable.Retain]] versions stay resolvable — older
    * snapshots are retired exactly like a production format's expired
    * snapshots (Iceberg `expire_snapshots` / Delta VACUUM), and
    * reading one fails loudly with the retention bound in the message.
    * Version IDS keep counting monotonically past retirement (they are
    * snapshot ids, not indices). */
  private[sources] val history =
    scala.collection.mutable.ArrayBuffer[MemRowTable.Snap](
      MemRowTable.Snap(0, Array.empty,
        System.currentTimeMillis() * 1000L, "create", initialSchema))
  private var nextVersion = 1

  /** Called by commit under `table.synchronized`. */
  private[sources] def recordCommit(rows: Array[Array[Byte]],
      op: String): Unit = {
    history += MemRowTable.Snap(nextVersion, rows,
      System.currentTimeMillis() * 1000L, op, tableSchema)
    nextVersion += 1
    if (history.length > MemRowTable.Retain)
      history.remove(0, history.length - MemRowTable.Retain)
  }

  /** `ALTER TABLE ... ADD COLUMNS`: appends nullable columns and
    * migrates every stored row with a null fill, atomically under the
    * table lock (so `data` and the schema never disagree). Records an
    * `add column` snapshot — on a production format this is a
    * metadata-only commit; here rows are row-oriented bytes, so the
    * null-fill rewrite is the in-memory stand-in. Time travel to a
    * pre-evolution version still reads the OLD shape: every snapshot
    * carries its commit-time schema. */
  private[sources] def applyAddColumns(
      adds: Seq[org.apache.spark.sql.connector.catalog.TableChange.AddColumn])
      : Unit = synchronized {
    adds.foreach { add =>
      require(add.fieldNames().length == 1,
        "ADD COLUMNS supports top-level columns only, got " +
          add.fieldNames().mkString("."))
      require(add.isNullable,
        s"added column ${add.fieldNames()(0)} must be nullable " +
          "(existing rows are null-filled; no DEFAULT backfill)")
      val colName = add.fieldNames()(0)
      require(!tableSchema.fieldNames.contains(colName),
        s"column $colName already exists in $tableName")
      val old = tableSchema
      val proj = UnsafeProjection.create(
        old.fields.zipWithIndex.map { case (f, i) =>
          BoundReference(i, f.dataType, f.nullable)
            : org.apache.spark.sql.catalyst.expressions.Expression
        }.toSeq :+
          org.apache.spark.sql.catalyst.expressions.Literal
            .create(null, add.dataType()))
      val reused = new UnsafeRow(old.length)
      data = data.map { bytes =>
        reused.pointTo(bytes, bytes.length)
        val u = proj(reused)
        util.Arrays.copyOfRange(u.getBytes, 0, u.getSizeInBytes)
      }
      tableSchema = old.add(colName, add.dataType(), nullable = true)
      recordCommit(data, "add column")
    }
  }

  /** The `.history` metadata relation: (version, operation,
    * committed_at, num_rows), one row per RESOLVABLE snapshot — the
    * `DESCRIBE HISTORY` surface. Served as a detached read-only
    * MemRowTable built from the log under the same lock commits take,
    * so a concurrent commit never tears the listing. Deterministic
    * audits should project (version, operation, num_rows);
    * committed_at is wall-clock by nature. */
  private[sources] def historyTable(): Table = synchronized {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("num_rows", LongType, nullable = false)))
    val proj = UnsafeProjection.create(schema)
    val rows = history.map { s =>
      val u = proj(InternalRow(s.version,
        org.apache.spark.unsafe.types.UTF8String.fromString(s.op),
        s.tsUs, s.rows.length.toLong))
      util.Arrays.copyOfRange(u.getBytes, 0, u.getSizeInBytes)
    }.toArray
    val t = new MemRowTable(s"$tableName.history", schema)
    t.data = rows
    t
  }

  private def snapshotTable(s: MemRowTable.Snap): Table = {
    val snap = new MemRowTable(s"$tableName@v${s.version}", s.schema)
    snap.data = s.rows
    snap
  }

  private[sources] def snapshotAt(v: Int): Table = synchronized {
    history.find(_.version == v) match {
      case Some(s) => snapshotTable(s)
      case None =>
        val valid =
          s"${history.head.version}..${history.last.version}"
        throw new IllegalArgumentException(
          if (v >= 0 && v < nextVersion)
            s"version $v of $tableName has been retired " +
              s"(retention ${MemRowTable.Retain}; resolvable: $valid)"
          else s"no version $v for table $tableName (valid: $valid)")
    }
  }

  private[sources] def snapshotAtTime(tsUs: Long): Table = synchronized {
    history.findLast(_.tsUs <= tsUs) match {
      case Some(s) => snapshotTable(s)
      case None => throw new IllegalArgumentException(
        s"no resolvable version of $tableName at or before " +
          s"timestamp $tsUs (retention ${MemRowTable.Retain})")
    }
  }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def columns(): Array[V2Column] =
    tableSchema.fields.map(f =>
      V2Column.create(f.name, f.dataType, f.nullable))
  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    s
  }

  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_split"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
      override def comment(): String = "scan split ordinal (group id)"
    })

  /** Scans capture (rows, schema) as ONE consistent pair under the
    * table lock — an ALTER between the two reads would otherwise let
    * a plan deserialize migrated rows with a stale field count. */
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = synchronized {
    new MemRowScanBuilder(data, tableSchema, tableName)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemRowWriteBuilder(this, info.schema(), replace = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        // the whole table is ONE group: the op's scan reads everything
        // and its write replaces everything — the simplest sound
        // group-based contract (production formats scope groups to the
        // files the runtime filter touched)
        override def newScanBuilder(
            options: CaseInsensitiveStringMap): ScanBuilder =
          MemRowTable.this.synchronized {
            new MemRowScanBuilder(MemRowTable.this.data,
              MemRowTable.this.tableSchema, tableName)
          }
        override def newWriteBuilder(
            info: LogicalWriteInfo): WriteBuilder =
          new MemRowWriteBuilder(MemRowTable.this, info.schema(),
            replace = true)
        // requiring the group-id metadata column routes the write
        // through Spark's projecting task — see the class doc
        override def requiredMetadataAttributes(): Array[NamedReference] =
          Array(Expressions.column("_split"))
      }
    }
}

/** Column-pruning scan over one captured (rows, schema) pair — data
  * is pinned at builder construction (analysis time), so a concurrent
  * commit or ALTER never changes what this scan reads. */
final class MemRowScanBuilder(rows: Array[Array[Byte]],
    full: StructType, tableName: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String = s"MemRowScan($tableName)"

    override def planInputPartitions(): Array[InputPartition] = {
      // ship row bytes inside the partitions; split for parallelism
      val nSplits = math.min(4, math.max(1, rows.length))
      val per = math.max(1, (rows.length + nSplits - 1) / nSplits)
      rows.grouped(per).zipWithIndex.map { case (chunk, i) =>
        MemRowsPartition(chunk, full.length, i): InputPartition
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val fullS = full
      val reqS = required
      new PartitionReaderFactory {
        override def createReader(
            p: InputPartition): PartitionReader[InternalRow] = {
          val mp = p.asInstanceOf[MemRowsPartition]
          // prune by projecting the required columns out of the full
          // row — the scan's ReadSchema is honestly narrow; the
          // `_split` metadata column materializes as this split's
          // ordinal (it is not stored in the row bytes)
          val proj = UnsafeProjection.create(reqS.fields.map { f =>
            if (f.name == "_split")
              org.apache.spark.sql.catalyst.expressions.Literal(
                mp.split, org.apache.spark.sql.types.IntegerType)
            else {
              val i = fullS.fieldIndex(f.name)
              BoundReference(i, f.dataType, f.nullable)
            }
          }.toSeq)
          new PartitionReader[InternalRow] {
            private var i = -1
            private val row = new UnsafeRow(mp.numFields)
            override def next(): Boolean = { i += 1; i < mp.rows.length }
            override def get(): InternalRow = {
              val bytes = mp.rows(i)
              row.pointTo(bytes, bytes.length)
              proj(row)
            }
            override def close(): Unit = ()
          }
        }
      }
    }
  }
}

/** Serialized rows of one scan split (self-contained — no driver
  * callback from executors). `split` is the ordinal surfaced as the
  * `_split` metadata column. */
case class MemRowsPartition(rows: Array[Array[Byte]], numFields: Int,
    split: Int) extends InputPartition

/** Append / truncate-replace / rowlevel-replace writes. Tasks serialize
  * rows into their commit message; commit installs on the driver. */
final class MemRowWriteBuilder(table: MemRowTable, writeSchema: StructType,
    replace: Boolean) extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = replace

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory = {
        val schema = writeSchema
        new DataWriterFactory {
          override def createWriter(partitionId: Int,
              taskId: Long): DataWriter[InternalRow] =
            new DataWriter[InternalRow] {
              private val buf =
                scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
              private val proj = UnsafeProjection.create(schema)
              override def write(r: InternalRow): Unit = {
                val u = proj(r)
                buf += util.Arrays.copyOfRange(u.getBytes, 0,
                  u.getSizeInBytes)
              }
              override def commit(): WriterCommitMessage =
                MemRowsCommit(buf.toArray)
              override def abort(): Unit = ()
              override def close(): Unit = ()
            }
        }
      }
      override def commit(msgs: Array[WriterCommitMessage]): Unit = {
        val incoming = msgs.iterator
          .map(_.asInstanceOf[MemRowsCommit].rows)
          .foldLeft(Array.empty[Array[Byte]])(_ ++ _)
        table.synchronized {
          table.data =
            if (truncateFirst) incoming else table.data ++ incoming
          // row-level rewrites (MERGE/UPDATE/DELETE) and explicit
          // truncations install a full replacement state; everything
          // else is an append — the two operation labels a
          // whole-table-group format distinguishes
          table.recordCommit(table.data,
            if (truncateFirst) "replace" else "append")
        }
      }
      override def abort(msgs: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

object MemRowTable {
  /** Snapshot retention: how many most-recent versions stay
    * resolvable by time travel. Bounds snapshot memory for long-lived
    * sessions with many commits (the in-memory analogue of a format's
    * snapshot-expiry policy); 64 is far above what any harness query
    * ladder produces, so within-session diffs never hit it. */
  val Retain = 64

  /** One snapshot-log entry: table state after commit `version`,
    * commit wall-clock µs, the operation that produced it (`create` /
    * `append` / `replace` / `add column`), and the schema the table
    * had at that commit (time travel across an `ALTER TABLE ADD
    * COLUMNS` reads each version with its own shape). */
  final case class Snap(version: Int, rows: Array[Array[Byte]],
      tsUs: Long, op: String, schema: StructType)
}

case class MemRowsCommit(rows: Array[Array[Byte]])
    extends WriterCommitMessage
