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
  * Note on timestamp columns: writers differ on the parquet timestamp
  * physical unit — historical fixtures stored `events.ts` as
  * timestamp[ns] (which Spark 4.x's vectorized reader refuses to widen
  * to µs TimestampType), the current ones store timestamp[µs] (native),
  * and nothing pins which column the NEXT writer changes. A 100 TB lake
  * written by mixed writers WILL contain both, so [[read]] probes the
  * footer once per path and adapts EVERY declared-timestamp column
  * independently: µs (or ms) reads natively as TimestampType;
  * int64-nanos reads as raw Long via
  * `spark.sql.legacy.parquet.nanosAsLong` and is floor-divided to µs
  * (exact truncation, matching DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs
  * cast) — see FIXTURES.md §1.
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

  /** Logical schema: `ts` is a µs TimestampType regardless of the file's
    * physical unit ([[read]] adapts to the footer). */
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
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

  /** Per-path memo of the path's data files grouped by which declared
    * timestamp columns they store as raw int64 epoch-nanos — ONE
    * footer sweep per distinct path for the life of the JVM (footer
    * reads are O(files), driver-side, no Spark job; on a real lake the
    * equivalent is one table-format metadata round-trip). One group
    * with an empty column set = the whole path reads natively; several
    * groups = a mixed-writer directory [[read]] must scan per group
    * and union (VERDICT r10 item 2 — the day-one 100 TB drift case).
    *
    * The memo assumes IMMUTABLE paths: files at a probed path are never
    * re-encoded in place with a different timestamp unit (the fixture
    * dirs are write-once; object-store layouts version by path). A
    * caller that does rewrite a directory must call
    * [[invalidateUnitProbes]] or later reads take the stale branch and
    * fail loudly at scan time (ADVICE r10 item 2). */
  private val unitGroupsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Set[String], Seq[String])]]()

  /** Drop every memoized unit probe (test hook / after an in-place
    * rewrite of a previously read path). */
  private[graft] def invalidateUnitProbes(): Unit = unitGroupsMemo.clear()

  /** Group the parquet data files under `pathOrGlob` by which of
    * `declared`'s TimestampType columns need the legacy
    * raw-int64-nanos read path. The probe reads each file's FOOTER
    * directly (parquet-hadoop API): INT64 annotated TIMESTAMP(NANOS)
    * and plain unannotated INT64 are epoch-nanos (the two legacy
    * writer encodings, FIXTURES.md §1); TIMESTAMP(MICROS/MILLIS) and
    * INT96 read natively. Footer reads mutate no session state at all
    * — the ADVICE r10 item 1 race (probe-side set/restore of
    * `nanosAsLong` interleaving with a sibling probe or an in-flight
    * legacy scan) is gone by construction, and unlike whole-path
    * schema inference a per-file probe classifies a MIXED directory
    * instead of failing on the merged-schema conflict. Generalized
    * over ALL timestamp columns of ALL tables: the round-9 fixture
    * regeneration proved writer-side unit drift is real, and nothing
    * pins WHICH column the next writer changes. */
  private def unitGroups(spark: SparkSession, pathOrGlob: String,
      declared: StructType): Seq[(Set[String], Seq[String])] =
    unitGroupsMemo.computeIfAbsent(pathOrGlob, { _ =>
      val tsCols = declared.fields
        .filter(_.dataType == TimestampType).map(_.name).toSet
      if (tsCols.isEmpty) Seq((Set.empty[String], Nil))
      else {
        import org.apache.hadoop.fs.{Path => HPath}
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        import org.apache.parquet.schema.LogicalTypeAnnotation.
          TimestampLogicalTypeAnnotation
        import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        val hconf = spark.sessionState.newHadoopConf()
        val glob = new HPath(pathOrGlob)
        val fs = glob.getFileSystem(hconf)
        val matched = Option(fs.globStatus(glob)).map(_.toSeq)
          .getOrElse(Nil)
        val files = matched.flatMap { st =>
          if (st.isDirectory) fs.listStatus(st.getPath).toSeq
          else Seq(st)
        }.filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        val classified = files.map { st =>
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromStatus(st, hconf))
          val msg =
            try reader.getFooter.getFileMetaData.getSchema
            finally reader.close()
          val ns = tsCols.filter { c =>
            msg.containsField(c) && {
              val t = msg.getType(Seq(c): _*)
              t.isPrimitive &&
                t.asPrimitiveType().getPrimitiveTypeName ==
                  PrimitiveTypeName.INT64 &&
                (t.getLogicalTypeAnnotation match {
                  case ts: TimestampLogicalTypeAnnotation =>
                    ts.getUnit == TimeUnit.NANOS
                  case null => true // plain int64 = raw epoch-nanos
                  case _    => false
                })
            }
          }
          (ns, st.getPath.toString)
        }
        if (classified.isEmpty) Seq((Set.empty[String], Nil))
        else classified.groupBy(_._1).toSeq
          .map { case (ns, g) => (ns, g.map(_._2).sorted) }
          .sortBy(_._2.headOption.getOrElse(""))
      }
    })

  /** The on-disk schema for a path whose `nsCols` store raw int64
    * nanos: those columns declared LongType, everything else as the
    * logical schema. */
  private def onDiskSchema(declared: StructType,
      nsCols: Set[String]): StructType =
    StructType(declared.fields.map {
      case f if nsCols(f.name) => f.copy(dataType = LongType)
      case f => f
    })

  /** Raw-nanos → µs TimestampType, in place (withColumn keeps the
    * column's position). `div` truncates toward zero, which is exactly
    * DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs semantics for BOTH signs —
    * measured: DuckDB maps −1 ns → 0 µs and −1001 ns → −1 µs, i.e.
    * truncation, not floor (ADVICE r10 item 4 asked for floor; the
    * measurement says trunc is the parity-correct choice, pinned by
    * HashProps' negative-epoch unit-probe property). */
  private def toMicros(df: DataFrame, nsCols: Set[String]): DataFrame =
    nsCols.foldLeft(df)((d, c) =>
      d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000"))))

  /** Scan one harness table with its pinned schema. Column pruning and
    * predicate pushdown reach the parquet scan because the schema is
    * declared up front (no inference pass for the fixed-schema tables).
    *
    * Timestamp columns adapt to the files' physical unit
    * ([[nanosColumns]], one memoized footer probe per path):
    * timestamp[µs]/[ms] — the current fixture encodings — read natively
    * as TimestampType, so time predicates push down to the scan; a
    * legacy int64-nanos column reads as raw Long (nanosAsLong) and is
    * floor-divided to µs at the scan edge. Downstream operators always
    * see the one logical schema. */
  /** One scan with one unit branch: native, or raw-nanos + µs rescale
    * at the scan edge. `paths` is the whole table path for a
    * single-unit table, or one unit group's explicit file list for a
    * mixed directory. */
  private def scanGroup(spark: SparkSession, declared: StructType,
      nsCols: Set[String], paths: Seq[String]): DataFrame =
    if (nsCols.isEmpty) {
      spark.read.schema(declared).parquet(paths: _*)
    } else {
      // defensive: callers may pass a session built outside
      // Sessions.local (e.g. the harness smoke check); without this
      // flag an ANNOTATED timestamp[ns] scan throws. Sticky by design:
      // the flag only affects how ns-annotated columns resolve, which
      // is exactly the behavior every read in this engine wants.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      toMicros(
        spark.read.schema(onDiskSchema(declared, nsCols))
          .parquet(paths: _*),
        nsCols)
    }

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val declared = schemas(name)
    unitGroups(spark, path, declared) match {
      case Seq((nsCols, _)) => // single-unit path: whole-dir scan
        scanGroup(spark, declared, nsCols, Seq(path))
      case groups =>
        // mixed-writer directory: one scan per unit group over that
        // group's files, normalized to the logical schema at the scan
        // edge, then a zero-shuffle positional union — every group
        // projects the same declared column order (toMicros rescales
        // in place), so downstream operators see ONE logical table
        groups.map { case (nsCols, files) =>
          scanGroup(spark, declared, nsCols, files)
        }.reduce(_.unionAll(_))
    }
  }

  /** Structured Streaming file source over the same fixture, same pinned
    * schema and ts-unit adaptation — the batch/stream symmetry that makes
    * the batch-equivalence self-tests (SURVEY.md §5.2.6) meaningful. */
  def readStream(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    // The file-stream source requires a directory or glob (a bare file
    // path fails the basePath-must-be-a-directory check), so glob the
    // one fixture file. The unit probe runs on the same glob via the
    // batch reader (footers only).
    val glob = s"$sfDir/*$name.parquet"
    val declared = schemas(name)
    unitGroups(spark, glob, declared) match {
      case Seq((nsCols, _)) =>
        if (nsCols.isEmpty) {
          spark.readStream.schema(declared).parquet(glob)
        } else {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          toMicros(
            spark.readStream.schema(onDiskSchema(declared, nsCols))
              .parquet(glob),
            nsCols)
        }
      case groups =>
        // The file-stream source takes a glob, not an explicit file
        // list, so a single directory mixing units cannot be split
        // into per-group streams. Fail loudly (the batch path handles
        // this layout; a streaming lake compacts or versions by path).
        throw new IllegalStateException(
          s"readStream($glob): directory mixes timestamp units across " +
            s"files (${groups.size} unit groups) — not supported for " +
            "streaming; compact the directory or version by path")
    }
  }
}
