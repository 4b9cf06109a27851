package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

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
  * deployments. */
object Memo {
  private val entries = TrieMap.empty[(SparkSession, String), DataFrame]
  private val actions = TrieMap.empty[(SparkSession, String), Unit]
  private val hooked = TrieMap.empty[SparkSession, Unit]

  /** Build-once per (session, key); the result is persisted
    * MEMORY_AND_DISK. */
  def cached(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    hook(spark)
    entries.getOrElseUpdate((spark, key),
      build.persist(StorageLevel.MEMORY_AND_DISK))
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
    actions.getOrElseUpdate((spark, key), load)
    ()
  }

  /** Test hook: the memo/load keys held for exactly this session —
    * lets suites prove per-session isolation (a sibling session must
    * build its OWN entries, not observe another's). */
  private[graft] def keysFor(spark: SparkSession): Set[String] =
    (entries.keysIterator ++ actions.keysIterator)
      .collect { case (s, k) if s eq spark => k }.toSet

  private def hook(spark: SparkSession): Unit =
    if (hooked.putIfAbsent(spark, ()).isEmpty) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          entries.filterInPlace { case ((s, _), _) => s ne spark }
          actions.filterInPlace { case ((s, _), _) => s ne spark }
          hooked.remove(spark)
          ()
        }
      })
    }
}
