package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-method bridge extension libraries conventionally place in
  * the org.apache.spark.sql package: build a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows` is `private[sql]` by design, and
  * custom logical nodes — graft.plans.TopKPerKey — need exactly this
  * one door back into the public Dataset API). */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 wraps columns in
    * ColumnNodes; the converter is `private[sql]`). RollupRewrite's
    * registration API takes user-facing Columns and needs their
    * expressions for semantic matching. */
  def expressionOf(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Executor-scratch temp file for operator spills. `java.io.tmpdir`
    * is the wrong place for executor spill bytes — on clusters where
    * /tmp is a small tmpfs it silently converts a disk-backed bound
    * into RAM pressure (ADVICE r8 item 1) — so route through Spark's
    * own local-dir resolution (`spark.local.dir` / YARN dirs), the
    * same disks DiskBlockManager puts native shuffle spills on. Falls
    * back to tmpdir only when no SparkEnv is live (bare unit tests). */
  def createSpillFile(prefix: String, suffix: String): java.io.File = {
    val env = org.apache.spark.SparkEnv.get
    val dir =
      if (env == null) null
      else new java.io.File(org.apache.spark.util.Utils.getLocalDir(env.conf))
    java.io.File.createTempFile(prefix, suffix, dir)
  }
}
