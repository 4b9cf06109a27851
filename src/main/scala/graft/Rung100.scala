package graft

/** The sf100gk rung (VERDICT r16 item 6): the 10 slowest non-stream
  * queries from BENCH_FULL, executed once each against a ~16 GB
  * grow-keys ×1000 fixture at a 64 g driver. Protocol notes, recorded
  * here because they differ from Bench deliberately:
  *  - ONE run per query (cold: includes memo builds and first-plan
  *    codegen). At this scale the shuffle families run for minutes —
  *    min-of-2 would double a multi-hour rung for a second sample the
  *    alternation analysis (BASELINE round-17) shows is noise-bounded
  *    by host drift anyway. Judge these as COLD numbers.
  *  - per-query fault isolation: an OOM/spill kill in one query must
  *    not void the rung for the rest; failures print and the exit
  *    code is nonzero.
  *  - results stream one line per query as they finish, so a
  *    wall-clock cutoff still leaves a partial record.
  * Usage: `SPARK_GRAFT_SF_DIR=/tmp/sf100gk SPARK_DRIVER_MEM=64g sbt
  * "runMain graft.Rung100"` (optionally SPARK_GRAFT_ONLY to subset). */
object Rung100 {

  private val defaultTargets = Seq(
    // light first; the shuffle-heavy shingle/basket family last, so a
    // disk-exhaustion kill there cannot void the rest of the rung
    "q_top_movers", "q_sql_recursive", "q_write_audit_publish",
    "q_graph_label_prop", "q_pagerank", "q_basket_pairs",
    "q_minhash_accuracy", "q_dedup_minhash",
    "q_join_setsim_prefix", "q_join_setsim_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf100gk")
    val targets = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaultTargets)
    // ONE SparkSession PER QUERY (round-17 incident: a failed stage's
    // shuffle files — 45 GB of them — outlive the failure inside a
    // long-lived session and starve every subsequent query of disk;
    // stopping the session deletes its block-manager directories, so
    // each query starts with a clean spill budget)
    var calibStart = -1L
    var anyErr = false
    val rows = targets.map { name =>
      if (calibStart < 0) calibStart = Bench.calibMs()
      val spark = Sessions.local("graft-rung100")
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[rung100] ERR $name: ${e.getMessage}")
          anyErr = true; false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[rung100] $name%-28s ${if (ok) f"$sec%.1f s"
        else "ERR"}")
      spark.stop()
      (name, ok, sec)
    }
    val calibEnd = Bench.calibMs()
    def r(s: Double) = BigDecimal(s).setScale(1,
      BigDecimal.RoundingMode.HALF_UP).toString
    val qs = rows.map { case (n, ok, s) =>
      s""""$n":${if (ok) r(s) else "\"err\""}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"rung100_cold_sec","calib_ms":[$calibStart,$calibEnd],"queries":$qs,"sf":"$sfDir"}""")
    if (anyErr) sys.exit(4)
  }
}
