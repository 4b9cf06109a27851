package graft

/** Navigator payoff measurement (VERDICT r15 item 1): for each
  * q_agg_rollup_* shape, time the SAME user query with the rewrite ON
  * (answered from materialized cells) vs OFF (the naive plan over the
  * fact table), at the fixture `SPARK_GRAFT_SF_DIR` points to — the
  * number that is the navigator's reason to exist, measured instead
  * of argued.
  *
  * Protocol matches BASELINE.md's bench-noise rules: untimed
  * warmup pass (which also builds + registers every summary, so the
  * build cost is visibly OUTSIDE the query numbers — at 100 TB the
  * build is the ingest pipeline's amortized job, not the dashboard
  * query's), min-of-2 per condition, calibration probes bracketing
  * the sweep. Additionally VERIFIES the rewrite actually FIRED at
  * this scale by walking the executed plan's file scans: a silently
  * unfired rewrite would otherwise record a flattering ~1.0× and
  * read as "no payoff" instead of failing loudly — exit is nonzero
  * if any shape did not fire.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/tmp/sf10gk sbt "runMain graft.NavBench"`
  * Prints ONE JSON line:
  * `{"metric":"nav_onoff","calib_ms":[s,e],"queries":{name:
  * {"on":s,"off":s,"speedup":x,"fired":b}},"sf":dir}`. */
object NavBench {

  /** The navigator shapes with a data-proportional OFF plan. The two
    * stream-maintained rows (E342/E355) are excluded: their cost is
    * the micro-batch floor, not the rewrite, and their generator is
    * fixture-independent. */
  private val shapes = Seq(
    "q_agg_rollup_rewrite", "q_agg_rollup_stats", "q_agg_rollup_corr",
    "q_agg_rollup_distinct", "q_agg_rollup_distinct_measure",
    "q_agg_rollup_sum_distinct", "q_agg_rollup_count_measure",
    "q_agg_rollup_expr_measure", "q_agg_rollup_build_api",
    "q_agg_rollup_lattice", "q_agg_rollup_lattice_filtered",
    "q_agg_rollup_cube", "q_agg_rollup_joinback",
    "q_agg_rollup_joinback_outer", "q_agg_rollup_joinback_preagg",
    "q_agg_rollup_having")

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[String] = p match {
    case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec =>
      Seq(f.relation.location.rootPaths.map(_.toString).mkString(","))
    case other => other.children.flatMap(scans)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-navbench")
    // untimed warmup: summary builds + registration + first-plan
    // codegen for every shape, plus the fact scans themselves
    shapes.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[navbench] warmup ERR $n: ${e.getMessage}")
      }
    }
    val calibStart = Bench.calibMs()
    var anyUnfired = false
    val rows = shapes.map { name =>
      val fn = SparkEntry.queries(name)
      def timed(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // fired-check on the executed plan of a fresh instance
      val probe = fn(spark, sfDir)
      probe.count()
      val fired = scans(probe.queryExecution.executedPlan).exists(s =>
        s.contains("graft-rollup") || s.contains("graft-lat") ||
          s.contains("fine_v") || s.contains("coarse_v"))
      if (!fired) {
        anyUnfired = true
        System.err.println(s"[navbench] UNFIRED at $sfDir: $name")
      }
      // SPARK_GRAFT_NAV_ALT=n switches to the ALTERNATION instrument
      // (round 17): n interleaved ON/OFF pairs, medians reported.
      // Single-pass min-of-2 is fine for the flat shapes, but the
      // shuffle-join family's single-shot numbers swing up to 4× on
      // this host (BASELINE.md round-17) — alternation cancels the
      // slow host drift that min-of-2 cannot.
      val alt = sys.env.get("SPARK_GRAFT_NAV_ALT")
        .flatMap(s => scala.util.Try(s.toInt).toOption)
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      val (on, off) = alt match {
        case Some(n) if n > 0 =>
          val ons = collection.mutable.ArrayBuffer[Double]()
          val offs = collection.mutable.ArrayBuffer[Double]()
          for (_ <- 1 to n) {
            ons += timed()
            spark.conf.set(plans.RollupRewrite.EnabledConf, "false")
            try offs += timed()
            finally spark.conf.unset(plans.RollupRewrite.EnabledConf)
          }
          (med(ons.toSeq), med(offs.toSeq))
        case _ =>
          val o1 = math.min(timed(), timed())
          spark.conf.set(plans.RollupRewrite.EnabledConf, "false")
          val o2 =
            try math.min(timed(), timed())
            finally spark.conf.unset(plans.RollupRewrite.EnabledConf)
          (o1, o2)
      }
      (name, on, off, fired)
    }
    val calibEnd = Bench.calibMs()
    def r(s: Double): String =
      BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toString
    val qs = rows.map { case (n, on, off, fired) =>
      s""""$n":{"on":${r(on)},"off":${r(off)},"speedup":${
        r(off / math.max(on, 1e-9))},"fired":$fired}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"nav_onoff","calib_ms":[$calibStart,$calibEnd],"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (anyUnfired) sys.exit(3)
  }
}
