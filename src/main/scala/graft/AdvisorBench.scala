package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Advisor end-to-end payoff measurement (VERDICT r16 item 4): feed
  * [[graft.plans.RollupAdvisor]] a dashboard workload, MATERIALIZE its
  * recommended summaries via [[graft.plans.RollupBuild]] (the advisor's
  * output is the build worklist — this main is the proof the two APIs
  * actually compose), then time every covered query rewrite-ON vs
  * rewrite-OFF at the fixture `SPARK_GRAFT_SF_DIR` points to — the
  * number that justifies the advisor's existence, same protocol as
  * [[NavBench]] (untimed warmup, min-of-2 warm, calibration probes,
  * and a fired-check that exits nonzero if any covered query failed
  * to ride its proposed summary).
  *
  * The workload is the everyday q_agg_* dashboard family over TWO fact
  * tables (lineitem day/flag/status grains; orders priority/day
  * grains), written exactly as a user would write them — the advisor
  * extracts grains from the analyzed plans, absorbs subset grains into
  * maximal ones, and the build costs are reported PER SUMMARY so the
  * amortization argument (one ingest-time build, every dashboard query
  * thereafter reads cells) is visible in the same JSON line.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/tmp/sf1gk sbt "runMain
  * graft.AdvisorBench"`. Prints ONE JSON line:
  * `{"metric":"advisor_onoff","calib_ms":[s,e],"builds":[{"dims":…,
  * "cells":n,"rows":n,"build_sec":s}],"queries":{name:{"on":s,
  * "off":s,"speedup":x,"fired":b}},"sf":dir}`. */
object AdvisorBench {

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
    val spark = Sessions.local("graft-advisorbench")
    import spark.implicits._

    val li = Tables.read(spark, sfDir, "lineitem")
    val or = Tables.read(spark, sfDir, "orders")
    // the covered dashboard workload — measures spelled with the
    // explicit double cast the navigator's AVG/stats algebra supports,
    // exactly as the gated q_agg_rollup_* family writes them
    val workload: Seq[(String, () => DataFrame)] = Seq(
      "w1_flag_totals" -> (() => li.groupBy($"l_returnflag")
        .agg(sum($"l_quantity".cast("double")).as("sum_qty"),
          avg($"l_extendedprice".cast("double")).as("avg_price"),
          count(lit(1)).as("n"))),
      "w2_day_flag" -> (() => li
        .groupBy(to_date($"l_shipdate").as("d"), $"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"l_extendedprice".cast("double")).as("s"))),
      "w3_day_stats" -> (() => li
        .groupBy(to_date($"l_shipdate").as("d"))
        .agg(avg($"l_extendedprice".cast("double")).as("a"),
          stddev_samp($"l_quantity".cast("double")).as("sd"))),
      "w4_status_extremes" -> (() => li.groupBy($"l_linestatus")
        .agg(max($"l_quantity".cast("double")).as("mx"),
          min($"l_extendedprice".cast("double")).as("mn"),
          count(lit(1)).as("n"))),
      "w5_prio_day" -> (() => or
        .groupBy($"o_orderpriority", to_date($"o_orderdate").as("d"))
        .agg(sum($"o_totalprice".cast("double")).as("s"),
          count(lit(1)).as("n"))),
      "w6_prio" -> (() => or.groupBy($"o_orderpriority")
        .agg(avg($"o_totalprice".cast("double")).as("a"),
          count(lit(1)).as("n"))))

    // 1) ADVISE — grains extracted from the analyzed plans
    val props = plans.RollupAdvisor.propose(workload.map(_._2()))
    // 2) BUILD the worklist — RollupAdvisor renders resolved
    // expressions as SQL, expr() parses them back onto the base (the
    // E359-locked round trip); measures get positional cell prefixes
    val baseFor = Map(
      plans.RollupRewrite.pathOf(li).get -> li,
      plans.RollupRewrite.pathOf(or).get -> or)
    val builds = props.map { p =>
      val base = baseFor(p.basePath)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-advisor-cells").toString
      val t0 = System.nanoTime()
      plans.RollupBuild.materialize(spark, base, dir,
        dims = p.dims.zipWithIndex.map { case (s, i) =>
          s"d$i" -> expr(s) },
        measures = p.measures.zipWithIndex.map { case (s, i) =>
          s"m$i" -> expr(s) })
      val buildSec = (System.nanoTime() - t0) / 1e9
      val cells = spark.read.parquet(dir).count()
      val rows = base.count()
      (p, buildSec, cells, rows)
    }

    // 3) MEASURE every workload query on/off, NavBench protocol
    workload.foreach { case (n, mk) =>
      try mk().count()
      catch { case e: Throwable =>
        System.err.println(s"[advisorbench] warmup ERR $n: " +
          e.getMessage)
      }
    }
    val calibStart = Bench.calibMs()
    var anyUnfired = false
    val rows = workload.map { case (name, mk) =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      val probe = mk()
      probe.count()
      val fired = scans(probe.queryExecution.executedPlan)
        .exists(_.contains("graft-advisor-cells"))
      if (!fired) {
        anyUnfired = true
        System.err.println(s"[advisorbench] UNFIRED at $sfDir: $name")
      }
      val on = math.min(timed(), timed())
      spark.conf.set(plans.RollupRewrite.EnabledConf, "false")
      val off =
        try math.min(timed(), timed())
        finally spark.conf.unset(plans.RollupRewrite.EnabledConf)
      (name, on, off, fired)
    }
    val calibEnd = Bench.calibMs()
    def r(s: Double): String =
      BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toString
    val bjson = builds.map { case (p, sec, cells, nRows) =>
      s"""{"dims":"${p.dims.mkString(",")}","covered":${
        p.queriesCovered},"cells":$cells,"rows":$nRows,"build_sec":${
        r(sec)}}"""
    }.mkString("[", ",", "]")
    val qjson = rows.map { case (n, on, off, fired) =>
      s""""$n":{"on":${r(on)},"off":${r(off)},"speedup":${
        r(off / math.max(on, 1e-9))},"fired":$fired}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"advisor_onoff","calib_ms":[$calibStart,$calibEnd],"builds":$bjson,"queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
    if (anyUnfired) sys.exit(3)
  }
}
