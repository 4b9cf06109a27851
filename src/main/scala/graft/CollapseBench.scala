package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collapse-factor-honest measurement of the join-back PRE-AGGREGATE
  * (VERDICT r17 item 6): the round-17 fixture was provably neutral —
  * its (priority × custkey) summary collapses only ~2.2× to custkey
  * grain, so merging cells below the join saves ~nothing and the
  * regime guard's 0.74×-regression catch was the headline. Real
  * (day × key) summaries collapse 10²–10³× (years of days per key),
  * and THAT is the regime the pre-aggregate exists for. This main
  * builds exactly that fixture and measures the three shapes head to
  * head:
  *
  *  - fact: KEYS × DAYS × R deterministic rows (spark.range — no
  *    entropy), one summary at (day, key) grain → collapse factor
  *    cells/keys = DAYS.
  *  - dim: key → segment, merge-hinted into the join (the shuffle
  *    regime the guard keys on; a hint rather than dim bulk so the
  *    fixture stays small — the guard honors SHUFFLE_MERGE
  *    explicitly).
  *  - A "preagg_on": the user query through the navigator — summary
  *    scan, cells MERGED to key grain below the join (the fired-check
  *    asserts the below-join Aggregate and exits nonzero if absent).
  *  - B "joinback_plain": the same join-back spelled manually WITHOUT
  *    the pre-aggregate — every (day × key) cell rides the join
  *    shuffle. The A/B delta is the pre-aggregate's isolated value.
  *  - C "rule_off": navigator disabled — the raw fact scan pays the
  *    join.
  *
  * Protocol: untimed warmups, then `SPARK_GRAFT_NAV_ALT` (default 5)
  * interleaved A/B/C rounds with MEDIANS (the round-17 lesson:
  * single-pass join-back numbers swing up to 4× on this host),
  * calibration probes bracketing the block. Prints ONE JSON line.
  *
  * Usage: `SPARK_DRIVER_MEM=48g sbt "runMain graft.CollapseBench"`
  * (self-contained fixture; SPARK_GRAFT_SF_DIR unused). */
object CollapseBench {

  private val KEYS = 20000L
  private val DAYS = 1000L
  private val R = 3L // rows per (key, day) cell

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-collapsebench")
    import spark.implicits._

    val root = java.nio.file.Files
      .createTempDirectory("graft-collapse").toString
    val factDir = s"$root/fact"
    val dimDir = s"$root/dim"
    val cellsDir = s"$root/cells"

    val t0 = System.nanoTime()
    spark.range(0, KEYS * DAYS * R)
      .select(
        (col("id") % KEYS).as("key"),
        date_add(to_date(lit("2020-01-01")),
          ((col("id") / KEYS) % DAYS).cast("int")).as("day"),
        ((col("id") % 9973L).cast("double") / 100.0d).as("v"))
      .write.mode("overwrite").parquet(factDir)
    spark.range(0, KEYS)
      .select(col("id").as("key"),
        concat(lit("seg_"), col("id") % 25).as("segment"))
      .write.mode("overwrite").parquet(dimDir)
    val genSec = (System.nanoTime() - t0) / 1e9

    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir)
    val t1 = System.nanoTime()
    plans.RollupBuild.materialize(spark, fact, cellsDir,
      dims = Seq("day" -> fact("day"), "key" -> fact("key")),
      measures = Seq("v" -> fact("v")))
    val buildSec = (System.nanoTime() - t1) / 1e9
    val summary = spark.read.parquet(cellsDir)
    val nCells = summary.count()
    val collapse = nCells.toDouble / KEYS

    // A: the user query — the navigator redirects to cells and (in
    // the hinted shuffle regime) pre-aggregates them to key grain
    // below the join
    def qA(): DataFrame = fact
      .join(dim.hint("merge"), Seq("key"))
      .groupBy($"segment")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
    // B: the identical join-back WITHOUT the pre-aggregate — cells
    // ride the join shuffle at (day × key) grain, merged only above
    def qB(): DataFrame = summary
      .join(dim.hint("merge"), Seq("key"))
      .groupBy($"segment")
      .agg(sum($"v_sum").as("s"), sum($"cnt").as("n"))
    // C: navigator off — the raw fact pays the join
    def qC(): DataFrame = qA()

    def timed(mk: () => DataFrame): Double = {
      val t = System.nanoTime()
      mk().count()
      (System.nanoTime() - t) / 1e9
    }
    def offTimed(): Double = {
      spark.conf.set(plans.RollupRewrite.EnabledConf, "false")
      try timed(() => qC())
      finally spark.conf.unset(plans.RollupRewrite.EnabledConf)
    }

    // correctness cross-check before any timing: all three shapes
    // must agree exactly
    def canon(df: DataFrame) = df.orderBy($"segment").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getLong(2))).toSeq
    val a0 = canon(qA())
    require(canon(qB()) == a0, "join-back plain disagrees with A")
    spark.conf.set(plans.RollupRewrite.EnabledConf, "false")
    val c0 = try canon(qC())
      finally spark.conf.unset(plans.RollupRewrite.EnabledConf)
    require(c0 == a0, "rule-off disagrees with A")

    // fired-check: A must scan the cells AND hold an Aggregate BELOW
    // the join (the pre-aggregate)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        Seq(f.relation.location.rootPaths.map(_.toString).mkString(","))
      case other => other.children.flatMap(scans)
    }
    val probe = qA()
    probe.count()
    val opt = probe.queryExecution.optimizedPlan
    val scansCells = scans(probe.queryExecution.executedPlan)
      .exists(_.contains("/cells"))
    val preAggBelowJoin = opt.collect { case j: Join => j }
      .exists(_.children.exists(_.exists {
        case _: Aggregate => true
        case _ => false
      }))
    if (!scansCells || !preAggBelowJoin)
      System.err.println(s"[collapsebench] UNFIRED: scansCells=" +
        s"$scansCells preAggBelowJoin=$preAggBelowJoin")

    // LOW-COLLAPSE CONTROL (round 19, VERDICT r18 item 5): the same
    // star shape over a summary whose grain collapses only 2× to key
    // grain — the measured-neutral band — must REFUSE the below-join
    // pre-aggregate (the collapse guard's second signal) while still
    // riding its cells. Separate fact path so the two registrations
    // never share a lattice (the coarser summary would otherwise
    // answer the main query outright).
    val fact2Dir = s"$root/fact2"
    val cells2Dir = s"$root/cells2"
    spark.range(0, KEYS * 2L * R)
      .select(
        (col("id") % KEYS).as("key"),
        ((col("id") / KEYS) % 2L).as("bucket"),
        ((col("id") % 9973L).cast("double") / 100.0d).as("v"))
      .write.mode("overwrite").parquet(fact2Dir)
    val fact2 = spark.read.parquet(fact2Dir)
    plans.RollupBuild.materialize(spark, fact2, cells2Dir,
      dims = Seq("bucket" -> fact2("bucket"), "key" -> fact2("key")),
      measures = Seq("v" -> fact2("v")))
    def qLow(): DataFrame = fact2
      .join(dim.hint("merge"), Seq("key"))
      .groupBy($"segment")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
    val lowProbe = qLow()
    val lowRows = canon(lowProbe)
    spark.conf.set(plans.RollupRewrite.EnabledConf, "false")
    val lowOff = try canon(qLow())
      finally spark.conf.unset(plans.RollupRewrite.EnabledConf)
    require(lowOff == lowRows, "low-collapse shape disagrees rule-off")
    val lowScansCells = scans(lowProbe.queryExecution.executedPlan)
      .exists(_.contains("/cells2"))
    val lowPreAgg = lowProbe.queryExecution.optimizedPlan
      .collect { case j: Join => j }
      .exists(_.children.exists(_.exists {
        case _: Aggregate => true
        case _ => false
      }))
    if (!lowScansCells || lowPreAgg)
      System.err.println(s"[collapsebench] LOW-COLLAPSE GUARD WRONG: " +
        s"scansCells=$lowScansCells preAggBelowJoin=$lowPreAgg " +
        "(must ride cells WITHOUT a below-join pre-aggregate)")

    Seq(() => qA(), () => qB()).foreach(mk => timed(mk)) // warm
    offTimed()
    val alt = sys.env.get("SPARK_GRAFT_NAV_ALT").flatMap(s =>
      scala.util.Try(s.trim.toInt).toOption).getOrElse(5)
    val calibStart = Bench.calibMs()
    val rounds = (1 to alt).map { _ =>
      (timed(() => qA()), timed(() => qB()), offTimed())
    }
    val calibEnd = Bench.calibMs()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2)
    }
    val (ma, mb, mc) = (median(rounds.map(_._1)),
      median(rounds.map(_._2)), median(rounds.map(_._3)))
    def r(s: Double): String =
      BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toString
    println(s"""{"metric":"collapse_onoff","calib_ms":[$calibStart,""" +
      s"""$calibEnd],"keys":$KEYS,"days":$DAYS,"rows":${KEYS * DAYS * R},""" +
      s""""cells":$nCells,"collapse":${r(collapse)},""" +
      s""""gen_sec":${r(genSec)},"build_sec":${r(buildSec)},""" +
      s""""preagg_on":${r(ma)},"joinback_plain":${r(mb)},""" +
      s""""rule_off":${r(mc)},""" +
      s""""preagg_speedup_vs_plain":${r(mb / math.max(ma, 1e-9))},""" +
      s""""preagg_speedup_vs_off":${r(mc / math.max(ma, 1e-9))},""" +
      s""""fired":${scansCells && preAggBelowJoin},""" +
      s""""low_collapse_refused":${lowScansCells && !lowPreAgg}}""")
    spark.stop()
    if (!scansCells || !preAggBelowJoin) sys.exit(3)
    if (!lowScansCells || lowPreAgg) sys.exit(4)
  }
}
