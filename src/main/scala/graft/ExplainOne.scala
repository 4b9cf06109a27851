package graft

/** Dev instrument: print the formatted physical plan of registered
  * queries (`SPARK_GRAFT_ONLY=<name>[,<name>...]`, default
  * q_sim_ann_kmeans) at `SPARK_GRAFT_SF_DIR` — the .explain loop the
  * brief prescribes, runnable without a REPL. With an argument, plans
  * are written to `<arg>/<name>_<suffix>.txt` (suffix = second arg,
  * default "plan") instead of stdout — the round-20 plan-artifact
  * path (plans/r20/<query>_{before,after}.txt). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      "q_sim_ann_kmeans").split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = args.headOption
    val suffix = if (args.length > 1) args(1) else "plan"
    val spark = Sessions.local("graft-explain")
    names.foreach { name =>
      // "leg:" names dump non-registered sub-plans that a declared
      // query collects at construction time (invisible in its own
      // executed plan) — round 20: the scout tier's global ADC leg
      val df = name match {
        case "leg:scout_global" =>
          graft.queries.Surface18.scoutHits(spark, sfDir)
        case _ => SparkEntry.queries(name)(spark, sfDir)
      }
      // SPARK_GRAFT_EXEC=1 (round 21): execute the query through the
      // noop sink first and dump the AQE FINAL plan (ReusedExchange /
      // AQEShuffleRead nodes only exist there) — the pre-execution
      // explain shows isFinalPlan=false and cannot substantiate
      // runtime-reuse claims.
      val execFinal = sys.env.get("SPARK_GRAFT_EXEC").exists(_ == "1")
      val planStr =
        if (execFinal) {
          df.write.format("noop").mode("overwrite").save()
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      outDir match {
        case Some(dir) =>
          val p = java.nio.file.Paths.get(dir,
            s"${name.replace(':', '_')}_$suffix.txt")
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, planStr.getBytes("UTF-8"))
          System.err.println(s"[explain] wrote $p")
        case None => println(planStr)
      }
    }
    spark.stop()
  }
}
