package graft
/** Benchmark main: times `.count()` per declared query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. A query that throws is recorded as "err" (not a
  * fake duration — VERDICT r1 item 2) and the process exits nonzero. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    // untimed warmup: pay JVM/codegen/scan setup once, not inside the
    // first query's number
    try Tables.read(spark, sfDir, "lineitem").count()
    catch { case _: Throwable => () }
    var anyErr = false
    val results: Seq[(String, String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ERR $name: ${e.getMessage}")
            anyErr = true
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        (name, if (ok) sec.toString else "\"err\"", if (ok) sec else 0.0)
      }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (anyErr) sys.exit(1)
  }
}
