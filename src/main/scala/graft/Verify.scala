package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure is loud (VERDICT r1 item 2): any query that throws or writes no
  * output is reported and the process exits nonzero — a broken query can
  * no longer produce a plausible-looking CORRECTNESS artifact. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, argOnly) = args.toSeq match {
      case Seq(sf, out)          => (sf, out, Set.empty[String])
      case Seq(sf, out, rest @ _*) => (sf, out, rest.toSet)
    }
    // dev-loop filter parity with Bench: SPARK_GRAFT_ONLY names
    // queries when no extra args do (the driver passes neither, so
    // round artifacts are always full-sweep)
    val only =
      if (argOnly.nonEmpty) argOnly
      else sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty[String])
    val spark = Sessions.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    var failed = List.empty[String]
    // Optional extra args name specific queries (dev iteration only —
    // the driver always passes exactly (sfDir, outDir) and gets the
    // full sweep).
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        if (!Files.exists(Paths.get(s"$outDir/$name/_SUCCESS")))
          throw new IllegalStateException("no _SUCCESS marker written")
      } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] FAIL $name: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // no cached relation outlives the sweep (VERDICT r10 item 5)
    graft.queries.Extras.releaseCacheReuse(spark)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} queries FAILED: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
