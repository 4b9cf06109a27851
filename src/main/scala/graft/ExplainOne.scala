package graft

/** Dev instrument: print the formatted physical plan of one registered
  * query (`SPARK_GRAFT_ONLY=<name>`, default q_sim_ann_kmeans) at
  * `SPARK_GRAFT_SF_DIR` — the .explain loop the brief prescribes,
  * runnable without a REPL. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val name = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q_sim_ann_kmeans")
    val spark = Sessions.local("graft-explain")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
