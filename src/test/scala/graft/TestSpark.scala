package graft

import org.apache.spark.sql.SparkSession

/** One shared local session + fixture path for every suite (suites run
  * in one forked JVM; getOrCreate makes this safe across them). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("graft-test")
  val sf = "/root/testdata/sf0.001"
}
