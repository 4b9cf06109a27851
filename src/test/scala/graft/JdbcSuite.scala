package graft

import java.sql.DriverManager

import graft.sources.Jdbc
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S5 JDBC source against the embedded Derby on the Spark classpath —
  * an in-JVM RDBMS, so the partitioned-read contract is testable with
  * zero network. The fixture mimics the reference's observation_fact
  * keyed by patient_num (the partition column a site would use). */
class JdbcSuite extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE observation_fact (
          |  patient_num BIGINT NOT NULL,
          |  concept_cd VARCHAR(50) NOT NULL,
          |  nval_num DOUBLE
          |)""".stripMargin)
      val ins = conn.prepareStatement(
        "INSERT INTO observation_fact VALUES (?, ?, ?)")
      (1 to 200).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setString(2, if (i % 3 == 0) "LAB:crp" else "DIAG:x")
        ins.setDouble(3, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("partitioned JDBC read: all rows, requested parallelism") {
    seeded
    val df = Jdbc.readPartitioned(spark, url, "observation_fact",
      "patient_num", 1L, 200L, 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 200L)
    // stride boundaries lose nothing: sum of keys is exact
    assert(df.agg(sum($"patient_num")).head().getLong(0) ===
      (1L to 200L).sum)
  }

  test("auto-bounds partitioned read matches explicit bounds") {
    seeded
    val auto = Jdbc.readPartitionedAuto(spark, url, "observation_fact",
      "patient_num", 4)
    assert(auto.rdd.getNumPartitions === 4)
    assert(auto.count() === 200L)
  }

  test("filter + projection push into the JDBC scan") {
    seeded
    val df = Jdbc.readPartitioned(spark, url, "observation_fact",
      "patient_num", 1L, 200L, 4)
      .filter($"CONCEPT_CD" === "LAB:crp")
      .select($"PATIENT_NUM")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("CONCEPT_CD"))
    assert(df.count() === 66L) // multiples of 3 in 1..200
  }

  test("JDBC write round-trips through Derby") {
    seeded
    val out = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    Jdbc.writeTable(out, url, "computed_out", SaveMode.Overwrite)
    val back = Jdbc.readTable(spark, url, "computed_out")
    assert(back.count() === 2L)
    assert(back.agg(sum($"V")).head().getDouble(0) === 30.0)
  }

  test("empty table: auto-bounds degrades to a single clean read") {
    seeded
    val conn = DriverManager.getConnection(url)
    try conn.createStatement()
      .executeUpdate("CREATE TABLE empty_t (k BIGINT)")
    finally conn.close()
    val df = Jdbc.readPartitionedAuto(spark, url, "empty_t", "k", 4)
    assert(df.count() === 0L)
  }
}
