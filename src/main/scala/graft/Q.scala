package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query from SURVEY.md §2's operator inventory.
  *
  * @param name   key in `SparkEntry.queries`
  * @param fn     the Spark implementation; reads tables from `sfDir`
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables (None for non-SQL-expressible operators — the
  *               driver then records a weaker rows-only check; such
  *               queries get a ScalaTest oracle instead)
  *
  * Contract discipline (SURVEY.md §5.2): output column names identical on
  * both sides; a total-order ORDER BY (with tiebreaker) on both sides;
  * doubles rounded at the output edge; big double sums routed through
  * DECIMAL(18,6) so they are order-independent and exact on both engines.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Collect a module's queries into the two SparkEntry maps. */
  def queryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap
  def oracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
