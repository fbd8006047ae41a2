package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is declared once in
  * `graft.queries.Q.registry` (Spark build + DuckDB oracle); this
  * object just exposes the registry in the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the signature interval-join segmentation (J1) rolled up PSTH-style. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_event_window_segment")(spark, s"${Q.testdataRoot}/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (linear-algebra kernels) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    Q.registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Headline queries for the benchmark loop. */
  def headlines: Seq[String] = Q.registry.filter(_.headline).map(_.name)
}
