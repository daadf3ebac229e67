package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry aggregated from the per-category query objects under
  * [[graft.queries]]. Every entry with a DuckDB-expressible semantics
  * also appears in [[oracleSql]]; the rest get the driver's weaker
  * rows-only check.
  */
object SparkEntry {

  private val registry: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] =
    q.Relational.all ++ q.PipelineQ.all ++ q.ExtQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, (fn, _)) => n -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, (_, Some(sql))) => n -> sql }.toMap
}
