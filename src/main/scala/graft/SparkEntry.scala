package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers SURVEY §2's operator inventory: the relational
  * pass-through surface ([[RelationalQueries]], executed through the
  * transform/run_raw_sql templating path) and the operator-semantic suite
  * ([[OperatorQueries]], exercising loadFile/export/append/merge/checks/
  * flatten/dedup/similarity/text machinery). `oracleSql` carries the
  * DuckDB-equivalent SQL for every SQL-expressible query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, sfDir)
    new GraftSession(spark).sql(RelationalQueries.byName("q3_join_agg"))
  }

  private def relational: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => {
        Tables.registerAll(s, dir)
        new GraftSession(s).sql(sql)
      })
    }.toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational ++ OperatorQueries.queries ++ PipelineQueries.queries ++
      StreamingQueries.queries

  /** Benchmark-only queries — run (and scale-curve-tracked) by
    * [[Bench]] but excluded from the driver's correctness contract:
    * each is un-oracle-able in DuckDB and triangulated by a
    * hash-matched sibling in [[queries]]
    * (see [[PipelineQueries.benchOnlyQueries]]). */
  def benchOnlyQueries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.benchOnlyQueries

  def oracleSql: Map[String, String] =
    RelationalQueries.byName ++ OperatorQueries.oracleSql ++
      PipelineQueries.oracleSql ++ StreamingQueries.oracleSql
}
