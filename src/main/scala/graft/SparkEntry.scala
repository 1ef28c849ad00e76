package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All driver-checkable queries, grouped by area. */
  def queryDefs: Seq[QueryDef] =
    operators.Relational.all ++
      operators.Functions.all ++
      operators.Pipeline.all ++
      operators.Formats.all ++
      operators.Streaming.all ++
      operators.Scale.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queryDefs.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    queryDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
