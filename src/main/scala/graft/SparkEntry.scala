package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Tables._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY §2 that is implemented registers one query
  * here and (when SQL-expressible) a DuckDB oracle with IDENTICAL column
  * aliases. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * TPC-H-Q1-shaped filter→groupBy→multi-agg over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_quantity") > 5)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        exactMean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private lazy val allQ: Seq[Q] =
    RelationalQueries.all ++ PreprocessQueries.all ++ AnalyticsQueries.all ++
    TextQueries.all ++ SimilarityQueries.all ++ StreamingQueries.all ++
    ExtraQueries.all ++ MLQueries.all ++ ScoringQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.build).toMap

  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
