package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-area [[graft.queries.QuerySet]] registries;
  * each entry has a Spark implementation and (where SQL-expressible) a DuckDB
  * oracle over the same parquet tables.
  */
object SparkEntry {

  /** All query sets, in SURVEY §2 inventory order. */
  def sets: Seq[QuerySet] = Seq(
    Tpch,
    Tpch2,
    Tpch3,
    Aggregates,
    Joins,
    SetOps,
    ScalarFuncs,
    WindowOver,
    TimeWindows,
    Correlate,
    TextAnalysis,
    Dedup,
    Similarity,
    BatchCore,
    TypedOps,
    Streaming,
    CepQueries,
    GraphQueries,
    MlQueries,
    IoQueries,
    TableApi,
    UdxQueries,
    AsyncQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.queries("q03_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    sets.flatMap(_.oracle).toMap
}
