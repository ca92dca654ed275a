package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Udx

/** User-defined function inventory (SURVEY §2.5/§2.6 user-defined surface).
  */
object UdxQueries extends QuerySet {

  private def prep(s: SparkSession, dir: String): Unit = {
    Tables.registerAll(s, dir)
    Udx.register(s)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scalar UDF from BOTH API paths: SQL call + DataFrame call_function
    "udf_scalar" -> ((s, dir) => {
      prep(s, dir)
      s.sql("""SELECT c_custkey, acct_band(c_acctbal) AS band
              |FROM customer""".stripMargin)
    }),

    // typed Aggregator UDAF (grouped + SQL syntax)
    "udaf_range" -> ((s, dir) => {
      prep(s, dir)
      s.sql("""SELECT c_nationkey, range_agg(c_acctbal) AS bal_range
              |FROM customer GROUP BY c_nationkey""".stripMargin)
    }),

    // UDTF: lateral view over a UDF-returned array (TableFunction join)
    "udtf_lateral" -> ((s, dir) => {
      prep(s, dir)
      s.sql("""SELECT DISTINCT o_orderpriority, part
              |FROM orders
              |LATERAL VIEW explode(split_parts(o_orderpriority)) AS part
              |""".stripMargin)
    })
  )

  override def oracle: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 3000 THEN 'low'
        |       WHEN c_acctbal < 7000 THEN 'mid'
        |       ELSE 'high' END AS band
        |FROM customer""".stripMargin,

    "udaf_range" ->
      """SELECT c_nationkey, MAX(c_acctbal) - MIN(c_acctbal) AS bal_range
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "udtf_lateral" ->
      """SELECT DISTINCT o_orderpriority, u.part
        |FROM orders, unnest(string_split(o_orderpriority, '-')) u(part)""".stripMargin
  )
}
