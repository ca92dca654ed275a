package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** TPC-H-style relational spine over the fixture star schema.
  *
  * These mirror the reference's own representative relational workloads
  * (proteus-engine `flink-examples-batch/.../relational/TPCHQuery3.java` and
  * `TPCHQuery10.java`, `flink-examples-table/.../TPCHQuery3Table.scala`),
  * adapted to the driver fixture columns. Declarative DataFrame plans: filters
  * and projections reach the parquet scan, joins shuffle on keys (small dims
  * broadcast automatically under AQE), aggregation is partial+final.
  */
object Tpch extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 analog: pricing summary — wide agg with exact-decimal sums.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")) *
              onePlus(col("l_tax"))).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          (sum(rate(col("l_discount"))).cast("double") / count(col("l_discount")))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q3 analog: shipping priority — 3-way join, agg, top-10.
    "q03_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // Q5 analog: local supplier volume — 6-way join keyed through the star.
    "q05_local_supplier_volume" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      r.join(n, col("n_regionkey") === col("r_regionkey"))
        .join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
                  col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q6 analog: forecast revenue — pure scan+filter+agg (pushdown showcase).
    "q06_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
                col("l_discount").between(0.03, 0.07) &&
                col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("double").as("revenue"))
    }),

    // Q10 analog: returned items — join + group + top-20 by revenue.
    "q10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") <  lit("1997-07-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      c.join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })
  )

  private val rev = sqlRevenueSum("l_extendedprice", "l_discount")

  override def oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  $rev AS sum_disc_price,
         |  CAST(SUM(${sqlDec2("l_extendedprice")} * ${sqlOneMinus("l_discount")} * ${sqlOnePlus("l_tax")}) AS DOUBLE) AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  CAST(SUM(${sqlRate("l_discount")}) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, $rev AS revenue, o_orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

    "q05_local_supplier_volume" ->
      s"""SELECT n_name, $rev AS revenue
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_forecast_revenue" ->
      s"""SELECT CAST(SUM(${sqlDec2("l_extendedprice")} * ${sqlRate("l_discount")}) AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.03 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $rev AS revenue
         |FROM customer
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin
  )
}
