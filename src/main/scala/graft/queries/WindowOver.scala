package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** OVER-window inventory (SURVEY §2.3 over windows / §2.4
  * DataStreamOverAggregate batch semantics).
  *
  * Reference: Table API `Over partitionBy 'k orderBy 'rowtime preceding
  * N.rows/RANGE` (`flink-table/.../api/windows.scala:29`) and the six
  * streaming OVER runtimes (`runtime/aggregate/RowTimeBoundedRowsOver` etc.,
  * SURVEY §2.4). Batch mapping is Spark's native `Window.partitionBy.orderBy
  * .rowsBetween/rangeBetween`; each query pins one frame shape. Ordering keys
  * always end in a unique column so frames are deterministic cross-engine.
  */
object WindowOver extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ranking family over a per-customer order history
    "over_ranking" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") % 20 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderpriority"))).as("rk"),
          dense_rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderpriority"))).as("drk"),
          ntile(4).over(w).as("quartile"))
    }),

    // lag/lead with defaults
    "over_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") % 20 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1, -1.0).over(w).as("next_price"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_orderdate"), col("o_orderkey"))
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)).as("last_ok"))
    }),

    // ROWS frame: running + sliding sums (exact decimal then double)
    "over_rows_frame" -> ((s, dir) => {
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") % 20 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice")))
            .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("run_sum"),
          sum(dec2(col("o_totalprice")))
            .over(ord.rowsBetween(-2, Window.currentRow))
            .cast("double").as("sum_3"),
          count(lit(1))
            .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("run_cnt"))
    }),

    // RANGE frame over an integer key: peers aggregate together
    "over_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").cast("int"))
        .rangeBetween(-5, 0)
      t(s, dir, "lineitem").filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          count(lit(1)).over(w).as("peers_5"),
          sum(dec2(col("l_extendedprice"))).over(w).cast("double")
            .as("range_sum"))
    }),

    // distribution family: percent_rank / cume_dist (exact rational arith)
    "over_distribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer").filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    }),

    // grouped top-n (reference first(n) on grouped DataSet, DataSet.java:574)
    "over_topn_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    })
  )

  override def oracle: Map[String, String] = Map(
    "over_ranking" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rk,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drk,
        |  ntile(4) OVER w AS quartile
        |FROM orders WHERE o_custkey % 20 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "over_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1, -1.0) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders WHERE o_custkey % 20 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "over_rows_frame" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(SUM(${sqlDec2("o_totalprice")}) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
         |  CAST(SUM(${sqlDec2("o_totalprice")}) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_3,
         |  COUNT(*) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
         |FROM orders WHERE o_custkey % 20 = 0""".stripMargin,

    "over_range_frame" ->
      s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
         |  COUNT(*) OVER w AS peers_5,
         |  CAST(SUM(${sqlDec2("l_extendedprice")}) OVER w AS DOUBLE) AS range_sum
         |FROM lineitem WHERE l_orderkey % 50 = 0
         |WINDOW w AS (PARTITION BY l_returnflag
         |  ORDER BY CAST(l_quantity AS INT)
         |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)""".stripMargin,

    "over_distribution" ->
      """SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer WHERE c_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""".stripMargin,

    "over_topn_per_group" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin
  )
}
