package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Second TPC-H wave — query shapes the first spine doesn't cover:
  * EXISTS-driven counting (Q4), CASE-sum shares (Q12/Q14), OR-of-ANDs
  * predicate pushdown (Q19), grouped-having anti pattern (Q21-lite).
  */
object Tpch2 extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q4 shape: order-priority counts over orders with at least one late line
    "q04_order_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val late = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey")).distinct()
      o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q12 shape: shipping-mode-ish CASE sums by priority band
    "q12_priority_shipping" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      t(s, dir, "orders")
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    }),

    // Q14 shape: promo revenue share — conditional exact-decimal ratio
    "q14_promo_share" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      l.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type").startsWith("PROMO"),
            dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") * 100.0 /
            sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
              .cast("double")).as("promo_share"))
    }),

    // Q19 shape: OR-of-ANDs join predicate (disjunctive pushdown)
    "q19_disjunctive" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey") &&
        ((col("p_brand") === "Brand#11" && col("l_quantity").between(1, 11) &&
          col("p_size").between(1, 5)) ||
         (col("p_brand") === "Brand#22" && col("l_quantity").between(10, 20) &&
           col("p_size").between(1, 10)) ||
         (col("p_brand") === "Brand#25" && col("l_quantity").between(20, 30) &&
           col("p_size").between(1, 15))))
        .agg(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Q21-lite shape: suppliers with a majority of late lines (grouped
    // HAVING over conditional counts — exact integer comparison)
    "q21_late_majority_suppliers" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_shipdate") > lit("1998-06-01").cast("timestamp"), 1L)
            .otherwise(0L)).as("n_late"))
        .filter(col("n_late") * 2 > col("n_lines"))
        .select(col("l_suppkey"), col("n_lines"), col("n_late"))
    }),

    // Q22 shape: positive-balance customers of selected nations above the
    // set's exact mean balance, with no orders (anti join + scalar subquery)
    "q22_global_sales_opportunity" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_nationkey, COUNT(*) AS numcust,
              |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
              |    AS totacctbal_cents
              |FROM customer c
              |WHERE c_nationkey IN (1, 3, 5, 7, 9)
              |  AND CAST(round(c_acctbal * 100) AS BIGINT) > (
              |    SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
              |        AS DOUBLE) / COUNT(*)
              |    FROM customer
              |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
              |  AND NOT EXISTS (
              |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              |      AND o.o_totalprice > 400000)
              |GROUP BY c_nationkey""".stripMargin)
    }),

    // join-strategy hint surface: force shuffle-hash (reference
    // REPARTITION_HASH JoinHint)
    "join_shuffle_hash" -> ((s, dir) => {
      val o = t(s, dir, "orders").hint("shuffle_hash")
      t(s, dir, "customer").join(o, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > TIMESTAMP '1997-01-01')
        |GROUP BY o_orderpriority""".stripMargin,

    "q12_priority_shipping" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,

    "q14_promo_share" ->
      s"""SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
         |    THEN ${sqlDec2("l_extendedprice")} * ${sqlOneMinus("l_discount")}
         |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
         |  / CAST(SUM(${sqlDec2("l_extendedprice")}
         |      * ${sqlOneMinus("l_discount")}) AS DOUBLE) AS promo_share
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q19_disjunctive" ->
      s"""SELECT ${sqlRevenueSum("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11
         |        AND p_size BETWEEN 1 AND 5)
         |   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 20
         |        AND p_size BETWEEN 1 AND 10)
         |   OR (p_brand = 'Brand#25' AND l_quantity BETWEEN 20 AND 30
         |        AND p_size BETWEEN 1 AND 15)""".stripMargin,

    "q21_late_majority_suppliers" ->
      """SELECT l_suppkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CASE WHEN l_shipdate > TIMESTAMP '1998-06-01'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING SUM(CASE WHEN l_shipdate > TIMESTAMP '1998-06-01'
        |           THEN 1 ELSE 0 END) * 2 > COUNT(*)""".stripMargin,

    "q22_global_sales_opportunity" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS totacctbal_cents
        |FROM customer c
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |  AND CAST(round(c_acctbal * 100) AS BIGINT) > (
        |    SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
        |        AS DOUBLE) / COUNT(*)
        |    FROM customer
        |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice > 400000)
        |GROUP BY c_nationkey""".stripMargin,

    "join_shuffle_hash" ->
      s"""SELECT c_nationkey, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_nationkey""".stripMargin
  )
}
