package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Join operator inventory (SURVEY §2.1 join/coGroup/cross rows).
  *
  * Covers the reference's DataSet join surface — equi inner/outer joins with
  * broadcast/repartition hints (`flink-java/.../api/java/DataSet.java:751-971`,
  * `operators/JoinOperator.java:98`), semi/anti via Table-API exists, coGroup
  * (`operators/CoGroupOperator.java:67`), cross (`CrossOperator.java:77`), and
  * the single-row theta join (`flink-table/.../plan/nodes/dataset/
  * DataSetSingleRowJoin.scala:42`). Spark-first: equi joins shuffle on keys or
  * broadcast small sides (AQE decides; explicit hints shown where the
  * reference exposes them), the scalar-subquery theta join becomes a
  * BroadcastNestedLoopJoin of a single-row aggregate.
  */
object Joins extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // inner equi join (shuffle or broadcast chosen by Catalyst/AQE)
    "join_inner" -> ((s, dir) => {
      t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
    }),

    // broadcast hint (reference joinWithTiny / BROADCAST_HASH hints)
    "join_broadcast" -> ((s, dir) => {
      t(s, dir, "customer").join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_name"), col("n_name"))
    }),

    // sort-merge hint (reference REPARTITION_SORT_MERGE)
    "join_sort_merge" -> ((s, dir) => {
      t(s, dir, "orders").hint("merge").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
    }),

    // left outer: all high-balance customers, their big orders if any
    "join_left_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9500)
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                col("o_totalprice"))
    }),

    // right outer (mirror of left)
    "join_right_outer" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9500)
      o.join(c, col("c_custkey") === col("o_custkey"), "right_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                col("o_totalprice"))
    }),

    // full outer over per-nation aggregates with unmatched rows on both sides
    "join_full_outer" -> ((s, dir) => {
      val su = t(s, dir, "supplier").filter(col("s_acctbal") > 8000)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      val cu = t(s, dir, "customer").filter(col("c_acctbal") < 500)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      su.join(cu, col("s_nationkey") === col("c_nationkey"), "full_outer")
        .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("n_key"),
                coalesce(col("n_supp"), lit(0L)).as("n_supp"),
                coalesce(col("n_cust"), lit(0L)).as("n_cust"))
    }),

    // left semi (EXISTS)
    "join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // left anti (NOT EXISTS): customers with no very large order
    "join_anti" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 490000)
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // cartesian product (reference `cross`) — kept small on purpose
    "join_cross" -> ((s, dir) => {
      val r = t(s, dir, "region")
      val st = t(s, dir, "orders").select(col("o_orderstatus")).distinct()
      r.crossJoin(st).select(col("r_name"), col("o_orderstatus"))
    }),

    // single-row theta join: price vs a scalar aggregate (reference
    // DataSetSingleRowJoin → BroadcastNestedLoopJoin in Spark)
    "join_single_row_theta" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val avgPrice = l.agg(davg(col("l_extendedprice")).as("avg_price"))
      l.crossJoin(avgPrice)
        .filter(col("l_extendedprice") > lit(1.95) * col("avg_price"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    }),

    // coGroup (reference CoGroupOperator): per-key paired group counts via
    // Dataset.cogroup — keys from either side, zero count for missing side
    "cogroup_counts" -> ((s, dir) => {
      import s.implicits._
      val su = t(s, dir, "supplier").select(col("s_nationkey").cast("int"),
        col("s_acctbal")).as[(Int, Double)].groupByKey(_._1)
      val cu = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").cast("int"), col("c_acctbal"))
        .as[(Int, Double)].groupByKey(_._1)
      su.cogroup(cu) { case (k, s1, s2) =>
        Iterator((k, s1.size.toLong, s2.size.toLong))
      }.toDF("n_key", "n_supp", "n_cust")
    }),

    // as-of joins (point-in-time feature attachment): each click gets the
    // nearest purchase of the same user — one union+sort pass, no range join
    // (operators/AsofJoin.scala). Purchases pre-aggregated to unique
    // (user_id, ts) per the operator contract.
    "join_asof_backward" -> ((s, dir) => asofClicksPurchases(s, dir, "back")),
    "join_asof_forward" -> ((s, dir) => asofClicksPurchases(s, dir, "fwd")),
    "join_asof_tolerance" -> ((s, dir) => asofClicksPurchases(s, dir, "tol"))
  )

  private def asofClicksPurchases(s: SparkSession, dir: String,
                                  mode: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(count(lit(1)).as("n_p"),
        max(dec2(col("value"))).cast("double").as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val joined = mode match {
      case "back" => graft.operators.AsofJoin.backward(
        clicks, purchases, "user_id", "ts", "ts")
      case "fwd" => graft.operators.AsofJoin.forward(
        clicks, purchases, "user_id", "ts", "ts")
      case "tol" => graft.operators.AsofJoin.backward(
        clicks, purchases, "user_id", "ts", "ts",
        tolerance = Some("INTERVAL 1 HOUR"))
    }
    joined.select(col("event_id"), col("user_id"),
      col("asof._t").as("asof_ts"),
      coalesce(col("asof.p_value"), lit(-1.0)).as("p_value"),
      coalesce(col("asof.n_p"), lit(0L)).as("n_p"))
  }

  override def oracle: Map[String, String] = {
    val innerSql =
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000""".stripMargin
    Map(
      "join_inner" -> innerSql,
      "join_sort_merge" -> innerSql,
      "join_broadcast" ->
        """SELECT c_custkey, c_name, n_name
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |WHERE c_acctbal > 9000""".stripMargin,
      "join_left_outer" ->
        """SELECT c_custkey, c_name, o_orderkey, o_totalprice
          |FROM (SELECT * FROM customer WHERE c_acctbal > 9500) c
          |LEFT OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
          |  ON c_custkey = o_custkey""".stripMargin,
      "join_right_outer" ->
        """SELECT c_custkey, c_name, o_orderkey, o_totalprice
          |FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
          |RIGHT OUTER JOIN (SELECT * FROM customer WHERE c_acctbal > 9500) c
          |  ON c_custkey = o_custkey""".stripMargin,
      "join_full_outer" ->
        """SELECT COALESCE(s.s_nationkey, c.c_nationkey) AS n_key,
          |       COALESCE(s.n_supp, 0) AS n_supp,
          |       COALESCE(c.n_cust, 0) AS n_cust
          |FROM (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
          |      WHERE s_acctbal > 8000 GROUP BY s_nationkey) s
          |FULL OUTER JOIN
          |     (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
          |      WHERE c_acctbal < 500 GROUP BY c_nationkey) c
          |  ON s.s_nationkey = c.c_nationkey""".stripMargin,
      "join_semi" ->
        """SELECT c_custkey, c_name FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders
          |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin,
      "join_anti" ->
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders
          |  WHERE o_custkey = c_custkey AND o_totalprice > 490000)""".stripMargin,
      "join_cross" ->
        """SELECT r_name, o_orderstatus
          |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t""".stripMargin,
      "join_single_row_theta" ->
        s"""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
           |WHERE l_extendedprice > 1.95 * (
           |  SELECT ${sqlDavg("l_extendedprice")} FROM lineitem)""".stripMargin,
      "cogroup_counts" ->
        """SELECT COALESCE(s.k, c.k) AS n_key,
          |       COALESCE(s.n, 0) AS n_supp, COALESCE(c.n, 0) AS n_cust
          |FROM (SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY 1) s
          |FULL OUTER JOIN
          |     (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer
          |      WHERE c_acctbal > 9000 GROUP BY 1) c
          |  ON s.k = c.k""".stripMargin,
      "join_asof_backward" ->
        s"""$asofCte
           |SELECT c.event_id, c.user_id, p.ts AS asof_ts,
           |  COALESCE(p.p_value, -1) AS p_value, COALESCE(p.n_p, 0) AS n_p
           |FROM c ASOF LEFT JOIN p
           |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
      "join_asof_forward" ->
        s"""$asofCte
           |SELECT c.event_id, c.user_id, p.ts AS asof_ts,
           |  COALESCE(p.p_value, -1) AS p_value, COALESCE(p.n_p, 0) AS n_p
           |FROM c ASOF LEFT JOIN p
           |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin,
      "join_asof_tolerance" ->
        s"""$asofCte
           |SELECT c.event_id, c.user_id,
           |  CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR THEN p.ts END AS asof_ts,
           |  COALESCE(CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
           |           THEN p.p_value END, -1) AS p_value,
           |  COALESCE(CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
           |           THEN p.n_p END, 0) AS n_p
           |FROM c ASOF LEFT JOIN p
           |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin
    )
  }

  /** Shared as-of oracle prelude: clicks + purchases unique per (user, ts). */
  private val asofCte =
    """WITH p AS (SELECT user_id, ts, COUNT(*) AS n_p,
      |             CAST(MAX(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS p_value
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |     c AS (SELECT event_id, user_id, ts
      |           FROM events WHERE event_type = 'click')""".stripMargin
}
