package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.table._
import Exact._

/** Queries expressed through the ProteusTable façade (SURVEY §2.3) — same
  * oracle discipline as the rest of the suite; what's tested here is that
  * the fluent Table-API surface composes into correct Catalyst plans.
  */
object TableApi extends QuerySet {

  private def env(s: SparkSession, dir: String): TableEnv = {
    Tables.registerAll(s, dir)
    new TableEnv(s)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scan → filter → join → groupBy.select → orderBy/limit pipeline
    "table_api_pipeline" -> ((s, dir) => {
      val t = env(s, dir)
      val orders = t.scan("orders").filter(col("o_orderpriority") === "1-URGENT")
      val customer = t.scan("customer")
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .select(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy(col("c_mktsegment"))
        .toDF
    }),

    // insertInto (reference Table.insertInto:876): append into a saved
    // table, then read the table back — the oracle sees the TABLE content,
    // so green proves the write+append round trip, not just the plan
    "table_api_insert_into" -> ((s, dir) => {
      val t = env(s, dir)
      // a previous JVM's managed-table directory survives in the warehouse
      // while the (in-memory) catalog entry does not — saveAsTable then
      // refuses the location; drop both before writing
      s.sql("DROP TABLE IF EXISTS graft_ins_target")
      graft.sources.StagingFs.delete(s, new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_ins_target"))
      t.scan("nation").select(col("n_nationkey"), col("n_name"))
        .toDF.write.mode("overwrite").saveAsTable("graft_ins_target")
      t.scan("nation").filter(col("n_nationkey") < 5)
        .select(col("n_nationkey"), col("n_name"))
        .insertInto("graft_ins_target")
      s.table("graft_ins_target")
    }),

    // group-window DSL: Tumble over 1 hour
    "table_api_tumble" -> ((s, dir) => {
      val t = env(s, dir)
      t.fromDataFrame(Tables.load(s, dir, "events"))
        .window(Tumble over "1 hour" on "ts" as "w")
        .groupBy("w", "event_type")
        .select(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .toDF
        .select(col("w_start"), col("w_end"), col("event_type"),
          col("n"), col("sum_value"))
    }),

    // session-window DSL with per-user gap
    "table_api_session" -> ((s, dir) => {
      val t = env(s, dir)
      t.fromDataFrame(Tables.load(s, dir, "events"))
        .window(Session withGap "30 minutes" on "ts" as "w")
        .groupBy("w", "user_id")
        .select(count(lit(1)).as("n"))
        .toDF
        .select(col("w_start"), col("w_end"), col("user_id"), col("n"))
    }),

    // set ops + pagination through the façade
    "table_api_setops" -> ((s, dir) => {
      val t = env(s, dir)
      val hi = t.scan("customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_nationkey"))
      val building = t.scan("customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_nationkey"))
      hi.minus(building)
        .orderBy(col("c_custkey"))
        .offset(10).fetch(50)
        .toDF
    }),

    // over-window DSL
    "table_api_over" -> ((s, dir) => {
      val t = env(s, dir)
      val w = Over partitionBy col("o_custkey") orderBy
        (col("o_orderdate"), col("o_orderkey"))
      t.scan("orders").filter(col("o_custkey") % 25 === 0)
        .overWindow(w)(
          (lit(1), spec => row_number().over(spec).as("rn")),
          (lit(1), spec => sum(dec2(col("o_totalprice"))).over(
            spec.rowsBetween(Long.MinValue, 0)).cast("double").as("run_sum")))
        .select(col("o_orderkey"), col("o_custkey"), col("rn"), col("run_sum"))
        .toDF
    })
  )

  private val tumble1h =
    "to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))::TIMESTAMP"

  override def oracle: Map[String, String] = Map(
    "table_api_pipeline" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "table_api_insert_into" ->
      """SELECT n_nationkey, n_name FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5""".stripMargin,

    "table_api_tumble" ->
      s"""SELECT $tumble1h AS w_start,
         |  $tumble1h + INTERVAL 1 HOUR AS w_end,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "table_api_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT MIN(ts) AS w_start, MAX(ts) + INTERVAL 30 MINUTE AS w_end,
        |  user_id, COUNT(*) AS n
        |FROM sessions GROUP BY user_id, sid""".stripMargin,

    "table_api_setops" ->
      """SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT c_custkey, c_nationkey FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey LIMIT 50 OFFSET 10""".stripMargin,

    "table_api_over" ->
      s"""SELECT o_orderkey, o_custkey,
         |  CAST(row_number() OVER w AS INT) AS rn,
         |  CAST(SUM(${sqlDec2("o_totalprice")}) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS run_sum
         |FROM orders WHERE o_custkey % 25 = 0
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin
  )
}
