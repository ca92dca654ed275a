package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.MLOps

/** ML preprocessing inventory (SURVEY §2.8 FlinkML scalers) — the
  * deterministic relational half; iterative estimators live behind
  * [[graft.ml.MLOps]] with MLSpec coverage. */
object MlQueries extends QuerySet {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_minmax_scale" -> ((s, dir) =>
      MLOps.minMaxScale(Tables.load(s, dir, "customer"),
          "c_acctbal", col("c_mktsegment"))
        .select(col("c_custkey"), col("c_mktsegment"), col("scaled"))),

    "ml_standard_scale" -> ((s, dir) =>
      MLOps.standardScaleCents(Tables.load(s, dir, "customer"),
          "c_acctbal", col("c_mktsegment"))
        .select(col("c_custkey"), col("c_mktsegment"), col("z")))
  )

  override def oracle: Map[String, String] = Map(
    "ml_minmax_scale" ->
      """SELECT c_custkey, c_mktsegment,
        |  (c_acctbal - MIN(c_acctbal) OVER w)
        |    / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w) AS scaled
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment)""".stripMargin,

    "ml_standard_scale" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment,
        |  (CAST(cents AS DOUBLE) - CAST(SUM(cents) OVER w AS DOUBLE)
        |     / COUNT(*) OVER w)
        |  / sqrt(CAST(SUM(cents * cents) OVER w AS DOUBLE) / COUNT(*) OVER w
        |         - (CAST(SUM(cents) OVER w AS DOUBLE) / COUNT(*) OVER w)
        |           * (CAST(SUM(cents) OVER w AS DOUBLE) / COUNT(*) OVER w))
        |    AS z
        |FROM c
        |WINDOW w AS (PARTITION BY c_mktsegment)""".stripMargin
  )
}
