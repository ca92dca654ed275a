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
        .select(col("c_custkey"), col("c_mktsegment"), col("z"))),

    "ml_knn_classify" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      MLOps.knnClassify(embs, embs,
        embs.filter(col("vec_id") % 100 === 0), k = 5)
    }),

    // deterministic train/test split assignment — md5-bucketed, identical
    // in any engine (FlinkML Splitter counterpart)
    "ml_train_test_split" -> ((s, dir) =>
      MLOps.splitAssignment(Tables.load(s, dir, "customer"), "c_custkey", 20)
        .select(col("c_custkey"), col("split_bucket"), col("is_test"))),

    // polynomial feature expansion — per-row IEEE products, oracle-exact
    "ml_poly_features" -> ((s, dir) =>
      MLOps.polynomialFeatures(
        Tables.load(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0),
        Seq("l_quantity", "l_discount"), degree = 2)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("poly_l_quantity"), col("poly_l_discount"),
          col("poly_l_quantity_l_quantity"),
          col("poly_l_quantity_l_discount"),
          col("poly_l_discount_l_discount"))),

    // one EXACT Lloyd step: integer-quantized distances, deterministic
    // seeds (k lowest ids), exact-rational centroid update
    "ml_kmeans_step" -> ((s, dir) =>
      MLOps.kmeansStepExact(Tables.load(s, dir, "embeddings"), k = 8))
  )

  override def oracle: Map[String, String] = Map(
    "ml_minmax_scale" ->
      """SELECT c_custkey, c_mktsegment,
        |  (c_acctbal - MIN(c_acctbal) OVER w)
        |    / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w) AS scaled
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment)""".stripMargin,

    // replicate topKBruteForce (round-6 cosine, rank tie-break nid) then
    // majority vote with ties toward the smaller label
    "ml_knn_classify" ->
      """WITH v AS (
        |  SELECT vec_id AS id, label, CAST(embedding AS DOUBLE[]) AS e,
        |    sqrt(list_aggregate(list_transform(range(64),
        |      i -> CAST(embedding AS DOUBLE[])[i+1]
        |         * CAST(embedding AS DOUBLE[])[i+1]), 'sum')) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.id AS qid, c.id AS nid, c.label,
        |    round(list_aggregate(list_transform(range(64),
        |      i -> q.e[i+1] * c.e[i+1]), 'sum') / (q.nrm * c.nrm), 6) AS cos
        |  FROM v q JOIN v c ON q.id % 100 = 0 AND q.id <> c.id),
        |nn AS (
        |  SELECT qid, nid, label FROM (
        |    SELECT qid, nid, label,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) rk
        |    FROM scored) WHERE rk <= 5),
        |votes AS (
        |  SELECT qid, label, COUNT(*) AS votes FROM nn GROUP BY qid, label)
        |SELECT qid, label AS predicted, votes FROM (
        |  SELECT qid, label, votes,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY votes DESC, label) AS rk
        |  FROM votes) WHERE rk = 1""".stripMargin,

    "ml_train_test_split" ->
      """SELECT c_custkey,
        |  CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 100 AS split_bucket,
        |  CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 100 < 20 AS is_test
        |FROM customer""".stripMargin,

    "ml_poly_features" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity AS poly_l_quantity,
        |  l_discount AS poly_l_discount,
        |  l_quantity * l_quantity AS poly_l_quantity_l_quantity,
        |  l_quantity * l_discount AS poly_l_quantity_l_discount,
        |  l_discount * l_discount AS poly_l_discount_l_discount
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

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
        |WINDOW w AS (PARTITION BY c_mktsegment)""".stripMargin,

    "ml_kmeans_step" ->
      """WITH q AS (
        |  SELECT vec_id AS id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(round(x * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |seeds AS (
        |  SELECT qv AS sv,
        |    CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS sidx
        |  FROM q ORDER BY id LIMIT 8),
        |assigned AS (
        |  SELECT id, sidx AS cluster FROM (
        |    SELECT q.id, s.sidx,
        |      list_aggregate(list_transform(range(64),
        |        i -> (qv[i+1] - sv[i+1]) * (qv[i+1] - sv[i+1])), 'sum') AS d2
        |    FROM q CROSS JOIN seeds s)
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY d2, sidx) = 1),
        |exploded AS (
        |  SELECT a.cluster,
        |    CAST(unnest(range(64)) AS INT) AS dim,
        |    unnest(q.qv) AS x
        |  FROM assigned a JOIN q ON q.id = a.id)
        |SELECT cluster, dim, COUNT(*) AS n,
        |  round(CAST(SUM(x) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS centroid
        |FROM exploded GROUP BY cluster, dim""".stripMargin
  )
}
