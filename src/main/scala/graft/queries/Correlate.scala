package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** UDTF / correlate inventory (SURVEY §2.4 DataSetCorrelate +
  * `LogicalUnnestRule`, §2.6 TableFunction).
  *
  * Reference: UDTF cross/outer apply `DataSetCorrelate.scala:42`, Table API
  * `join(udtfCall)` / `leftOuterJoin(udtfCall)` (`api/table.scala:366-427`),
  * UNNEST via `LogicalUnnestRule` (`FlinkRuleSets.scala:121`). Spark-first:
  * `explode`/`posexplode[_outer]` generators and SQL LATERAL VIEW — all
  * Catalyst `Generate` nodes, distributed row-local (no shuffle).
  */
object Correlate extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // UNNEST: split document text into tokens (cross apply)
    "correlate_explode" -> ((s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))),

    // UNNEST WITH ORDINALITY: positional explode
    "correlate_posexplode" -> ((s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "tok")))),

    // outer apply: rows with empty generator output are kept (NULL-padded)
    "correlate_explode_outer" -> ((s, dir) =>
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          explode_outer(when(col("n_regionkey") === 0,
            array().cast("array<string>")).otherwise(array(col("n_name"),
              lower(col("n_name"))))).as("v"))),

    // table-function join through SQL LATERAL VIEW (UDTF syntax surface)
    "correlate_lateral_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT n_nationkey, tok
              |FROM nation
              |LATERAL VIEW explode(split(n_name, '_')) AS tok""".stripMargin)
    }),

    // generator + aggregation: token frequencies (explode then count)
    "correlate_token_freq" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq")))
  )

  override def oracle: Map[String, String] = Map(
    "correlate_explode" ->
      """SELECT doc_id, u.tok
        |FROM documents, unnest(string_split_regex(lower(text), '\s+')) u(tok)
        |WHERE doc_id % 25 = 0""".stripMargin,

    // DuckDB zips multiple unnests in one SELECT list — positions + tokens
    // advance in lockstep (= posexplode)
    "correlate_posexplode" ->
      """SELECT doc_id,
        |  CAST(unnest(range(len(string_split_regex(lower(text), '\s+')))) AS INT) AS pos,
        |  unnest(string_split_regex(lower(text), '\s+')) AS tok
        |FROM documents WHERE doc_id % 50 = 0""".stripMargin,

    "correlate_explode_outer" ->
      """SELECT n_nationkey, u.v
        |FROM nation LEFT JOIN LATERAL (SELECT unnest(
        |  CASE WHEN n_regionkey = 0 THEN []
        |       ELSE [n_name, lower(n_name)] END) AS v) u ON true""".stripMargin,

    "correlate_lateral_sql" ->
      """SELECT n_nationkey, u.tok
        |FROM nation, unnest(string_split(n_name, '_')) u(tok)""".stripMargin,

    "correlate_token_freq" ->
      """SELECT u.tok, COUNT(*) AS freq
        |FROM documents, unnest(string_split_regex(lower(text), '\s+')) u(tok)
        |GROUP BY u.tok""".stripMargin
  )
}
