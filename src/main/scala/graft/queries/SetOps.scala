package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operation + distinct inventory (SURVEY §2.1 union/distinct, §2.3
  * minus/minusAll/union/unionAll/intersect/intersectAll, §2.4
  * DataSetUnion/DataSetIntersect/DataSetMinus/DataSetDistinct).
  *
  * Reference impls: `flink-table/.../plan/nodes/dataset/DataSetUnion.scala:36`,
  * `DataSetIntersect.scala:37`, `DataSetMinus.scala:37`,
  * `DataSetDistinct.scala:37` (coGroup-based); Spark built-ins map 1:1
  * (`union`, `intersect[All]`, `except[All]`, `distinct`).
  */
object SetOps extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // Two deliberately-overlapping projections of lineitem.
  private def sideA(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").filter(col("l_quantity") >= 25)
      .select(col("l_suppkey").as("k"), col("l_returnflag").as("f"))
  private def sideB(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") <= 30 && col("l_returnflag") =!= "R")
      .select(col("l_suppkey").as("k"), col("l_returnflag").as("f"))

  private val sqlA = "SELECT l_suppkey AS k, l_returnflag AS f FROM lineitem WHERE l_quantity >= 25"
  private val sqlB = "SELECT l_suppkey AS k, l_returnflag AS f FROM lineitem WHERE l_quantity <= 30 AND l_returnflag <> 'R'"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "setop_union_all" -> ((s, dir) => sideA(s, dir).union(sideB(s, dir))),
    "setop_union_distinct" -> ((s, dir) =>
      sideA(s, dir).union(sideB(s, dir)).distinct()),
    "setop_intersect" -> ((s, dir) => sideA(s, dir).intersect(sideB(s, dir))),
    "setop_intersect_all" -> ((s, dir) =>
      sideA(s, dir).intersectAll(sideB(s, dir))),
    "setop_except" -> ((s, dir) => sideA(s, dir).except(sideB(s, dir))),
    "setop_except_all" -> ((s, dir) => sideA(s, dir).exceptAll(sideB(s, dir))),
    // distinct over all columns of a projection
    "distinct_projection" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()),
    // dropDuplicates-by-key with deterministic survivor (min orderkey) —
    // the reference's distinct(fields) semantics with a pinned witness row
    "distinct_by_key" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderkey")).as("first_orderkey"))),
    // VALUES relation (reference DataSetValues)
    "values_inline" -> ((s, dir) =>
      s.sql("""SELECT a, b, a * 10 AS c
              |FROM VALUES (1, 'x'), (2, 'y'), (3, 'z') AS t(a, b)""".stripMargin))
  )

  override def oracle: Map[String, String] = Map(
    "setop_union_all" -> s"$sqlA UNION ALL $sqlB",
    "setop_union_distinct" -> s"$sqlA UNION $sqlB",
    "setop_intersect" -> s"$sqlA INTERSECT $sqlB",
    "setop_intersect_all" -> s"$sqlA INTERSECT ALL $sqlB",
    "setop_except" -> s"$sqlA EXCEPT $sqlB",
    "setop_except_all" -> s"$sqlA EXCEPT ALL $sqlB",
    "distinct_projection" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "distinct_by_key" ->
      """SELECT o_custkey, MIN(o_orderkey) AS first_orderkey
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "values_inline" ->
      "SELECT a, b, a * 10 AS c FROM (VALUES (1, 'x'), (2, 'y'), (3, 'z')) t(a, b)"
  )
}
