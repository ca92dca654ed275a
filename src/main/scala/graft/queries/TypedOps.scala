package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Fixtures, Tables}

/** Typed Dataset API surface (reference DataSet<T> functional operators,
  * SURVEY §2.1: map `DataSet.java:210`, filter `:284`, mapPartition `:237`,
  * reduce `:443`, reduceGroup `:464`, groupBy with key selector `:670`).
  *
  * These run user lambdas over case classes — the JVM-closure path the
  * reference's DataSet API is built on. Results are kept
  * partition/order-independent (integer arithmetic, deterministic argmax, or
  * in-group sorting) so the DuckDB oracle can pin them exactly.
  */
object TypedOps extends QuerySet {

  import Fixtures._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // map + filter over a typed Dataset
    "typed_map_filter" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem").as[Lineitem]
        .filter(l => l.l_returnflag == "R" && l.l_quantity >= 45)
        .map(l => (l.l_orderkey, l.l_linenumber,
          math.round(l.l_quantity * 2).toInt))
        .toDF("l_orderkey", "l_linenumber", "double_qty")
    }),

    // groupByKey + reduceGroups: deterministic argmax by a total order
    "typed_reduce_groups" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem").as[Lineitem]
        .groupByKey(_.l_returnflag)
        .reduceGroups((a: Lineitem, b: Lineitem) => {
          val ka = (a.l_quantity, a.l_orderkey, a.l_linenumber.toLong)
          val kb = (b.l_quantity, b.l_orderkey, b.l_linenumber.toLong)
          if (Ordering[(Double, Long, Long)].gteq(ka, kb)) a else b
        })
        .map { case (flag, l) => (flag, l.l_orderkey, l.l_linenumber, l.l_quantity) }
        .toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    }),

    // groupByKey + mapGroups: whole-group UDF (integer-cents arithmetic keeps
    // the fold order-free)
    "typed_map_groups" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer").as[Customer]
        .groupByKey(_.c_nationkey)
        .mapGroups { (k, it) =>
          var n = 0L; var cents = 0L
          it.foreach { c => n += 1; cents += math.round(c.c_acctbal * 100) }
          (k, n, cents)
        }
        .toDF("c_nationkey", "n_customers", "acctbal_cents")
    }),

    // groupByKey + flatMapGroups: reduceGroup emitting top-2 per group
    // (in-group sort makes the emission order-independent)
    "typed_flatmap_groups" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer").as[Customer]
        .groupByKey(_.c_nationkey)
        .flatMapGroups { (k, it) =>
          it.toSeq.sortBy(c => (-c.c_acctbal, c.c_custkey)).take(2)
            .map(c => (k, c.c_custkey, c.c_acctbal))
        }
        .toDF("c_nationkey", "c_custkey", "c_acctbal")
    }),

    // combineGroup (reference DataSet.java:486, GroupCombineFunction): an
    // EXPLICIT user combiner — per-partition partial (key → (cents, n))
    // built inside mapPartitions, then ONE final keyed aggregation over
    // the partials. The combiner contract: the result equals the plain
    // aggregation for ANY partition count (integer-cents arithmetic keeps
    // the fold order-free), which is exactly what the value oracle pins.
    "typed_combine_group" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem").as[Lineitem]
        .mapPartitions { it =>
          val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
          it.foreach { l =>
            val (cents, n) = m.getOrElse(l.l_returnflag, (0L, 0L))
            m.update(l.l_returnflag,
              (cents + math.round(l.l_extendedprice * 100), n + 1))
          }
          m.iterator.map { case (k, (cents, n)) => (k, cents, n) }
        }
        .toDF("l_returnflag", "cents", "n")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("cents")).as("price_cents"), sum(col("n")).as("n_rows"))
    }),

    // mapPartitions: per-partition iterator transform, row-local semantics
    "typed_map_partitions" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "nation").as[Nation]
        .mapPartitions(it => it.map(n =>
          (n.n_nationkey, s"${n.n_name.toLowerCase}@r${n.n_regionkey}")))
        .toDF("n_nationkey", "tag")
    })
  )

  override def oracle: Map[String, String] = Map(
    "typed_map_filter" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_quantity * 2) AS INT) AS double_qty
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45""".stripMargin,

    "typed_reduce_groups" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity DESC, l_orderkey DESC, l_linenumber DESC) rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,

    "typed_map_groups" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS acctbal_cents
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "typed_flatmap_groups" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) rn
        |  FROM customer) WHERE rn <= 2""".stripMargin,

    "typed_combine_group" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "typed_map_partitions" ->
      """SELECT n_nationkey,
        |  lower(n_name) || '@r' || CAST(n_regionkey AS VARCHAR) AS tag
        |FROM nation""".stripMargin
  )
}
