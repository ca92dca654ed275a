package graft

import org.apache.spark.sql.functions._

/** Every registered query must run at sf0.001 and produce a sane result.
  * Exact-value correctness is covered by the driver's DuckDB oracle at
  * sf0.01 (tools/check_oracle.py locally); these specs guard regressions in
  * between oracle runs and pin a few hand-checked invariants.
  */
class QueriesSpec extends SparkSpecBase {

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle coverage: every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"runs: $name") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      // force full execution
      df.count()
    }
  }

  test("q01: six (returnflag, linestatus) groups with positive sums") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q06: single-row scalar aggregate") {
    val rows = SparkEntry.queries("q06_forecast_revenue")(spark, sfDir).collect()
    assert(rows.length == 1 && rows.head.getAs[Double]("revenue") > 0)
  }

  test("set ops: |A ∪ B| = |A| + |B|, intersect ⊆ union-distinct") {
    val ua = SparkEntry.queries("setop_union_all")(spark, sfDir).count()
    val l = Tables.load(spark, sfDir, "lineitem")
    val a = l.filter(col("l_quantity") >= 25).count()
    val b = l.filter(col("l_quantity") <= 30 && col("l_returnflag") =!= "R").count()
    assert(ua == a + b)
    val inter = SparkEntry.queries("setop_intersect")(spark, sfDir).count()
    val ud = SparkEntry.queries("setop_union_distinct")(spark, sfDir).count()
    assert(inter <= ud)
  }

  test("joins: semi + anti partition the customer table") {
    val c = Tables.load(spark, sfDir, "customer").count()
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 490000)
    val semi = Tables.load(spark, sfDir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = SparkEntry.queries("join_anti")(spark, sfDir).count()
    assert(semi + anti == c)
  }

  test("combineGroup: explicit combiner equals the plain aggregation at any partition count") {
    import spark.implicits._
    import graft.Fixtures.Lineitem
    val plain = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("price_cents"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    for (parts <- Seq(1, 5)) {
      val combined = Tables.load(spark, sfDir, "lineitem").as[Lineitem]
        .repartition(parts)
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
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(combined == plain, s"parts=$parts")
    }
  }
}
