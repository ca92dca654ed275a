package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, SamplingOps}

/** AsofJoin vs a brute-force range-join reference, plus sampling invariants.
  * Synthetic frames include the tricky cases: equal left/right timestamps
  * (bound must be inclusive), keys with no right rows, tolerance cutoffs. */
class AsofSamplingSpec extends SparkSpecBase {

  import spark.implicits._

  // (key, t, label) — right rows at t=10,20,20+1key,30; left probes around them
  private lazy val left: DataFrame = Seq(
    (1L, 5L), (1L, 10L), (1L, 15L), (1L, 25L), (1L, 40L),
    (2L, 10L), (2L, 30L),
    (3L, 7L) // key with no right rows at all
  ).toDF("k", "lt")

  private lazy val right: DataFrame = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
    (2L, 25L, "x")
  ).toDF("k", "rt", "v")

  /** Reference semantics via an explicit range join + per-left-row argmax. */
  private def brute(forward: Boolean, tolerance: Option[Long]): DataFrame = {
    val cmp = if (forward) col("rt") >= col("lt") else col("rt") <= col("lt")
    val tol = tolerance.map { d =>
      if (forward) col("rt") <= col("lt") + d else col("rt") >= col("lt") - d
    }.getOrElse(lit(true))
    val ranked = left.join(right, Seq("k"), "left")
      .withColumn("ok", cmp && tol)
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("k"), col("lt"))
        .orderBy(when(col("ok"), lit(0)).otherwise(lit(1)),
          if (forward) col("rt").asc else col("rt").desc)))
      .filter(col("rk") === 1)
    ranked.select(col("k"), col("lt"),
      when(col("ok"), col("rt")).as("m_rt"),
      when(col("ok"), col("v")).as("m_v"))
  }

  private def run(forward: Boolean, tolerance: Option[Long]): DataFrame = {
    val tol = tolerance.map(d => s"$d") // long seconds-free domain: plain long
    val joined =
      if (forward) AsofJoin.forward(left, right, "k", "lt", "rt", tol)
      else AsofJoin.backward(left, right, "k", "lt", "rt", tol)
    joined.select(col("k"), col("lt"),
      col("asof._t").as("m_rt"), col("asof.v").as("m_v"))
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val fmt = (d: DataFrame) => d.collect()
      .map(_.toSeq.map(v => if (v == null) "∅" else v.toString).mkString("|"))
      .sorted.toSeq
    assert(fmt(a) == fmt(b))
  }

  test("backward as-of equals brute-force latest-at-or-before") {
    assertSame(run(forward = false, None), brute(forward = false, None))
  }

  test("forward as-of equals brute-force earliest-at-or-after") {
    assertSame(run(forward = true, None), brute(forward = true, None))
  }

  test("backward tolerance nulls matches farther than the bound") {
    assertSame(run(forward = false, Some(6L)), brute(forward = false, Some(6L)))
  }

  test("forward tolerance nulls matches farther than the bound") {
    assertSame(run(forward = true, Some(6L)), brute(forward = true, Some(6L)))
  }

  test("equal timestamps match inclusively in both directions") {
    val bw = run(forward = false, None).filter(col("lt") === 10).collect().head
    assert(bw.getAs[Long]("m_rt") == 10L && bw.getAs[String]("m_v") == "a")
    val fw = run(forward = true, None).filter(col("lt") === 10).collect().head
    assert(fw.getAs[Long]("m_rt") == 10L && fw.getAs[String]("m_v") == "a")
  }

  test("stratified sample: exact hash-gate membership, rate ordering") {
    val orders = Tables.load(spark, sfDir, "orders")
    val out = SamplingOps.stratified(orders, "o_orderpriority", "o_orderkey",
      Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.1), defaultRate = 0.0)
    val counts = out.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("1-URGENT", "2-HIGH")))
    val totals = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 50% stratum keeps a visibly larger share than the 10% stratum
    val urgentShare = counts.getOrElse("1-URGENT", 0L).toDouble / totals("1-URGENT")
    val highShare = counts.getOrElse("2-HIGH", 0L).toDouble / totals("2-HIGH")
    assert(urgentShare > highShare)
    // determinism: second run identical
    val again = SamplingOps.stratified(orders, "o_orderpriority", "o_orderkey",
      Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.1), defaultRate = 0.0)
    assert(out.count() == again.count())
  }

  test("bottomK: exactly k per stratum (or the whole stratum), stable") {
    val customer = Tables.load(spark, sfDir, "customer")
    val k = 5
    val out = SamplingOps.bottomK(customer, "c_mktsegment", "c_custkey", k)
    val per = out.groupBy("c_mktsegment").count().collect()
    val totals = customer.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    per.foreach { r =>
      assert(r.getLong(1) == math.min(k.toLong, totals(r.getString(0))))
    }
    // repartitioning must not change the selected ids
    val ids1 = out.select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = SamplingOps.bottomK(customer.repartition(7),
      "c_mktsegment", "c_custkey", k)
      .select("c_custkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }
}
