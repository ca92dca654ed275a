package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** Seeded randomized equivalence for AsofJoin against a local in-memory
  * reference, plus plan-shape guards: the operator must compile to ONE hash
  * exchange and ZERO join operators (its whole point vs a range join), and
  * the deterministic samplers must stay narrow (no exchange at all).
  */
class AsofFuzzSpec extends SparkSpecBase {

  import spark.implicits._

  private def referenceAsof(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)],
                            forward: Boolean, tol: Option[Long]): Set[(Long, Long, Option[(Long, String)])] =
    left.map { case (k, lt) =>
      val cands = right.filter(_._1 == k)
        .filter(r => if (forward) r._2 >= lt else r._2 <= lt)
        .filter(r => tol.forall(d =>
          if (forward) r._2 <= lt + d else r._2 >= lt - d))
      val best =
        if (cands.isEmpty) None
        else {
          val picked = if (forward) cands.minBy(r => (r._2, r._3)) else cands.maxBy(r => (r._2, r._3))
          Some((picked._2, picked._3))
        }
      (k, lt, best)
    }.toSet

  test("500-case randomized equivalence vs local reference (both directions, tolerances)") {
    val rnd = new scala.util.Random(0xA50F)
    for (round <- 0 until 10) {
      val nKeys = 1 + rnd.nextInt(4)
      val left = Seq.fill(25)((rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
        .distinct
      // unique (key, t) on the right — the operator contract
      val right = Seq.fill(20)((rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
        .distinct.map { case (k, t) => (k, t, s"v$k-$t") }
      val lDf = left.toDF("k", "lt")
      val rDf = right.toDF("k", "rt", "v")
      for (forward <- Seq(false, true); tol <- Seq(None, Some(7L))) {
        val got = (if (forward) AsofJoin.forward(lDf, rDf, "k", "lt", "rt", tol.map(_.toString))
                   else AsofJoin.backward(lDf, rDf, "k", "lt", "rt", tol.map(_.toString)))
          .select(col("k"), col("lt"), col("asof._t"), col("asof.v"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some((r.getLong(2), r.getString(3)))))
          .toSet
        val want = referenceAsof(left, right, forward, tol)
        assert(got == want,
          s"round=$round forward=$forward tol=$tol diff=${(got diff want) ++ (want diff got)}")
      }
    }
  }

  test("plan: as-of join is one hash exchange, zero join operators") {
    val l = Seq((1L, 5L), (2L, 9L)).toDF("k", "lt")
    val r = Seq((1L, 3L, "a")).toDF("k", "rt", "v")
    val p = AsofJoin.backward(l, r, "k", "lt", "rt")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
    assert(!p.contains("Join"), s"expected no join operator, plan:\n$p")
  }

  test("plan: stratified sample and scrub are narrow (no exchange)") {
    val orders = Tables.load(spark, sfDir, "orders")
    val p1 = graft.operators.SamplingOps.stratified(
        orders, "o_orderpriority", "o_orderkey", Map("1-URGENT" -> 0.5), 0.1)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"stratified sample shuffled:\n$p1")
    val customer = Tables.load(spark, sfDir, "customer")
    val p2 = graft.operators.TextOps.scrub(customer,
        concat_ws(" ", col("c_name")), col("c_custkey"),
        Seq(("num", "[0-9]+", "<NUM>")))
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"scrub shuffled:\n$p2")
  }
}
