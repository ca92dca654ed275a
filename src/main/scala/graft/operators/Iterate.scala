package graft.operators

import org.apache.spark.sql.DataFrame

/** Driver-loop iteration helpers — the Spark mapping of the reference's
  * bulk/delta iterations (`DataSet.iterate` `DataSet.java:1156`,
  * `iterateDelta` `:1206`; SURVEY §2.1).
  *
  * Spark has no native iteration operator: each round extends the logical
  * plan, so unbounded lineage growth is THE scale hazard. Every `checkpointEvery`
  * rounds the intermediate result is localCheckpoint'ed (materialized,
  * lineage cut) — without this, plan compilation goes quadratic and a
  * 100-iteration job dies on driver memory long before data size matters.
  */
object Iterate {

  /** localCheckpoint cuts LINEAGE but PRESERVES the optimizer's
    * size-in-bytes estimate of the plan it replaced — and a step whose plan
    * joins `cur` against itself k times raises that estimate to the ^k
    * every round. The estimate is an unbounded BigInt: after r rounds it
    * has ~k^r digits, and around r ≈ 6–8 the DRIVER disappears into
    * BigInteger.multiply inside plan estimation (observed: the knn-clusters
    * CC at jump depth 2 hung the driver in ToomCook multiplication on
    * ~10⁵-digit "row counts" while every executor sat idle; depth 1 loops
    * merely converge before the melt-down). Stats carry no information
    * here — the frame is already materialized — so once the estimate
    * leaves any physically-possible range (2^96 bytes), rebuild the frame
    * from its checkpointed RDD, which resets stats to the engine default.
    * The guard keeps the common case free: the Row round-trip only ever
    * runs after compounding is detected. */
  private def statsSane(df: DataFrame): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength <= 96) df
    else df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Bulk iteration: repeat `step` until `maxIter` or until `converged`
    * (old, new) returns true. The convergence predicate launches extra jobs,
    * so it is only evaluated at checkpoint strides — a few overshoot rounds
    * are cheaper than doubling the job count. */
  def bulk(init: DataFrame, maxIter: Int, checkpointEvery: Int = 5,
           converged: (DataFrame, DataFrame) => Boolean = (_, _) => false)
          (step: DataFrame => DataFrame): DataFrame = {
    var cur = init.localCheckpoint()
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val atStride = (i + 1) % checkpointEvery == 0
      val next =
        if (atStride) statsSane(step(cur).localCheckpoint()) else step(cur)
      if (atStride && converged(cur, next)) done = true
      cur = next
      i += 1
    }
    cur.localCheckpoint()
  }

  /** [[bulk]] with the convergence signal folded INTO the per-stride
    * checkpoint job as observed metrics (optimization r13): `converged`
    * predicates that aggregate the new frame (label sums, change counts)
    * used to launch one extra Spark job per stride — at stride 1 that is
    * half of every superstep's job count, pure fixed cost on small/medium
    * graphs. `metrics` are aggregate expressions evaluated by the SAME
    * job that materializes the checkpoint; `convergedOnMetrics` sees their
    * named values (and typically closes over the previous round's). */
  def bulkObserved(init: DataFrame, maxIter: Int, checkpointEvery: Int = 1,
                   metrics: Seq[org.apache.spark.sql.Column] = Nil,
                   convergedOnMetrics: Map[String, Any] => Boolean = _ => false)
                  (step: DataFrame => DataFrame): DataFrame = {
    require(metrics.nonEmpty, "bulkObserved needs at least one metric")
    var cur = init.localCheckpoint()
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      if ((i + 1) % checkpointEvery == 0) {
        val obs = org.apache.spark.sql.Observation()
        val next = statsSane(
          step(cur).observe(obs, metrics.head, metrics.tail: _*)
            .localCheckpoint())
        done = convergedOnMetrics(obs.get)
        cur = next
      } else cur = step(cur)
      i += 1
    }
    cur.localCheckpoint()
  }

  /** Delta iteration: maintain a solution set and a shrinking workset; stop
    * when the workset is empty (reference iterateDelta semantics). `step`
    * maps (solution, workset) to (updatedSolution, newWorkset). */
  def delta(initialSolution: DataFrame, initialWorkset: DataFrame,
            maxIter: Int, checkpointEvery: Int = 5)
           (step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    var solution = initialSolution.localCheckpoint()
    var workset = initialWorkset.localCheckpoint()
    var i = 0
    while (i < maxIter && !workset.isEmpty) {
      val (s, w) = step(solution, workset)
      if ((i + 1) % checkpointEvery == 0) {
        solution = s.localCheckpoint(); workset = w.localCheckpoint()
      } else {
        solution = s; workset = w.localCheckpoint() // isEmpty forces eval
      }
      i += 1
    }
    solution
  }
}
