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
      val next = if (atStride) step(cur).localCheckpoint() else step(cur)
      if (atStride && converged(cur, next)) done = true
      cur = next
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
