package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.stableHash

/** Deterministic sampling for corpus curation (LLM-pipeline extension).
  *
  * Every sampler here is a pure function of the data — md5-hash thresholds
  * instead of RNG draws — so a sample is reproducible across engines,
  * partitionings, and re-runs (the property the reference's rng-seeded
  * `DataSet.sample`, `flink-java/.../utils/DataSetUtils.java:177`, only has
  * per fixed topology). That is the version a 100 TB curation pipeline
  * wants anyway: re-running a stage must not reshuffle the sample.
  */
object SamplingOps {

  private val Denom = 1000000L

  /** Per-stratum Bernoulli: keep a row iff hash(key) mod 1e6 falls under the
    * stratum's rate. Narrow (no shuffle) — the filter composes into the scan. */
  def stratified(df: DataFrame, strataCol: String, keyCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    // round(), not cast-truncate: a rate whose double product lands just
    // below the integer (0.3 * 1e6 = 299999.999...) would otherwise use a
    // threshold one lower than an oracle computing it in exact decimal,
    // flipping boundary rows
    df.filter(stableHash(col(keyCol).cast("string")) % Denom <
      round(rate * Denom).cast("long"))
  }

  /** Exactly k rows per stratum: the k smallest by hash(key) — a
    * deterministic equivalent of per-stratum reservoir sampling (each subset
    * of size k is equally likely under the hash's uniformity). One shuffle on
    * the stratum; rank-k selection is top-k per group, which Spark executes
    * with partial per-partition top-k before the exchange. */
  def bottomK(df: DataFrame, strataCol: String, keyCol: String,
              k: Int): DataFrame = {
    val h = stableHash(col(keyCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k)
      .drop("_rk")
  }
}
