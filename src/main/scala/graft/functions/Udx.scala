package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined function surface (SURVEY §2.5/§2.6):
  *  - `ScalarFunction` → `spark.udf.register` (usable from both the
  *    DataFrame API and SQL);
  *  - `AggregateFunction[T, ACC]` (createAccumulator/accumulate/merge/
  *    getValue) → typed `Aggregator[IN, BUF, OUT]` registered via `udaf`
  *    (`retract` has no Spark equivalent — batch/append semantics only,
  *    documented);
  *  - `TableFunction[T]` → a UDF returning an array + LATERAL VIEW explode
  *    (SQL) or Dataset.flatMap (typed).
  *
  * Example functions are chosen deterministic (string banding, exact
  * min/max range) so they participate in the value oracle.
  */
object Udx {

  /** Scalar UDF: account-balance banding. */
  val acctBand: Double => String = bal =>
    if (bal < 0) "neg" else if (bal < 3000) "low"
    else if (bal < 7000) "mid" else "high"

  /** Typed UDAF: value range (max − min) — an `AggregateFunction` with
    * accumulator (min, max); merge is associative+commutative, output a
    * single subtraction of exact picks → cross-engine deterministic. */
  object RangeAgg extends Aggregator[Double, (Double, Double), Double] {
    override def zero: (Double, Double) =
      (Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: (Double, Double), a: Double): (Double, Double) =
      (math.min(b._1, a), math.max(b._2, a))
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (math.min(x._1, y._1), math.max(x._2, y._2))
    override def finish(b: (Double, Double)): Double = b._2 - b._1
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Table function: split a code like "1-URGENT" into its parts. */
  val splitParts: String => Array[String] = s => s.split("-")

  /** Register everything on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("acct_band", acctBand)
    spark.udf.register("range_agg", udaf(RangeAgg))
    spark.udf.register("split_parts", splitParts)
  }
}
