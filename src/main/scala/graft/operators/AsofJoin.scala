package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join — for each left row, the single right row whose
  * time is nearest at-or-before (`backward`) / at-or-after (`forward`) the
  * left row's time within the same key, optionally within a tolerance.
  *
  * The reference engine has no dedicated as-of operator (its users express
  * this as a windowed stream join, e.g. the DataStreamWindowJoin family,
  * `flink-table/.../plan/nodes/datastream/DataStreamWindowJoin.scala:45`);
  * this is the batch/at-scale formulation a training-data pipeline needs for
  * point-in-time-correct feature attachment.
  *
  * Plan shape — built for the 100 TB case:
  *   1. tag both inputs and union them (no join operator at all);
  *   2. ONE hash exchange on the key + an in-partition sort on
  *      (time, side) — cost O(|L|+|R|) rows moved, independent of match
  *      density;
  *   3. a running `last(right payload, ignoreNulls)` window carries the most
  *      recent right row forward to each left row.
  * A time-range join expressing the same semantics explodes to every
  * right row within the tolerance per left row before picking one
  * (O(|L|·density)), and Spark plans it as a BroadcastNestedLoop unless one
  * side fits in memory. The union-sort form is also exactly the partitioning
  * a subsequent keyed aggregation can reuse.
  *
  * Contract: right rows must be unique per (key, time) — pre-aggregate
  * duplicates upstream (the window keeps the last in sort order otherwise,
  * which is deterministic only with unique sort keys).
  */
object AsofJoin {

  /** Most recent right row with rightTime <= leftTime (per key). Output:
    * every left column plus a nullable `asof` struct of
    * (_t = right time, remaining right payload columns). */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               tolerance: Option[String] = None): DataFrame =
    joined(left, right, key, leftTime, rightTime, tolerance, forward = false)

  /** Earliest right row with rightTime >= leftTime (per key). */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              tolerance: Option[String] = None): DataFrame =
    joined(left, right, key, leftTime, rightTime, tolerance, forward = true)

  private def joined(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     tolerance: Option[String], forward: Boolean): DataFrame = {
    // the output appends a struct column named `asof`; reject a left input
    // that already carries one (e.g. an un-renamed previous attachment) —
    // a duplicate name only explodes later as AMBIGUOUS_REFERENCE far from
    // the cause. Chain attachments by renaming between calls.
    require(!left.columns.contains("asof"),
      "left input already has an 'asof' column — rename it before chaining")
    val rPayload = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    val rStruct = struct(col(rightTime).as("_t") +: rPayload.map(col): _*)
    val rStructType = right.select(rStruct).schema.head.dataType
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val lStructType = left.select(lStruct).schema.head.dataType

    val lTagged = left.select(
      col(key).as("_k"), col(leftTime).as("_ts"), lit(1).as("_side"),
      lStruct.as("_l"), lit(null).cast(rStructType).as("_r"))
    val rTagged = right.select(
      col(key).as("_k"), col(rightTime).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lStructType).as("_l"), rStruct.as("_r"))

    // side asc at equal _ts makes the bound inclusive (right row visible to a
    // left row with the identical timestamp) in both directions
    val ord: Seq[Column] =
      if (forward) Seq(col("_ts").desc, col("_side").asc)
      else Seq(col("_ts").asc, col("_side").asc)
    val w = Window.partitionBy(col("_k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val inTol: Column = tolerance match {
      case None => col("_m").isNotNull
      case Some(t) if forward => col("_m._t") <= col("_ts") + expr(t)
      case Some(t) => col("_m._t") >= col("_ts") - expr(t)
    }
    matched.select(col("_l.*"),
      when(inTol, col("_m")).as("asof"))
  }
}
