package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit partitioning directives (reference SURVEY §2.1:
  * `partitionByHash/ByRange/Custom` `DataSet.java:1257-1372`, `rebalance`
  * `:1385`, `sortPartition` `:1401`; streaming partitioning directives
  * `DataStream.java:318-445`).
  *
  * These affect physical layout, not content — verified by layout-inspecting
  * specs rather than the value oracle. At 100 TB these are the knobs that
  * align shuffles: hash-partition before repeated self-joins, range-partition
  * + sortWithinPartitions to produce run-length-friendly sorted output files.
  */
object PartitionOps {

  /** Hash partitioning by key columns (reference partitionByHash). */
  def byHash(df: DataFrame, n: Int, cols: Column*): DataFrame =
    df.repartition(n, cols: _*)

  /** Range partitioning (reference partitionByRange) — total order across
    * partition files; basis of sorted parquet output. */
  def byRange(df: DataFrame, n: Int, cols: Column*): DataFrame =
    df.repartitionByRange(n, cols: _*)

  /** Round-robin rebalance (reference rebalance / DataStream rebalance). */
  def rebalance(df: DataFrame, n: Int): DataFrame = df.repartition(n)

  /** Per-partition sort without a global shuffle (reference sortPartition). */
  def sortPartition(df: DataFrame, cols: Column*): DataFrame =
    df.sortWithinPartitions(cols: _*)
}
