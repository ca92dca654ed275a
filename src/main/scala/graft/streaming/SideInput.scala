package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** PROTEUS side inputs — the reference's headline feature (SURVEY §0):
  * `DataStream.withSideInput(SideInput)` with `BroadcastedSideInput` /
  * `KeyedSideInput` variants
  * (`flink-streaming-java/.../api/datastream/DataStream.java:899-921`,
  * `.../datastream/utils/BroadcastedSideInput.java:25`,
  * `KeyedSideInput.java:25`).
  *
  * Reference semantics: the main input is buffered until every side input is
  * fully consumed, then processed with the side data available
  * (`MultipleInputStreamTask.java:103-144`). In Structured Streaming a
  * static DataFrame is *always* fully available to every micro-batch, so the
  * buffer-then-flush machinery disappears: a broadcast side input is a
  * stream–static broadcast join and a keyed side input is a stream–static
  * equi join. Enrichment UDF access (`RuntimeContext.getSideInput`) becomes
  * ordinary column references on the joined frame.
  */
sealed trait SideInput {
  def df: DataFrame
}

/** Side table replicated to every task (reference BroadcastedSideInput). */
final case class BroadcastedSideInput(df: DataFrame) extends SideInput

/** Side table co-partitioned with the stream by key (reference
  * KeyedSideInput). */
final case class KeyedSideInput(df: DataFrame, keys: Seq[String]) extends SideInput

/** Side table forwarded AS-IS (reference ForwardedSideInput,
  * `ForwardedSideInput.java:25`, dispatched via `oth.forward()` at
  * `DataStream.java:907-909`): the caller has already distributed the
  * side data the way the enrichment needs it, and the engine must not
  * move it again. In Spark terms the contract is "reuse the side's
  * existing layout on `keys`": `withSideInput` joins WITHOUT introducing
  * any redistribution of the side (the shuffle-hash hint forbids the
  * broadcast replication that would ignore the layout) — when both
  * sides carry a co-located layout (bucketed tables, the durable form of
  * the reference's upstream keyBy), the join plan has ZERO hash
  * exchanges (plan-locked in StreamingSpec, same no-exchange path
  * PartitionOpsSpec pins for bucketed joins). Join VALUES are identical
  * to [[KeyedSideInput]] — forward vs keyed is a physical-distribution
  * choice, exactly as in the reference. */
final case class ForwardedSideInput(df: DataFrame, keys: Seq[String]) extends SideInput

object SideInput {

  /** The reference's `stream.withSideInput(side)`: returns the enriched
    * stream. For the broadcast variant pass an explicit join condition; for
    * the keyed variant the side input's key columns must exist on the
    * stream. */
  def withSideInput(stream: DataFrame, side: SideInput,
                    cond: Option[Column] = None,
                    joinType: String = "inner"): DataFrame = side match {
    case BroadcastedSideInput(d) =>
      cond match {
        case Some(c) => stream.join(broadcast(d), c, joinType)
        case None => stream.crossJoin(broadcast(d))
      }
    case KeyedSideInput(d, keys) =>
      stream.join(d, keys, joinType)
    case ForwardedSideInput(d, keys) =>
      // no broadcast, no repartition: the side's existing distribution is
      // the contract; Catalyst reuses it (no added exchange) when it
      // already satisfies the join's requirement. The reference's
      // `forward()` FAILS on a layout mismatch (parallelism/partitioning,
      // ForwardedSideInput.java:25) rather than silently redistributing,
      // so the side's physical output partitioning is validated up front:
      // it must hash-cluster on (a subset of) the join keys. Remaining
      // documented divergence: Spark may still insert an exchange when the
      // side's PARTITION COUNT differs from the stream side's shuffle
      // sizing — partition counts are a runtime property Catalyst owns, so
      // count mismatches re-exchange instead of failing as the reference
      // does (DESIGN.md "ForwardedSideInput strictness").
      requireClusteredOn(d, keys)
      stream.join(d.hint("shuffle_hash"), keys, joinType)
  }

  /** Fail-fast layout check for [[ForwardedSideInput]]: the side's physical
    * plan must report `HashPartitioning` over a non-empty subset of the
    * join keys (a `repartition(col)`, a bucketed scan, or an upstream
    * hash shuffle all qualify). `UnknownPartitioning` — an unprepared side
    * — is the exact condition the reference rejects at graph build time. */
  private[graft] def requireClusteredOn(d: DataFrame, keys: Seq[String]): Unit = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    d.queryExecution.sparkPlan.outputPartitioning match {
      case h: HashPartitioning =>
        val exprCols = h.expressions.flatMap(_.references.map(_.name)).toSet
        require(exprCols.nonEmpty && exprCols.subsetOf(keys.toSet),
          s"ForwardedSideInput: side is hash-distributed on $exprCols, not " +
            s"on the join keys $keys — forward() requires the caller's " +
            "layout to match (reference ForwardedSideInput semantics)")
      case other =>
        throw new IllegalArgumentException(
          s"ForwardedSideInput: side carries no forwardable layout " +
            s"($other) — distribute it on ${keys.mkString(",")} first " +
            "(repartition/bucketing), or use KeyedSideInput to let the " +
            "engine place it")
    }
  }
}
