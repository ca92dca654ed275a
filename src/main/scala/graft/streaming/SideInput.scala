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
  }
}
