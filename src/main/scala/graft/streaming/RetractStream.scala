package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Retract-stream adapter (reference `toRetractStream[(Boolean, T)]`,
  * `StreamTableEnvironment.scala:724-831`, CRow runtime SURVEY §2.4).
  *
  * Flink emits per-record (add/retract) pairs from updating queries; Spark's
  * update output mode emits only the new row versions per micro-batch. This
  * adapter reconstructs the retractions at the sink: it keeps the last seen
  * row per key and, per micro-batch, emits (false, oldRow) before
  * (true, newRow) for every changed key — the same contract at micro-batch
  * granularity (SURVEY §7.5 risk 3).
  *
  * The key→row map lives at the sink (driver in local mode). For cluster
  * deployments the same logic runs inside `foreachBatch` against any keyed
  * store; the adapter is sink-side by design, mirroring the reference where
  * retraction materialization also happens in the sink
  * (`RetractStreamTableSink`).
  */
class RetractStream(keyCols: Seq[String]) {

  private val last = TrieMap.empty[String, Row]
  private val changesBuf = ArrayBuffer.empty[(Boolean, Row)]

  private def keyOf(r: Row): String =
    keyCols.map(c => String.valueOf(r.getAs[Any](c))).mkString("|")

  /** Process one micro-batch of an update-mode aggregation result. */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val rows = batch.collect()
    changesBuf.synchronized {
      rows.foreach { r =>
        val k = keyOf(r)
        last.get(k).foreach(old => changesBuf += ((false, old)))
        changesBuf += ((true, r))
        last.put(k, r)
      }
    }
  }

  /** All (isAdd, row) changes emitted so far, in order. */
  def changes: Seq[(Boolean, Row)] = changesBuf.synchronized(changesBuf.toList)

  /** Current materialized table (upsert view of the changelog). */
  def snapshot: Seq[Row] = last.values.toList
}

object RetractStream {

  /** Attach a retract adapter to an update-mode aggregation and run it to
    * completion (AvailableNow). Returns the adapter with the full changelog.
    */
  def run(agg: DataFrame, keyCols: Seq[String]): RetractStream = {
    val rs = new RetractStream(keyCols)
    val q: StreamingQuery = agg.writeStream
      .outputMode("update")
      .foreachBatch((b: DataFrame, id: Long) => rs.onBatch(b, id))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    rs
  }
}
