package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Retract-stream adapter (reference `toRetractStream[(Boolean, T)]`,
  * `StreamTableEnvironment.scala:724-831`, CRow runtime SURVEY §2.4).
  *
  * Flink emits per-record (add/retract) pairs from updating queries; Spark's
  * update output mode emits only the new row versions per micro-batch. This
  * adapter reconstructs the retractions DISTRIBUTED: per micro-batch it
  * semi-joins the previous snapshot against the batch keys (the old versions
  * of changed keys become retractions), unions the batch rows as additions,
  * and appends the tagged changelog to a parquet sink with a distributed
  * write. The new snapshot is the anti-join of the previous snapshot plus
  * the batch — all of it DataFrame algebra; the driver holds only the
  * snapshot POINTER, never the rows. Changelog order is (batch, key,
  * retract-before-add), the same per-key contract as the reference's
  * retraction pairs at micro-batch granularity (SURVEY §7.5 risk 3).
  */
class RetractStream(keyCols: Seq[String]) {

  private val outDir = java.nio.file.Files
    .createTempDirectory("graft-retract").toString
  @volatile private var snap: Option[DataFrame] = None
  @volatile private var sparkRef: SparkSession = _
  @volatile private var baseSchema: StructType = _
  @volatile private var wroteAny = false

  /** Process one micro-batch of an update-mode aggregation result —
    * distributed joins + distributed write, no per-batch collect. */
  def onBatch(batch: DataFrame, batchId: Long): Unit = {
    sparkRef = batch.sparkSession
    baseSchema = batch.schema
    if (batch.isEmpty) return
    // materialize once: the changelog and the snapshot both reuse it; at
    // cluster scale persist(DISK_ONLY) instead of localCheckpoint
    val b = batch.localCheckpoint()
    val keys = keyCols.map(col)
    val changes = snap match {
      case None => b.withColumn("__is_add", lit(true))
      case Some(prev) =>
        prev.join(b.select(keys: _*), keyCols, "left_semi")
          .withColumn("__is_add", lit(false))
          .union(b.withColumn("__is_add", lit(true)))
    }
    changes.withColumn("__batch_id", lit(batchId))
      .write.mode("append").parquet(outDir)
    wroteAny = true
    snap = Some(snap match {
      case None => b
      case Some(prev) =>
        prev.join(b.select(keys: _*), keyCols, "left_anti").union(b)
          .localCheckpoint()
    })
  }

  /** All (isAdd, row) changes emitted so far, ordered by (batch, key,
    * retract-before-add). Materializes the changelog — call at the consumer
    * boundary, not per batch. */
  def changes: Seq[(Boolean, Row)] = {
    if (!wroteAny) return Nil
    val df = sparkRef.read.parquet(outDir)
    val dataCols = baseSchema.fieldNames.toSeq
    val sortCols = (Seq(col("__batch_id")) ++ keyCols.map(col)) :+ col("__is_add")
    df.orderBy(sortCols: _*)
      .select(col("__is_add") +: dataCols.map(col): _*)
      .collect()
      .map(r => (r.getBoolean(0),
        new GenericRowWithSchema(r.toSeq.drop(1).toArray, baseSchema): Row))
      .toSeq
  }

  /** Current materialized table (upsert view of the changelog). */
  def snapshot: Seq[Row] = snap.map(_.collect().toSeq).getOrElse(Nil)

  /** The tagged changelog as a DataFrame — (batch_id, is_add, data columns),
    * fully distributed (reads the parquet changelog the batches wrote). */
  def changesDf: DataFrame = {
    val df = sparkRef.read.parquet(outDir)
    df.select(Seq(col("__batch_id").cast("int").as("batch_id"),
      col("__is_add").as("is_add")) ++
      baseSchema.fieldNames.toSeq.map(col): _*)
  }
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
