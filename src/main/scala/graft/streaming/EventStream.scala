package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import org.apache.hadoop.fs.Path
import graft.sources.StagingFs

import java.sql.Timestamp

/** Streaming ingestion of the `events` fixture + run helpers.
  *
  * The events table replays through Spark's file streaming source
  * (`readStream.parquet`) — the real Structured Streaming scan, state and
  * sink machinery run end-to-end; `Trigger.AvailableNow` drains the input and
  * terminates, so end-of-stream results are comparable against the batch
  * (DuckDB) oracle. Incremental multi-batch behavior is exercised separately
  * with `MemoryStream` in StreamingSpec.
  */
object EventStream {

  case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, value: Double, props: String)

  /** Raw parquet schema — ts is INT64 TIMESTAMP(NANOS), read as long (the
    * session sets spark.sql.legacy.parquet.nanosAsLong). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming view of `events` with a proper µs TimestampType `ts`
    * (integer ns→µs division — same as the batch loader).
    *
    * The file streaming source requires a directory; the fixture is a single
    * read-only file, so it is staged once as a stamped copy in the staging
    * root (a copy, not a symlink — symlinks don't exist on HDFS/S3, and the
    * copy works across schemes: local fixture → cluster staging root). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.install(spark)
    spark.readStream.schema(rawSchema).parquet(stageDir(spark, dir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def stageDir(spark: SparkSession, dir: String): String =
    synchronized {
      val src = new Path(dir, "events.parquet")
      val stage = StagingFs.namedStageDir(spark,
        "graft-stream-src-" + Integer.toHexString(dir.hashCode))
      // mtime/size stamp invalidates the copy if the fixture regenerates at
      // the same path; stamp lives OUTSIDE the dir the file source lists
      val stampFile = new Path(stage.getParent, stage.getName + ".stamp")
      val stampNow = StagingFs.fileStamp(spark, src)
      val fresh = StagingFs.exists(spark, new Path(stage, "events.parquet")) &&
        StagingFs.readStamp(spark, stampFile).contains(stampNow)
      if (!fresh) {
        StagingFs.mkdirs(spark, stage)
        StagingFs.copyFile(spark, src, new Path(stage, "events.parquet"))
        StagingFs.writeStamp(spark, stampFile, stampNow)
      }
      stage.toString
    }

  /** Deterministic MULTI-batch replay: the events fixture split into 4
    * time-quarter parquet files with strictly increasing modification
    * times, read with `maxFilesPerTrigger = 1` — the file source then
    * processes exactly one quarter per micro-batch, in time order, so
    * micro-batch ids (and everything derived from them, like retract
    * changelogs) are data-determined and oracle-comparable. */
  def readMultiBatch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.install(spark)
    spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageQuarters(spark, dir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def stageQuarters(spark: SparkSession, dir: String): String =
    synchronized {
      val stage = StagingFs.namedStageDir(spark,
        "graft-stream-quarters-" + Integer.toHexString(dir.hashCode))
      // the staged quarters are COPIES — invalidate them when the source
      // fixture was regenerated at the same path (mtime/size stamp),
      // otherwise multi-batch queries would silently replay stale data
      val src = new Path(dir, "events.parquet")
      val stampNow = StagingFs.fileStamp(spark, src)
      // sibling of the staged dir — the file streaming source lists every
      // file inside it, so the stamp must live outside
      val stampFile = new Path(stage.getParent, stage.getName + ".stamp")
      val fresh = StagingFs.exists(spark, new Path(stage, "q3.parquet")) &&
        StagingFs.readStamp(spark, stampFile).contains(stampNow)
      if (!fresh) {
        StagingFs.mkdirs(spark, stage)
        val raw = spark.read.schema(rawSchema).parquet(src.toString)
          .withColumn("__q",
            ((dayofmonth(timestamp_micros(expr("ts div 1000"))) - 1) / 8)
              .cast("int"))
        (0 to 3).foreach { q =>
          val tmpOut = new Path(stage, s"tmp_q$q")
          raw.filter(col("__q") === q).drop("__q")
            .coalesce(1).write.mode("overwrite").parquet(tmpOut.toString)
          val part = StagingFs.listParts(spark, tmpOut.toString).head.getPath
          val dst = new Path(stage, s"q$q.parquet")
          StagingFs.delete(spark, dst)
          require(StagingFs.fs(spark, part).rename(part, dst),
            s"rename $part -> $dst failed")
          // strictly increasing mtimes pin the micro-batch order
          StagingFs.setMtime(spark, dst, 1700000000000L + q * 60000L)
          StagingFs.delete(spark, tmpOut)
        }
        StagingFs.writeStamp(spark, stampFile, stampNow)
      }
      stage.toString
    }

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Non-file streaming ingestion: feed the events fixture through a
    * localhost TCP socket and read it back with Spark's socket source —
    * the reference's `addSource` / `socketTextStream` family
    * (`StreamExecutionEnvironment.java:1186-1270`), the one source kind the
    * file-replay fixtures don't exercise. Returns the per-user counts once
    * the FULL fixture has been consumed: the aggregation runs in complete
    * mode, so the final table is batch-deterministic no matter how the
    * socket bytes chunk into micro-batches.
    *
    * A socket is a single-point ingress in the reference too (parallelism
    * 1) — this is a correctness surface, not a scale path; the feeder
    * collect is the test harness, not the operator. */
  def socketCounts(spark: SparkSession, dir: String): DataFrame = {
    val userIds = graft.Tables.load(spark, dir, "events")
      .select(col("user_id")).collect().map(_.getLong(0))
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    // PrintWriter never throws — a broken pipe mid-feed would silently drop
    // rows and the wait loop below would stall to its deadline with a
    // generic "incomplete" message; surface the real cause instead
    val feedError = new java.util.concurrent.atomic.AtomicReference[String](null)
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8")))
        try {
          userIds.foreach(out.println)
          out.flush()
          if (out.checkError()) feedError.set("socket write failed mid-feed")
        } finally sock.close()
      } catch { case e: Throwable => feedError.set(e.toString) }
      finally server.close()
    }, "graft-socket-feeder")
    feeder.setDaemon(true)
    feeder.start()
    val name = s"graft_stream_socket_${runId.incrementAndGet()}"
    val counts = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", server.getLocalPort).load()
      .select(col("value").cast("long").as("user_id"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    graft.operators.PartitionOps.withShufflePartitions(spark, 8) {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      def total(): Long = {
        val t = spark.table(name).agg(sum(col("n"))).collect()(0)
        if (t.isNullAt(0)) 0L else t.getLong(0)
      }
      val deadline = System.nanoTime() + 120L * 1000L * 1000L * 1000L
      try {
        while (feedError.get == null && total() < userIds.length &&
               System.nanoTime() < deadline) {
          q.processAllAvailable()
          if (total() < userIds.length) Thread.sleep(50)
        }
      } finally {
        q.stop()
        server.close() // idempotent; unblocks a feeder still in accept()
      }
      require(feedError.get == null, s"socket feeder failed: ${feedError.get}")
      require(total() == userIds.length,
        s"socket replay incomplete: ${total()} of ${userIds.length} rows")
    }
    spark.table(name)
  }

  /** Run a streaming DataFrame to completion into a memory sink, return the
    * result table. `AvailableNow` processes the full backlog then stops.
    *
    * The number of state-store instances a stateful streaming query runs is
    * frozen to `spark.sql.shuffle.partitions` at its FIRST micro-batch — a
    * sizing decision, not a semantic one (hash layout only; results are
    * partition-count independent, which the DuckDB oracles already prove
    * across verify/bench configs). Each instance pays fixed open/commit/
    * checkpoint cost per micro-batch, so over-sharding a small stream is
    * pure overhead: the 10k-event fixture measured 16.1 s at 32 partitions
    * vs 10.4 s at 8 for the full-outer interval join. `statePartitions`
    * right-sizes the fixture runs; a real deployment sizes it to cluster
    * cores × state volume instead. */
  def runToTable(spark: SparkSession, df: DataFrame, mode: String,
                 statePartitions: Int = 8): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    graft.operators.PartitionOps.withShufflePartitions(spark, statePartitions) {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.table(name)
  }
}
