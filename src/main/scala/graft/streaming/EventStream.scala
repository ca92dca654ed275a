package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import org.apache.hadoop.fs.Path
import graft.sources.{PhaseStats, StagingFs}

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

  /** Streamed schema for the staged raw fixture copy. The fixture's `ts`
    * physical type has varied across driver generations — INT64
    * TIMESTAMP(NANOS) (readable only as LongType via
    * spark.sql.legacy.parquet.nanosAsLong) vs native TIMESTAMP(MICROS)
    * (TimestampType) — so the streamed schema must match what the file
    * actually stores; a LongType schema over a µs file would re-divide
    * already-µs values and compress event time 1000×. */
  private def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The fixture's physical `ts` type, from the parquet footer — same
    * detection as the batch loader (`Tables.normalizeEvents`). LongType
    * for legacy INT64-nanos files (via nanosAsLong); Timestamp(NTZ)Type
    * for native timestamp[us]. Memoized per (dir, mtime/size stamp): the
    * footer parse + file listing would otherwise repeat for every one of
    * the ~20 streaming queries in a bench run, and the stamp key means an
    * in-place fixture regeneration still re-probes. */
  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()
  private def fixtureTsType(spark: SparkSession, dir: String): DataType = {
    val src = new Path(dir, "events.parquet")
    val key = dir + "|" + StagingFs.fileStamp(spark, src)
    tsTypeCache.computeIfAbsent(key, _ =>
      spark.read.parquet(src.toString).schema("ts").dataType)
  }

  /** Streaming view of `events` with a µs `ts` of TimestampType (LTZ) —
    * normalized per the fixture's ACTUAL physical type: LongType nanos →
    * integer ns→µs division; native timestamp → pass-through/cast. The
    * streamed type is always LTZ because Spark's event-time machinery
    * (`withWatermark`) rejects TIMESTAMP_NTZ, and the sessions run UTC so
    * the NTZ→LTZ cast is value-faithful.
    *
    * The file streaming source requires a directory; the fixture is a single
    * read-only file, so it is staged once as a stamped copy in the staging
    * root (a copy, not a symlink — symlinks don't exist on HDFS/S3, and the
    * copy works across schemes: local fixture → cluster staging root). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.install(spark)
    val tsType = fixtureTsType(spark, dir)
    val df = spark.readStream.schema(rawSchema(tsType))
      .parquet(stageDir(spark, dir))
    tsType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
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
        // copy to a temp name OUTSIDE the listed dir, then rename into
        // place: a second JVM sharing the staging root can never list a
        // partially written events.parquet (the synchronized block only
        // serializes within one JVM); stamp written only after the rename.
        // Stale .tmp- copies from a crashed earlier attempt are swept
        // first (age-gated so a CONCURRENT JVM's live copy is left alone).
        val fsys = StagingFs.fs(spark, stage)
        val tmpPrefix = stage.getName + ".tmp-"
        if (fsys.exists(stage.getParent))
          fsys.listStatus(stage.getParent)
            .filter(st => st.getPath.getName.startsWith(tmpPrefix) &&
              st.getModificationTime < System.currentTimeMillis() - 600000L)
            .foreach(st => fsys.delete(st.getPath, false))
        val tmp = new Path(stage.getParent,
          tmpPrefix + java.util.UUID.randomUUID().toString.take(8))
        StagingFs.copyFile(spark, src, tmp)
        val dst = new Path(stage, "events.parquet")
        StagingFs.delete(spark, dst)
        if (!fsys.rename(tmp, dst)) {
          // a concurrent JVM's rename can win between our delete and
          // rename — that copy is byte-identical (same stamp), so losing
          // the race is success; anything else is a real failure
          require(StagingFs.exists(spark, dst),
            s"rename $tmp -> $dst failed and no staged copy exists")
          fsys.delete(tmp, false)
        }
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
    // the quarters are staged ALREADY NORMALIZED to TimestampType (LTZ) —
    // no per-format unit branch here, the rewrite absorbed it
    spark.readStream.schema(rawSchema(TimestampType))
      .option("maxFilesPerTrigger", 1)
      .parquet(stageQuarters(spark, dir))
  }

  /** Stamp format version: bumped when the staged layout changes meaning
    * (v3 = quarters store normalized LTZ TimestampType ts), so stages
    * produced by an older build are invalidated even if the fixture itself
    * did not change. */
  private val stampVersion = "v3|"

  private[graft] def stageQuarters(spark: SparkSession, dir: String): String =
    stageSplit(spark, dir, "graft-stream-quarters",
      ((dayofmonth(col("ts")) - 1) / 8).cast("int"))

  /** Deterministic OUT-OF-ORDER replay: the fixture split round-robin by
    * `event_id % 4` instead of by time, so batches 1-3 each contain rows
    * whose event time is far behind the watermark established by the
    * earlier batches — the late-data path (allowedLateness /
    * sideOutputLateData) becomes value-oracle-able because the per-batch
    * watermark trajectory (cumulative prior-batch max(ts) − delay) is a
    * pure function of the data. */
  def readLateBatches(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.install(spark)
    spark.readStream.schema(rawSchema(TimestampType))
      .option("maxFilesPerTrigger", 1)
      .parquet(stageSplit(spark, dir, "graft-stream-rrobin",
        pmod(col("event_id"), lit(4)).cast("int")))
  }

  private def stageSplit(spark: SparkSession, dir: String, prefix: String,
                         splitCol: org.apache.spark.sql.Column): String =
    synchronized {
      val stage = StagingFs.namedStageDir(spark,
        prefix + "-" + Integer.toHexString(dir.hashCode))
      // the staged quarters are COPIES — invalidate them when the source
      // fixture was regenerated at the same path (mtime/size stamp),
      // otherwise multi-batch queries would silently replay stale data
      val src = new Path(dir, "events.parquet")
      val stampNow = stampVersion + StagingFs.fileStamp(spark, src)
      // sibling of the staged dir — the file streaming source lists every
      // file inside it, so the stamp must live outside
      val stampFile = new Path(stage.getParent, stage.getName + ".stamp")
      val fresh = StagingFs.exists(spark, new Path(stage, "q3.parquet")) &&
        StagingFs.readStamp(spark, stampFile).contains(stampNow)
      if (!fresh) {
        val t0 = System.nanoTime()
        StagingFs.mkdirs(spark, stage)
        // the batch loader already normalizes ts for any fixture format;
        // writing its output makes the quarters format-independent
        // persisted across the count + 4 quarter writes — without it the
        // full fixture scan + normalization re-executes 5×
        val raw = graft.Tables.load(spark, dir, "events")
          .select(rawSchema(LongType).fieldNames.toSeq.map(col): _*)
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("__q", splitCol)
          .persist()
        try {
          // a batch with zero rows means the replay silently degenerates
          // to fewer real micro-batches (r5 failure mode) — fail loudly
          val qCounts = raw.groupBy(col("__q")).count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
          require((0 to 3).forall(q => qCounts.getOrElse(q, 0L) > 0L),
            s"degenerate batch split (rows per batch: $qCounts) — " +
              "fixture no longer populates all 4 split buckets")
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
        } finally raw.unpersist()
        StagingFs.writeStamp(spark, stampFile, stampNow)
        // replay-quarter copies are cross-query one-time builds exactly
        // like the stageOnce dedup stages — ledger them so the bench's
        // stage attribution covers them too (persistent across JVMs via
        // the stamp, so a warm stage records nothing)
        StagingFs.recordBuild(s"$dir#$prefix",
          (System.nanoTime() - t0) / 1e9)
      }
      stage.toString
    }

  /** Stop/restore across a REAL restart — the reference's savepoint →
    * resume contract (`flink-runtime` checkpointing; `SavepointV2`):
    * run a stateful aggregation over the FIRST TWO replay quarters with a
    * checkpoint, let the query terminate, then start a NEW query from the
    * same checkpoint after the remaining quarters appear. The restored
    * run must produce the aggregate over ALL the data — counts covering
    * only the post-restart files would mean the state never came back,
    * so the batch oracle pins recovery exactly. */
  def checkpointRecoveryCounts(spark: SparkSession, dir: String): DataFrame = {
    val quarters = stageQuarters(spark, dir)
    val work = StagingFs.newStageDir(spark, "graft-ckpt-src")
    val ckpt = StagingFs.newStageDir(spark, "graft-ckpt-state")
    def copyQ(q: Int): Unit = StagingFs.copyFile(spark,
      new Path(quarters, s"q$q.parquet"), new Path(work, s"q$q.parquet"))
    def runOnce(): DataFrame = {
      val name = s"graft_stream_ckpt_${runId.incrementAndGet()}"
      val counts = spark.readStream.schema(rawSchema(TimestampType))
        .option("maxFilesPerTrigger", 1).parquet(work)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      graft.operators.PartitionOps.withShufflePartitions(spark, 4) {
        val q = counts.writeStream.format("memory").queryName(name)
          .outputMode("complete").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      spark.table(name)
    }
    (0 to 1).foreach(copyQ)
    val firstRun = runOnce() // terminates; state lives only in the checkpoint
    require(firstRun.count() > 0, "pre-restart run produced no state")
    (2 to 3).foreach(copyQ)
    val restored = runOnce() // NEW query, fresh sink — restored state + q2/q3
    // a recovery failure (no batch fired, state not restored) must report
    // itself directly, not as a confusing oracle hash mismatch downstream
    require(restored.count() > 0,
      "post-restart run produced no output — checkpoint state not restored")
    restored
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
  // feeder payload cache: the socket FEEDER (test harness, not the
  // operator) replays the fixture's user_id column; memoized per
  // (dir, fixture stamp) like the staged file copies, so a best-of-2
  // bench pass doesn't re-scan the fixture to refill the feed
  private val feedIdsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def socketCounts(spark: SparkSession, dir: String,
                   format: String = "socket",
                   statePartitions: Int = 1,
                   sourcePartitions: Int = 1,
                   sampleMod: Long = 1L): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1: $sampleMod")
    val t0 = System.nanoTime()
    def sinceS: Double = (System.nanoTime() - t0) / 1e9
    // phase tag for the bench JSON: the builtin-source 100k replay is
    // "socket"; the subsampled feed and the DSv2 source get their own keys
    val phaseTag =
      if (format != "socket") "socket_dsv2"
      else if (sampleMod == 1L) "socket"
      else s"socket_mod$sampleMod"
    val srcStamp = dir + "|mod" + sampleMod + "|" +
      StagingFs.fileStamp(spark, new Path(dir, "events.parquet"))
    val userIds = feedIdsCache.computeIfAbsent(srcStamp, _ => {
      val ev = graft.Tables.load(spark, dir, "events")
      // sampleMod > 1: a deterministic key-subset feed (event_id stride) —
      // the volume-slope companion row that separates per-row drain cost
      // from the fixed micro-batch/harness overhead
      val sub = if (sampleMod == 1L) ev
                else ev.filter(col("event_id") % sampleMod === 0L)
      sub.select(col("user_id")).collect().map(_.getLong(0))
    })
    val tIds = sinceS
    val server = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    // PrintWriter never throws — a broken pipe mid-feed would silently drop
    // rows and the wait loop below would stall to its deadline with a
    // generic "incomplete" message; surface the real cause instead
    val feedError = new java.util.concurrent.atomic.AtomicReference[String](null)
    val feedsDone = new java.util.concurrent.atomic.AtomicInteger(0)
    // ACCEPT LOOP, full replay per connection: the source owns exactly one
    // live connection at a time, but it may connect more than once (query
    // (re)initialization races) — a single accept would feed a dead socket
    // and stall the wait loop to its 120 s deadline. Rows written to a
    // connection the source abandoned are discarded with that source
    // instance, so replaying the full fixture per accept stays exact.
    val feeder = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          try {
            val out = new java.io.PrintWriter(new java.io.BufferedWriter(
              new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"),
              1 << 16))
            userIds.foreach(out.println)
            out.flush()
            if (out.checkError()) feedError.set("socket write failed mid-feed")
            else feedsDone.incrementAndGet()
          } finally sock.close()
        }
      } catch {
        case _: Throwable if server.isClosed => // normal shutdown
        case e: Throwable => feedError.set(e.toString)
      }
    }, "graft-socket-feeder")
    feeder.setDaemon(true)
    feeder.start()
    val name = s"graft_stream_socket_${runId.incrementAndGet()}"
    // numPartitions only for the graft source: the BUILT-IN socket source
    // also honors it, and pinning it to 1 there serializes its ~1 ms/row
    // line conversion onto one task (measured 2 s -> 97 s per 100k-row
    // batch) — its default defaultParallelism split is what keeps the
    // baseline query at its usual cost
    val reader0 = spark.readStream.format(format)
      .option("host", "127.0.0.1").option("port", server.getLocalPort)
    val reader = if (format == "socket") reader0
      else reader0.option("numPartitions", sourcePartitions)
    val counts = reader.load()
      .select(col("value").cast("long").as("user_id"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    // ONE state partition: a socket is parallelism-1 by the reference's own
    // semantics and the keyed state is ~150 users — every extra state-store
    // instance is a per-micro-batch open/commit tax with nothing to shard
    graft.operators.PartitionOps.withShufflePartitions(spark, statePartitions) {
      val q = counts.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      def total(): Long = {
        val t = spark.table(name).agg(sum(col("n"))).collect()(0)
        if (t.isNullAt(0)) 0L else t.getLong(0)
      }
      val deadline = System.nanoTime() + 120L * 1000L * 1000L * 1000L
      try {
        // let one full feed land in the source's receive buffer BEFORE the
        // first poll — the whole fixture then processes in one or two
        // micro-batches instead of one per 50 ms poll tick (each complete-
        // mode micro-batch pays a full state commit + sink rewrite)
        while (feedsDone.get == 0 && feedError.get == null &&
               System.nanoTime() < deadline) Thread.sleep(10)
        val tFeed = sinceS
        while (feedError.get == null && total() < userIds.length &&
               System.nanoTime() < deadline) {
          q.processAllAvailable()
          // the source's reader thread can lag the feeder's flush; poll
          // gently — stragglers are the exception, not the steady state
          if (total() < userIds.length) Thread.sleep(100)
        }
        // one-line cost attribution (profiled round 7): the data batch's
        // addBatch inside Spark's socket micro-batch machinery is the
        // floor (~2.3 s warm for 100k rows at sf0.1); ids/feed/empty-batch
        // are the variable parts this harness can and does minimize
        val tDone = sinceS
        System.err.println(f"[socket-cost] ids=$tIds%.2fs feed=$tFeed%.2fs " +
          f"done=$tDone%.2fs batches=${q.recentProgress.map(p =>
            s"${p.batchId}:${p.numInputRows}:${p.durationMs.get("addBatch")}ms")
            .mkString(",")}")
        // same split, driver-visible: Bench folds these into its final
        // stdout JSON line (the stderr line above never survives the
        // driver's output truncation)
        PhaseStats.recordMin(s"${phaseTag}_ids", tIds)
        PhaseStats.recordMin(s"${phaseTag}_feed", tFeed - tIds)
        PhaseStats.recordMin(s"${phaseTag}_drain", tDone - tFeed)
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
    * vs 10.4 s at 8 for the full-outer interval join, and the round-10
    * phase split showed commit cost ∝ partitions × batches × stores —
    * re-measured across the single-batch family, 4 beats 8 by ~0.5–1 s per
    * row (tumble_append 3.0 → 2.0, session_append 3.5 → 2.6, full-outer
    * interval 2.7 → 2.2) with no row slower, hence the default.
    * `statePartitions` right-sizes the fixture runs; a real deployment
    * sizes it to cluster cores × state volume instead.
    *
    * `phase`: when set, the per-micro-batch cost split Spark already
    * collects ([[org.apache.spark.sql.streaming.StreamingQueryProgress]])
    * is folded into [[PhaseStats]] under `<phase>_*` keys so the bench
    * artifact attributes multi-batch streaming rows the same way it
    * attributes the socket/retract/iterate harnesses:
    *   `_batches`     micro-batch count (incl. no-data watermark batches)
    *   `_addbatch`    Σ addBatch ms — planning + shuffle + state work
    *   `_statecommit` Σ state-store commit ms across operators/batches
    *   `_overhead`    Σ (triggerExecution − addBatch) — offset/commit log,
    *                  source listing, trigger bookkeeping
    * SCOPE (bench-JSON reader contract): each phase prefix is recorded by
    * exactly ONE query row — `interval_mb` = stream_interval_join_multibatch
    * only (the other four interval rows pass no phase), `cep_mb` =
    * cep_stream_multibatch, `cep_to` = cep_stream_timeout. And
    * `_statecommit` SUMS commitTimeMs over every state-store INSTANCE
    * (operators × partitions × batches), instances that run in parallel —
    * so it is a CPU-seconds-like figure that can legitimately EXCEED the
    * row's wall time (4 stores × 4 partitions × 5 batches ≈ 80 commits
    * for the interval row); divide by instances for per-commit cost, don't
    * read it as elapsed time. recordMin semantics match the bench's
    * best-of-2: the split describes the best pass. */
  /** Family-derived statePartitions — the r11 ladder's deployment rule as
    * code (the prose lived in DESIGN.md; r11 verdict item 4). The measured
    * optima over {2,4,8,16,32} × {100k, 1M, 10M events} × 16 cores:
    *
    *  - `join` (stream-stream interval/window joins): **constant 4** —
    *    4 state stores per partition mean per-instance fixed commit cost
    *    dominates through at least 10M events/replay (commit sums grow
    *    ~quadratically with partitions while join compute stays small).
    *  - `session` (merging windows / per-row state WORK): rows / 62.5k,
    *    clamped to [4, 2·cores] — fits every ladder cell exactly
    *    (100k → 4, 1M → 16, 10M → 32 on the 16-core box); the merge sort
    *    parallelizes, so the compute regime wants partitions ∝ volume.
    *  - `cep` (flatMapGroupsWithState NFA): rows / 125k clamped to
    *    [4, cores] (100k → 4, 1M → 8, 10M → 16) — per-key NFA advance is
    *    compute but the per-partition HDFSBackedStateStore commit tax
    *    catches up one octave earlier than session's.
    *
    * Callers pass the expected replay volume (or `replayTable.count()` —
    * a parquet-metadata read); fixture-scale replays derive the same 4 the
    * bench rows were tuned to, so this is behavior-neutral below ~780k
    * events and ladder-optimal above. */
  def derivedStatePartitions(family: String, replayRows: Long,
                             cores: Int =
                               Runtime.getRuntime.availableProcessors()): Int = {
    require(replayRows >= 0, s"replayRows must be >= 0: $replayRows")
    require(cores >= 1, s"cores must be >= 1: $cores")
    family match {
      case "join" => 4
      case "session" =>
        math.max(4L, math.min(replayRows / 62500L, 2L * cores)).toInt
      case "cep" =>
        math.max(4L, math.min(replayRows / 125000L, cores.toLong)).toInt
      case other => throw new IllegalArgumentException(
        s"unknown stateful-op family '$other' (join|session|cep)")
    }
  }

  def runToTable(spark: SparkSession, df: DataFrame, mode: String,
                 statePartitions: Int = 4,
                 phase: Option[String] = None): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    graft.operators.PartitionOps.withShufflePartitions(spark, statePartitions) {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      phase.foreach { p =>
        val prog = q.recentProgress
        def dur(key: String): Double = prog.map(b =>
          Option(b.durationMs.get(key)).map(_.toDouble).getOrElse(0.0)).sum / 1e3
        val stateCommit = prog.map(
          _.stateOperators.map(_.commitTimeMs.toDouble).sum).sum / 1e3
        PhaseStats.recordMin(s"${p}_batches", prog.length.toDouble)
        PhaseStats.recordMin(s"${p}_addbatch", dur("addBatch"))
        PhaseStats.recordMin(s"${p}_statecommit", stateCommit)
        PhaseStats.recordMin(s"${p}_overhead",
          math.max(0.0, dur("triggerExecution") - dur("addBatch")))
      }
    }
    spark.table(name)
  }
}
