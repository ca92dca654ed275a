package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream
import graft.streaming.EventStream.EventRow
import graft.cep.{Cep, Pattern}

/** Streaming scale ladder (round-11 companion of [[BenchScale]]): drives
  * the stateful multi-batch families — interval join, merging session
  * windows, CEP NFA — over 10×/100× event fixtures at several
  * `statePartitions` settings, and prints per-run wall time plus the
  * state-store metrics Spark already collects (micro-batch count, Σ
  * addBatch, Σ state commit, end-of-stream state rows, peak state memory).
  *
  * What it exists to catch: the fixture-tuned statePartitions knob (4 —
  * right because per-store open/commit FIXED cost dominates a 100k-event
  * replay) must REVERSE once per-row state work dominates; this ladder
  * measures where. Usage:
  *
  *   runMain graft.ProbeStreamScale \
  *     sf0.1=/root/testdata/sf0.1,sf1=bench-data/sf1 [2,4,8,16] [all|interval|session|cep]
  *
  * Fixture dirs need only events.parquet ([[GenScale]] with the `events`
  * table filter generates the 10×/100× copies: user cardinality scales,
  * time range fixed → per-user event density constant, window/join density
  * ×N — what a genuinely bigger stream does).
  */
object ProbeStreamScale {

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** [[EventStream.runToTable]] with the progress metrics surfaced instead
    * of folded into PhaseStats: (output rows, wall s, detail line). */
  private def runMetered(spark: SparkSession, df: DataFrame, mode: String,
                         parts: Int): (Long, Double, String) = {
    val name = s"graft_ladder_${runId.incrementAndGet()}"
    // recentProgress is a ring buffer capped at numRecentProgressUpdates
    // (default 100): a 100× replay with more micro-batches than that would
    // silently undercount batches=/addbatch/commit sums below
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    val t0 = System.nanoTime()
    var detail = ""
    graft.operators.PartitionOps.withShufflePartitions(spark, parts) {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val prog = q.recentProgress
      def dur(k: String): Double = prog.map(b =>
        Option(b.durationMs.get(k)).map(_.toDouble).getOrElse(0.0)).sum / 1e3
      val commit = prog.map(
        _.stateOperators.map(_.commitTimeMs.toDouble).sum).sum / 1e3
      val peakMemMb = (prog.map(_.stateOperators.map(_.memoryUsedBytes).sum)
        ++ Seq(0L)).max / 1e6
      val stateRows = prog.reverse.collectFirst {
        case b if b.stateOperators.nonEmpty =>
          b.stateOperators.map(_.numRowsTotal).sum
      }.getOrElse(0L)
      detail = f"batches=${prog.length} addbatch=${dur("addBatch")}%.2fs " +
        f"commit=$commit%.2fs staterows=$stateRows statemb=$peakMemMb%.1f"
    }
    val rows = spark.table(name).count()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    (rows, (System.nanoTime() - t0) / 1e9, detail)
  }

  /** stream_interval_join_multibatch body (Streaming.scala), statePartitions
    * externalized. */
  private def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = EventStream.readMultiBatch(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
  }

  /** stream_session_append body: cross-batch merging session windows. */
  private def sessionAppend(s: SparkSession, dir: String): DataFrame =
    EventStream.readMultiBatch(s, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_cents"))
      .select(col("session_window.start").as("w_start"),
        col("session_window.end").as("w_end"),
        col("user_id"), col("n"), col("sum_cents"))

  /** cep_stream_multibatch body: cross-batch NFA state. */
  private def cepMultibatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = (e: EventRow) => (e.ts.getTime, e.event_id)
    val p = Pattern.begin[EventRow]("a")(_.event_type == "click")
      .next("b")(_.event_type == "purchase")
    val stream = EventStream.readMultiBatch(s, dir).as[EventRow]
    Cep.streaming(stream, (e: EventRow) => e.user_id, ord, p,
      unboundedState = true) {
      (k, m) => (k, m.first("a").event_id, m.first("b").event_id)
    }.toDF("user_id", "a_id", "b_id")
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val fixtures = args.headOption
      .getOrElse("sf0.1=/root/testdata/sf0.1,sf1=bench-data/sf1")
      .split(',').toSeq.map { kv =>
        val Array(l, d) = kv.split("=", 2); (l, d)
      }
    val partsList = (if (args.length > 1) args(1) else "2,4,8,16")
      .split(',').toSeq.map(_.trim.toInt)
    val which = if (args.length > 2) args(2) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up
    val queries: Seq[(String, (SparkSession, String) => DataFrame, String)] =
      Seq(
        ("interval", intervalJoin _, "append"),
        ("session", sessionAppend _, "append"),
        ("cep", cepMultibatch _, "append"))
      .filter { case (n, _, _) => which == "all" || which == n }
    for ((label, dir) <- fixtures; (qn, fn, mode) <- queries;
         parts <- partsList) {
      // interval join: no-data batches disabled exactly like the bench row
      val run = () => runMetered(spark, fn(spark, dir), mode, parts)
      val (rows, wall, detail) =
        if (qn == "interval")
          graft.operators.PartitionOps.withConf(spark,
            "spark.sql.streaming.noDataMicroBatches.enabled", "false")(run())
        else run()
      println(f"[stream-ladder] fixture=$label query=$qn parts=$parts " +
        f"rows=$rows wall=$wall%.2fs $detail")
    }
    spark.stop()
  }
}
