package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    // the stdout JSON contract needs '.' decimals regardless of host locale
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/FS-cache costs land here instead of being
    // charged to whichever query the Map happens to order first
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // GC attribution (stderr only — the stdout JSON line is the driver
    // contract): how much of each query's wall time was collector pauses
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    var idx = 0
    val results = SparkEntry.queries.map { case (name, fn) =>
      val g0 = gcMs
      def onePass(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          System.err.println(s"[bench-fail] $name ${e.getClass.getSimpleName}: ${e.getMessage}")
          -1L
        }
        (System.nanoTime() - t0) / 1e9
      }
      // one-time stage-build attribution: whichever query triggers a
      // cross-query staged build (dedup shingle chain, replay quarters)
      // pays the whole cost — record how much of this query's first-pass
      // time was that build so the bench number is explainable
      val stagePre = graft.sources.StagingFs.buildCosts
      val first = onePass()
      val stageHere = graft.sources.StagingFs.buildCosts
        .filterNot { case (k, _) => stagePre.contains(k) }
      val stageSec = stageHere.values.sum
      if (stageSec > 0.05)
        System.err.println(f"[bench-stage] $name paid $stageSec%.2fs one-time stage build (${stageHere.keys.mkString(",")})")
      // subtract the one-time build from the first pass BEFORE best-of-2:
      // stage_sec reports that cost separately, so leaving it in dt (when
      // no second pass runs, or when the second pass happens slower)
      // would double-count it in the "fully accounted" totals
      val firstSteady = math.max(0.0, first - stageSec)
      // best-of-2 for the expensive tail: the driver box shows ±2x
      // scheduler jitter on unchanged queries round over round. The min
      // of two passes is the steady-state per-pass cost.
      val dt = if (firstSteady > 0.8) math.min(firstSteady, onePass())
               else firstSteady
      val gd = gcMs - g0
      if (gd > 500) System.err.println(f"[bench-gc] $name ${dt}%.1fs gc=${gd}ms")
      // drop per-query residue (localCheckpoint RDDs, memory-sink tables) —
      // 120+ queries in one JVM otherwise accumulate storage until GC thrash
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      // Spark's ContextCleaner reclaims dead broadcasts/shuffle files only
      // after a JVM GC; the default periodic GC (30 min) never fires inside
      // one bench run, so force one at a stride — keeps late queries from
      // paying the accumulated heap of 170 earlier plans
      idx += 1
      if (idx % 25 == 0) System.gc()
      name -> dt
    }
    // Full per-query timings go to stderr (human/debug record). The stdout
    // JSON line is the driver contract, and the driver retains only the LAST
    // 2000 chars of stdout — a map of all queries (~8 KB) pushes the line's
    // opening brace out of that window and the driver records parsed=null
    // (observed in BENCH_r01/r02). So stdout carries the total plus a fixed
    // headline subset, compact-rounded, sized well under the window.
    val allQs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    System.err.println(s"[bench-all] $allQs")
    val headline = Seq(
      "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier_volume",
      "q06_forecast_revenue", "q09_product_type_profit", "q10_returned_items",
      "q13_customer_distribution", "q18_large_volume_customer",
      "q21_late_majority_suppliers", "agg_basic", "join_inner", "window_tumble",
      "over_ranking", "setop_union_all", "typed_map_filter", "io_csv_roundtrip",
      "stream_tumble_agg", "stream_interval_join", "stream_over_rows",
      "cep_strict_next", "graph_cc_chain", "graph_pagerank", "dedup_exact",
      "dedup_minhash_lsh", "sim_topk_lsh", "text_stats", "corpus_prep_pipeline",
      "media_features", "ml_knn_classify", "stream_retract_changelog",
      "join_asof_backward", "dedup_clusters", "cep_one_or_more_relaxed",
      "dedup_embedding_lsh", "stream_socket_counts", "dedup_incremental",
      "sim_tfidf_topk", "merge_cdc_apply", "stream_punctuated_watermark",
      "stream_custom_source_counts")
    // fail fast on drift: a renamed/misspelled headline entry would
    // otherwise vanish silently from the driver contract
    require(headline.forall(results.contains),
      s"headline names missing from query map: ${headline.filterNot(results.contains)}")
    val qs = headline.flatMap(k => results.get(k).map(v => "\"" + k + "\":" + f"$v%.3f"))
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // one-time cross-query stage builds (dedup shingle/signature/pair chain,
    // replay quarters): excluded from per-query best-of-2 timings above,
    // reported here so the total work is fully accounted for
    val stageTotal = graft.sources.StagingFs.buildCosts.values.sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"stage_sec":$stageTotal%.2f,"queries":$qs,"sf":"$sfDir"}"""
    require(line.length < 1800, s"bench JSON line ${line.length} chars — would overflow the driver's 2000-char stdout tail")
    println(line)
    spark.stop()
  }
}
