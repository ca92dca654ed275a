package graft

import org.apache.spark.sql.SparkSession

/** Scaling-evidence runner (DESIGN.md "sf1 scaling" table): times a fixed
  * set of data-scaling queries at two fixture scales in one warmed JVM and
  * prints per-query seconds + the sf1/sf0.1 ratio. Linear-ish ratios (≲10×
  * for 10× data on a fixed 32-core box) mean the plan scales with data;
  * a superlinear ratio is a scale-killer surfaced early.
  *
  * Streaming replay queries are deliberately absent: their cost is
  * micro-batch fixed overhead × replay count (DESIGN.md), not data volume,
  * so a 10× fixture measures the harness, not the engine.
  */
object BenchScale {

  /** Batch queries whose cost is data-driven, spanning every heavy family:
    * TPC-H joins/aggs, dedup (exact + staged LSH chain + clusters +
    * embedding), similarity (tfidf/lsh/knn), graph iteration, corpus prep,
    * merge/CDC, as-of, text. */
  val ScaleSet: Seq[String] = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier_volume",
    "q09_product_type_profit", "q10_returned_items", "q13_customer_distribution",
    "q18_large_volume_customer", "agg_basic", "join_inner",
    "dedup_exact", "dedup_minhash_lsh", "dedup_clusters", "dedup_embedding_lsh",
    "sim_tfidf_topk", "sim_topk_lsh", "ml_knn_classify",
    "graph_cc_chain", "graph_pagerank",
    "corpus_prep_pipeline", "text_stats", "merge_cdc_apply",
    "join_asof_backward", "window_tumble", "over_ranking",
    // round-8 additions: the new curation ops are all data-driven
    "dedup_semantic", "dedup_substring_spans", "dedup_substring_apply",
    "text_lm_fluency", "corpus_chunk_windows",
    // round-9 additions
    "corpus_bpe_train", "corpus_bpe_encode", "ts_sax_motifs",
    "ts_sax_motifs_znorm", "corpus_split_leakage_safe",
    // round-9 continuation: retrieval + curation family
    "sim_bm25_topk", "sim_mmr_rerank", "sim_contrastive_pairs",
    "dedup_canonical_select", "text_winnowing", "dedup_winnowing_pairs",
    "corpus_dsir_sample", "corpus_source_overlap", "sim_recall_lsh",
    "corpus_decontaminate", "dedup_winnowing_incremental",
    // round-10 addition: the pruned-assigner scale path
    "dedup_semantic_pruned",
    // round-10 continuation: paragraph dedup, composed/filtered ANN,
    // balancing/mixing, index audits, vocabulary gates
    "dedup_paragraph", "dedup_paragraph_apply", "text_lexical_diversity",
    "corpus_domain_cap", "corpus_cluster_balance", "sim_topk_ivf_filtered",
    "sim_ivf_pq_topk", "corpus_temperature_sample", "dedup_lsh_precision",
    // flat-ADC baseline: the sf10 IVF-PQ comparison row
    "sim_pq_adc_topk",
    "dedup_paragraph_incremental", "corpus_curation_pipeline",
    "sim_ivf_pq_pruned", "sim_random_projection", "sim_topk_projected",
    // round-10 continuation: SQ8 search, knn graph family, calibration,
    // ingest novelty
    "sim_sq8_topk", "sim_knn_graph", "sim_knn_clusters",
    "corpus_quality_calibrate", "corpus_batch_novelty",
    "text_keywords", "corpus_embedding_drift",
    "dedup_winnowing_containment", "sim_ivf_sq8_topk", "sim_hybrid_rrf", "sim_bm25_prf", "sim_recall_ivf",
    // round-11 additions: trained-centroid IVF, projection-inside-IVF,
    // bucketed-lake probe, prefix/MRL shortlist, hard negatives,
    // curriculum ordering
    "sim_topk_ivf_trained", "sim_topk_ivf_projected", "sim_topk_ivf_lake",
    "sim_topk_prefix", "sim_hard_negatives", "corpus_curriculum_order",
    "sim_knn_label_smooth", "sim_pq_adc_trained", "sim_ivf_incremental",
    // round-12 additions: split executor, trained-composed member, and the
    // recall audits for the whole shortlist/quantization family
    "sim_ivf_split", "sim_topk_ivf_projected_trained",
    "sim_recall_prefix", "sim_recall_projected", "sim_recall_sq8",
    "sim_recall_ivf_projected", "sim_recall_ivf_seeded",
    "sim_recall_ivf_trained",
    "sim_ivf_lake_split", "sim_topk_ivf_lake_split",
    "sim_recall_ivf_probe_trained",
    // round-13: the FULL relational spine (r12 verdict item 5 — every
    // LLM-family row had ladder evidence, the 22 q* rows had 7)
    "q02_min_cost_supplier", "q04_order_priority", "q06_forecast_revenue",
    "q07_volume_shipping", "q08_market_share", "q11_important_parts",
    "q12_priority_shipping", "q14_promo_share", "q15_top_supplier",
    "q16_parts_supplier_relation", "q17_small_qty_revenue",
    "q19_disjunctive", "q20_potential_promotion",
    "q21_late_majority_suppliers", "q22_global_sales_opportunity")

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dirSmall = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dirBig = if (args.length > 1) args(1) else "bench-data/sf1"
    // optional 3rd arg: comma-separated query filter (focused re-measures)
    val scaleSet =
      if (args.length > 2) ScaleSet.filter(args(2).split(",").toSet)
      else ScaleSet
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(dir: String): Map[String, (Double, Double)] = {
      // REAL column-data warmup: count() on parquet reads only footers, so
      // the first query would otherwise pay the cold read of every column
      // it touches (measured: q01 14.2 s cold vs 1.0 s warm at sf1). A noop
      // write deserializes every column in parallel into the page cache —
      // the steady-state (plan-scaling) number is what this table is for.
      // Partial fixtures (the sf10 documents/embeddings ladder) warm only
      // the tables they carry.
      Tables.names
        .filter(n => new java.io.File(s"$dir/$n.parquet").exists())
        .foreach(n =>
          Tables.load(spark, dir, n).write.format("noop").mode("overwrite").save())
      scaleSet.map { name =>
        val fn = SparkEntry.queries(name)
        def onePass(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val stagePre = graft.sources.StagingFs.buildCosts
        val first = onePass()
        val stageSec = graft.sources.StagingFs.buildCosts
          .filterNot { case (k, _) => stagePre.contains(k) }.values.sum
        val firstSteady = math.max(0.0, first - stageSec)
        // min-of-2, plus a tie-break pass when the two disagree >2× (the
        // driver box shows occasional 3-4× GC/scheduler hiccups — q18 at
        // sf1 measured 4.5, 4.9, 16.8, 4.5 s across reps)
        val dt = if (firstSteady > 0.5) {
          val second = onePass()
          val m = math.min(firstSteady, second)
          if (math.max(firstSteady, second) > 2 * m) math.min(m, onePass())
          else m
        } else firstSteady
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.err.println(f"[scale] $dir $name pass=$dt%.2fs stage=$stageSec%.2fs")
        name -> (dt, stageSec)
      }.toMap
    }

    val small = run(dirSmall)
    System.gc()
    val big = run(dirBig)
    println(f"| query | ${dirSmall.split('/').last} s | ${dirBig.split('/').last} s | ratio | stage s (big) |")
    println("|---|---|---|---|---|")
    scaleSet.foreach { q =>
      val (s, _) = small(q); val (b, bs) = big(q)
      val ratio = if (s > 0.005) f"${b / s}%.1fx" else "n/a"
      println(f"| $q | $s%.2f | $b%.2f | $ratio | $bs%.1f |")
    }
    val (ts, tb) = (small.values.map(_._1).sum, big.values.map(_._1).sum)
    println(f"| TOTAL (per-pass) | $ts%.2f | $tb%.2f | ${tb / ts}%.1fx | " +
      f"${big.values.map(_._2).sum}%.1f |")
    spark.stop()
  }
}
