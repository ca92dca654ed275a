package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout primitives for the 100 TB lake (LLM-pipeline
  * extension; no reference counterpart — Flink 1.4 wrote what it was
  * given). Two problems every large corpus hits:
  *
  *  1. DATA SKIPPING: a scan filtered on two dimensions reads everything
  *     when files are clustered on only one. Z-order interleaving makes
  *     every file's (x, y) bounding box tight, so parquet footer min/max
  *     stats prune on BOTH dimensions.
  *  2. SMALL FILES: streaming/incremental writers fragment a table into
  *     thousands of KB-sized files; listing + open overhead then dominates
  *     scans. Compaction rewrites to a bounded file count.
  *
  * Everything here is pure layout — content is identical by construction,
  * which is exactly what the value oracles pin; the layout EFFECT
  * (bounding-box tightness, file counts) is asserted by LayoutSpec.
  */
object LayoutOps {

  /** Morton (z-order) value of two non-negative integer dimensions: the
    * low `bits` of x and y bit-interleaved (x odd positions, y even).
    * Pure higher-order integer expression — codegen'd, no UDF, and
    * restated verbatim in SQL engines for the value oracle. */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column = {
    val pairs = (0 until bits).map { i =>
      (shiftleft(shiftrightunsigned(x.cast("long"), i) % 2, 2 * i + 1),
        shiftleft(shiftrightunsigned(y.cast("long"), i) % 2, 2 * i))
    }
    pairs.map { case (a, b) => a + b }.reduce(_ + _)
  }

  /** Z-order-clustered write: range-partition on the Morton value (total
    * order across files) and sort within each partition, then write
    * parquet. Every output file covers a compact Morton range, i.e. a
    * tight (x, y) rectangle — min/max stats prune multi-dimensional
    * filters. `nFiles` sizes output to the target file size at scale. */
  def zorderWrite(df: DataFrame, path: String, x: Column, y: Column,
                  nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zorderValue(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Compact a fragmented parquet directory to about `targetFileBytes`
    * per file: one read, one round-robin repartition sized from the
    * actual on-disk footprint, one write. Content-identical by
    * construction; the rewrite cost is one pass — the once-a-day
    * maintenance job that keeps scan parallelism aligned with data
    * volume instead of with the writer's commit cadence. */
  def compactFiles(spark: org.apache.spark.sql.SparkSession,
                   srcDir: String, dstDir: String,
                   targetFileBytes: Long): Int = {
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val fs = graft.sources.StagingFs.fs(spark, src)
    val bytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(dstDir)
    nFiles
  }

  /** IVF-BUCKETED lake layout: the corpus written `partitionBy(cell)` —
    * the materialized form of the claim every IVF scaladoc here makes
    * ("at 100 TB the corpus is written bucketed by cell; a probe touches
    * 1/cells of the data"). Cell placement is [[SimilarityOps.ivfAssign]]
    * over the smallest-id seeds (swap trained centroids or the pruned
    * assigner upstream — layout is placement-agnostic); the norm is
    * precomputed into the lake so a probe never re-folds it. One
    * assignment pass + one partitioned write — the index BUILD a real
    * deployment runs once and probes forever. */
  def writeIvfBucketed(embs: DataFrame, cells: Int, path: String,
                       vecCol: String = "embedding",
                       idCol: String = "vec_id"): Unit = {
    val seeds = embs.filter(col(idCol) < cells)
    SimilarityOps.ivfAssign(embs, seeds, vecCol, idCol)
      .select(col("nid"), col("v"), col("nrm"), col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(path)
  }

  /** Top-k probe over the [[writeIvfBucketed]] lake that READS ONLY the
    * probed cells: query cells resolve in memory (queries are the
    * broadcast-small side by the family contract), the distinct probed
    * cell ids — bounded by min(queries, cells) — collect into a LITERAL
    * `isin` filter on the partition column, and Catalyst turns that into
    * static partition pruning: the scan's `PartitionFilters` keeps every
    * unprobed cell's files unopened (PlanSpec pins this). Values are
    * identical to [[SimilarityOps.topKIvf]] (same oracle); only the I/O
    * shape changes — which is the whole point at 100 TB, where a probe
    * of 4 cells of 1024 reads ~0.4 % of the corpus instead of all of it. */
  def ivfLakeTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                  queries: DataFrame, seeds: DataFrame, k: Int,
                  vecCol: String = "embedding",
                  idCol: String = "vec_id"): DataFrame = {
    import graft.functions.GraftFunctions.dot
    import org.apache.spark.sql.expressions.Window
    val q = SimilarityOps.ivfAssign(queries, seeds, vecCol, idCol)
      .select(col("nid").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell").as("qcell"))
      .localCheckpoint()
    val probed = q.select(col("qcell")).distinct().collect()
      .map(_.getLong(0)).toSeq
    val lake = spark.read.parquet(path)
      .filter(col("cell").isin(probed: _*))
    val scored = lake.join(broadcast(q),
        col("cell") === col("qcell") && col("qid") =!= col("nid"))
      .select(col("qid"), col("cell").cast("long").as("cell"), col("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cell"), col("nid"), col("rank"), col("cos"))
  }
}
