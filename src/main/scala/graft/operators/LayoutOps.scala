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
}
