package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{DedupOps, PartitionOps}

/** Dev tool: time the dedup one-time stage chain (shingles → minhash sigs →
  * lsh pairs) at a given shuffle-partition count — the bench's stage_sec is
  * dominated by this chain, and its builds' parallelism is a tuning knob
  * independent of the (small) consumer-side shuffles.
  * Usage: runMain graft.ProbeStageChain [sfDir] [partitions] [reps]
  */
object ProbeStageChain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val parts = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[chain] $name parts=$parts ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (r <- 1 to reps) {
      val base = graft.sources.StagingFs.newStageDir(spark, s"probe-chain-$r")
      PartitionOps.withShufflePartitions(spark, parts) {
        time(s"rep$r shingles") {
          DedupOps.shingleHashSet(docs)
            .write.mode("overwrite").parquet(base + "/shingles")
        }
        val sh = spark.read.parquet(base + "/shingles")
        time(s"rep$r sigs") {
          DedupOps.minhashSignaturesFromHashes(sh)
            .write.mode("overwrite").parquet(base + "/sigs")
        }
        val sigs = spark.read.parquet(base + "/sigs")
        time(s"rep$r pairs") {
          DedupOps.minhashLshPairs(docs, precomputedSigs = Some(sigs))
            .write.mode("overwrite").parquet(base + "/pairs")
        }
      }
    }
    spark.stop()
  }
}
