package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.functions.GraftFunctions._

object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    time("tokens")(docs.select(explode(tokens(col("text")))).count())
    time("shingles")(docs.select(explode(shingles(tokens(col("text")), 3))).count())
    time("shingle_hash")(docs.select(explode(transform(
      array_distinct(shingles(tokens(col("text")), 3)),
      s => stableHash(s)))).count())
    time("sig")(docs.select(DedupOps.minhashSignature(col("text")).as("sig")).count())
    val sigs = docs.select(col("doc_id").as("id"),
      DedupOps.minhashSignature(col("text")).as("sig")).repartition(col("id"))
    time("bands")(sigs.select(col("id"),
      posexplode(DedupOps.bandSignatures(col("sig"))).as(Seq("band","bsig"))).count())
    time("full_pairs")(DedupOps.minhashLshPairs(docs).count())
    spark.stop()
  }
}
