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
    if (args.length > 1 && args(1) == "emb") {
      // the LSH-bits scale knob: candidate volume per band ≈ n²/2^bits, so
      // a 10× corpus wants bits+3..4 to keep bucket occupancy (and per-task
      // work) constant — this probe measures exactly that trade
      val embs = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      import graft.operators.SimilarityOps
      time("band_projection_8x8_periqdot")(embs.select(col("vec_id"),
        posexplode(array((0 until 8).map(b =>
          SimilarityOps.lshBucketBand(col("embedding"), b, 8)): _*))).count())
      time("band_projection_8x8_native")(embs.select(col("vec_id"),
        posexplode(SimilarityOps.lshBandBucketsAll(col("embedding"), 8, 8))).count())
      time("single_bucket")(embs.select(col("vec_id"),
        SimilarityOps.lshBucket(col("embedding"))).count())
      for (bits <- Seq(8, 10, 12)) {
        time(s"emb_pairs_bits$bits")(
          DedupOps.embeddingCosinePairs(embs, minCos = 0.9, bits = bits).count())
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "tfidf") {
      import graft.operators.SimilarityOps
      // attribute the tfidf-weights stage build: shuffle-partition sizing
      // (pinned 8 vs session 16) × df-cap selectivity (18% vs an sf1-
      // equivalent 1.8% — the GenScale disjoint-vocab replication divides
      // every token's df% by the copy count, so the default cap prunes 10×
      // less there than on a distribution-invariant real corpus)
      for (parts <- Seq(8, 16); cap <- Seq(18, 2)) {
        time(s"tfidf_weights_p${parts}_cap$cap")(
          graft.operators.PartitionOps.withShufflePartitions(spark, parts) {
            SimilarityOps.tfidfWeights(docs, maxDfPct = cap).count()
          })
      }
      spark.stop(); return
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
