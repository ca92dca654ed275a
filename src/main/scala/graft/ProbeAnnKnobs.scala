package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Two focused ANN-knob ladders the round-12 recall work raised:
  *
  *  - `recallm`: recall@3 vs cost of the composed IVF×JL member as the
  *    shortlist width `m` grows — quantifies the scaladoc claim "recall
  *    recovers with m" with the same exact hit-count idiom as the
  *    `sim_recall_*` rows.
  *  - `knnbits`: the k-NN graph's LSH blocking knob — pair volume is
  *    ~n²/2^bits, so `bits` trades build cost against blocking recall
  *    (edges found); the r12 sf10 cell measured 679 s at bits=4, this
  *    ladder fills the 6/8 columns plus the edge/mutual counts that show
  *    what the cheaper blocking loses.
  *
  * Usage: runMain graft.ProbeAnnKnobs <recallm|knnbits> <dir> [csv-knob]
  */
object ProbeAnnKnobs {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val mode = args.headOption.getOrElse("recallm")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.load(spark, dir, "embeddings")
    embs.write.format("noop").mode("overwrite").save()
    val qs = embs.filter(col("vec_id") % 100 === 0)
    mode match {
      case "recallm" =>
        val ms = (if (args.length > 2) args(2) else "10,25,50,100,200")
          .split(",").map(_.trim.toInt).toSeq
        val bf = SimilarityOps.topKBruteForce(embs, qs, 3)
          .select(col("qid"), col("nid")).localCheckpoint()
        for (m <- ms) {
          val t0 = System.nanoTime()
          val approx = SimilarityOps.ivfProjectedTopK(embs, qs, k = 3,
              cells = 16, nprobe = 4, sprobe = 2, m = m)
            .select(col("qid"), col("nid"))
          val rec = SimilarityOps.recallAtK(approx, bf)
            .agg(avg(col("recall_micro"))).collect()(0).getDouble(0) / 1e6
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[recallm] m=$m%-5d recall@3=$rec%.3f wall=$dt%.2fs")
        }
      case "knnbits" =>
        val bits = (if (args.length > 2) args(2) else "4,6,8")
          .split(",").map(_.trim.toInt).toSeq
        for (b <- bits) {
          val t0 = System.nanoTime()
          val g = SimilarityOps.knnGraph(embs, k = 3, bits = b)
            .localCheckpoint()
          val dt = (System.nanoTime() - t0) / 1e9
          val edges = g.count()
          val mutual = g.filter(col("mutual")).count()
          println(f"[knnbits] bits=$b%-3d build=$dt%.1fs edges=$edges mutual=$mutual")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
