package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** DESIGN.md evidence probe: knn-graph build cost vs the `bits` knob, plus
  * a SAMPLED exact-3NN agreement anchor (r12 verdict item 1): ~200 query
  * vectors get their exact brute-force top-3 (one 200×n scan — the
  * affordable slice of the all-pairs baseline the full build never pays),
  * and each bits setting reports what fraction of those exact edges its
  * bucket-bounded graph reproduced — a direct recall figure under the
  * ±1 % mutual-edge proxy. `bits=0` rows exercise the derived default. */
object ProbeKnnBits {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("bench-data/sf10")
    // entries: "<bits>" (single band) or "<bits>x<bands>" (OR-amplified)
    val grid: Seq[(Int, Int)] =
      (if (args.length > 1) args(1).split(",").toSeq else Seq("8")).map { e =>
        e.split("x") match {
          case Array(b) => (b.trim.toInt, 1)
          case Array(b, nb) => (b.trim.toInt, nb.trim.toInt)
          case _ => sys.error(s"bad grid entry $e")
        }
      }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.load(spark, dir, "embeddings")
    embs.write.format("noop").mode("overwrite").save()
    val n = embs.count()
    // ~200 sampled queries; their exact top-3 is the shared ground truth
    val qmod = math.max(1L, n / 200L)
    val q = embs.filter(pmod(col("vec_id"), lit(qmod)) === 0)
    val bf = SimilarityOps.topKBruteForce(embs, q, 3)
      .select(col("qid"), col("nid")).localCheckpoint()
    val nq = bf.select(col("qid")).distinct().count()
    println(s"[knnrecall] dir=$dir n=$n sampled_queries=$nq qmod=$qmod")
    // unpersist only what each iteration checkpointed — the shared bf
    // ground truth must survive across the bits loop
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    grid.foreach { case (b, nb) =>
      val t0 = System.nanoTime()
      val g = SimilarityOps.knnGraph(embs, k = 3, bits = b, bands = nb)
        .select(col("src").as("qid"), col("dst").as("nid"))
        .localCheckpoint()
      val edges = g.count()
      val dt = (System.nanoTime - t0) / 1e9
      val hits = bf.join(g, Seq("qid", "nid")).count()
      println(f"[knnbits] dir=$dir bits=$b bands=$nb edges=$edges $dt%.1f s " +
        f"exact3nn_agree=${hits.toDouble / (3.0 * nq)}%.3f " +
        f"(hits=$hits of ${3 * nq})")
      System.out.flush()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
