package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.ml.MLOps

/** Trained-vs-seeded index evidence (round 11, VERDICT item 1): measures
  * what k-means centroids buy the IVF/PQ family on a real fixture.
  *
  *  1. CELL BALANCE — for each `cells` setting, place the corpus with
  *     smallest-id seeds ([[SimilarityOps.ivfAssign]]) vs trained centroids
  *     ([[MLOps.kmeansCentroidsExact]], T = 1, 2) and report max/mean cell
  *     size. Balance is the variance term of every IVF probe cost model:
  *     a probe pays the SIZE OF THE CELLS IT TOUCHES, so expected probe
  *     cost tracks E[cell²]/E[cell] (size-biased sampling), and max/mean
  *     is the worst-case skew a straggler partition sees at 100 TB.
  *  2. PQ RECALL — recall@10 of the flat ADC scan against exact brute
  *     force, seeded codebook vs trained ([[SimilarityOps
  *     .pqCodebookTrained]]): the codeword-fidelity half of the same
  *     story.
  *
  * Usage: runMain graft.ProbeTrained [sfDir] [cellsCsv] [balance|recall|all]
  */
object ProbeTrained {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("bench-data/sf1")
    val cellsList = (if (args.length > 1) args(1) else "16,64,141")
      .split(',').toSeq.map(_.trim.toInt)
    val which = if (args.length > 2) args(2) else "all"
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
    val embs = Tables.load(spark, dir, "embeddings").localCheckpoint()
    val n = embs.count()
    println(s"[trained] fixture=$dir vectors=$n")

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    if (which == "all" || which == "balance") {
      for (cells <- cellsList) {
        val variants: Seq[(String, () => org.apache.spark.sql.DataFrame, Double)] =
          Seq(("seeded", () => embs.filter(col("vec_id") < cells), 0.0)) ++
          Seq(1, 2).map { t =>
            val (cents, trainS) = timed {
              MLOps.kmeansCentroidsExact(embs, k = cells, iters = t)
                .localCheckpoint()
            }
            (s"trained$t", () => cents, trainS)
          }
        for ((label, seeds, trainS) <- variants) {
          val (stats, assignS) = timed {
            SimilarityOps.ivfAssign(embs, seeds(), "embedding", "vec_id")
              .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
              .agg(max(col("sz")).as("mx"), avg(col("sz")).as("mean"),
                count(lit(1)).as("nonempty"),
                (sum(col("sz") * col("sz")).cast("double") / sum(col("sz")))
                  .as("sizebiased"))
              .head()
          }
          println(f"[balance] cells=$cells variant=$label " +
            f"max=${stats.getLong(0)} mean=${stats.getDouble(1)}%.1f " +
            f"maxmean=${stats.getLong(0) / stats.getDouble(1)}%.2f " +
            f"nonempty=${stats.getLong(2)} " +
            f"probecost=${stats.getDouble(3)}%.1f " +
            f"train=$trainS%.1fs assign=$assignS%.1fs")
        }
      }
    }

    if (which == "all" || which == "recall") {
      val pred = col("vec_id") % 100 === 0
      val bf = SimilarityOps.topKBruteForce(embs, embs.filter(pred), 10)
        .select(col("qid"), col("nid")).localCheckpoint()
      val nExact = bf.count()
      for ((label, cb) <- Seq(
          ("seeded", None),
          ("trained2", Some(SimilarityOps
            .pqCodebookTrained(embs, "embedding", "vec_id", iters = 2))))) {
        val (hits, s) = timed {
          SimilarityOps.pqAdcTopK(embs, 10, pred, codebook = cb)
            .select(col("qid"), col("nid")).join(bf, Seq("qid", "nid"))
            .count()
        }
        println(f"[pq-recall] variant=$label recall@10=" +
          f"${hits.toDouble / nExact}%.4f ($hits/$nExact) wall=$s%.1fs")
      }
    }
    spark.stop()
  }
}
