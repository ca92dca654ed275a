package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** DESIGN.md evidence probe: knn-graph build cost vs the `bits` knob. */
object ProbeKnnBits {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("bench-data/sf10")
    val bits = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.load(spark, dir, "embeddings")
    embs.write.format("noop").mode("overwrite").save()
    bits.foreach { b =>
      val t0 = System.nanoTime()
      val n = SimilarityOps.knnGraph(embs, k = 3, bits = b).count()
      println(f"[knnbits] dir=$dir bits=$b edges=$n ${(System.nanoTime - t0) / 1e9}%.1f s")
      System.out.flush()
    }
    spark.stop()
  }
}
