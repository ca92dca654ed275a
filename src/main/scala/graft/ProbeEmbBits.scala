package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main behind DESIGN.md's embedding-LSH `bits`
  * scaling table: times [[graft.operators.DedupOps.embeddingCosinePairs]]
  * at several hyperplane counts over one fixture. The knob law under test
  * (stated in the operator's scaladoc since r8): within-bucket candidate
  * volume is Σ m_b² ≈ n²/2^bits per band, so constant bucket occupancy —
  * and linear total work — needs bits ∝ log₂(n); a 10× corpus wants
  * bits+3..4, and running a 10× corpus at the FIXTURE's bits is the
  * documented pathology, not a plan regression.
  *
  * Usage: runMain graft.ProbeEmbBits [sfDir] [bits,bits,...]
  */
object ProbeEmbBits {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("bench-data/sf10")
    val bitsList =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(11, 12)
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
      .select(col("vec_id"), col("embedding"))
    embs.write.format("noop").mode("overwrite").save()
    val n = embs.count()
    println("| bits | pairs (minCos=0.9) | sec (best of 2) |")
    println("|---|---|---|")
    bitsList.foreach { bits =>
      def onePass(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = graft.operators.DedupOps
          .embeddingCosinePairs(embs, minCos = 0.9, bits = bits).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (t1, c1) = onePass(); val (t2, c2) = onePass()
      require(c1 == c2, s"pair count unstable: $c1 vs $c2")
      println(f"| $bits | $c1 | ${math.min(t1, t2)}%.2f |")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println(s"n = $n vectors in $dir")
    spark.stop()
  }
}
