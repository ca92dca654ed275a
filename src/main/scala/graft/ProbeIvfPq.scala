package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main behind DESIGN.md's IVF-PQ sizing table: times
  * [[graft.operators.SimilarityOps.ivfPqTopK]] at several (cells, nprobe)
  * points over one fixture, next to the flat-ADC baseline shape
  * ([[graft.operators.SimilarityOps.pqAdcTopK]] = the cells→1 degenerate).
  * The knob law this instruments is the same one the SemDeDup tables
  * measured for the dedup side: candidates/query = nprobe·n/cells, so at a
  * 10× corpus the index must grow cells (∝ √n) rather than scan harder —
  * the oracle row's fixture knobs (16/4) are correctness pins, not the
  * production sizing.
  *
  * Usage: runMain graft.ProbeIvfPq [sfDir] [cells:nprobe,...] [k]
  */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("bench-data/sf10")
    val points =
      if (args.length > 1) args(1).split(",").toSeq.map { s =>
        val Array(c, p) = s.split(":"); (c.trim.toInt, p.trim.toInt)
      }
      else Seq((16, 4), (141, 8), (450, 12), (1414, 24))
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = Tables.load(spark, dir, "embeddings")
    val n = embs.count()
    println(s"[ivfpq] fixture=$dir n=$n k=$k")
    points.foreach { case (cells, nprobe) =>
      def pass(sprobe: Option[Int]): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = graft.operators.SimilarityOps
          .ivfPqTopK(embs, k, cells, nprobe, col("vec_id") % 100 === 0,
            assignSprobe = sprobe)
          .count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      Seq(None, Some(2)).foreach { sp =>
        val (t1, rows) = pass(sp)
        val (t2, _) = pass(sp)
        val tag = sp.map(s => s"pruned(sprobe=$s)").getOrElse("exact")
        println(f"[ivfpq] cells=$cells nprobe=$nprobe assign=$tag sec=${math.min(t1, t2)}%.1f rows=$rows cand_per_q~${nprobe.toLong * n / cells}")
      }
    }
    spark.stop()
  }
}
