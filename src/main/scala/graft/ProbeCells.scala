package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main behind DESIGN.md's SemDeDup `cells` sizing
  * table: times [[graft.operators.DedupOps.semanticDedup]] end-to-end at
  * several cell counts over one fixture and reports the candidate volume
  * (Σ m_c·(m_c−1)/2 within-cell pairs — the published SemDeDup trade) next
  * to wall-clock and the resulting dup count.
  *
  * Usage: runMain graft.ProbeCells [sfDir] [cells,cells,...]
  */
object ProbeCells {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("bench-data/sf1")
    val cellsList =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(16, 45, 141)
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
    embs.write.format("noop").mode("overwrite").save() // page-cache warmup
    val n = embs.count()
    println(f"| cells | candidates (Σ m²/2) | max cell | sec (best of 2) | dups |")
    println("|---|---|---|---|---|")
    cellsList.foreach { cells =>
      val seeds = embs.orderBy(col("vec_id")).limit(cells)
      val sizes = graft.operators.SimilarityOps
        .ivfAssign(embs, seeds, "embedding", "vec_id")
        .groupBy(col("cell")).count()
        .agg(sum(col("count") * (col("count") - 1) / 2).as("cand"),
          max(col("count")).as("mx"))
        .collect()(0)
      def onePass(): (Double, Long) = {
        val t0 = System.nanoTime()
        val d = graft.operators.DedupOps.semanticDedup(embs, cells = cells)
          .filter(col("dup")).count()
        ((System.nanoTime() - t0) / 1e9, d)
      }
      val (t1, d1) = onePass(); val (t2, d2) = onePass()
      require(d1 == d2, s"dup count unstable across passes: $d1 vs $d2")
      println(f"| $cells | ${sizes.getDouble(0).toLong} | ${sizes.getLong(1)} " +
        f"| ${math.min(t1, t2)}%.2f | $d1 |")
    }
    println(s"n = $n vectors in $dir; sqrt(n) ≈ ${math.sqrt(n.toDouble).toInt}")
    spark.stop()
  }
}
