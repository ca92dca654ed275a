package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main behind DESIGN.md's SemDeDup `cells` sizing
  * tables: times [[graft.operators.DedupOps.semanticDedup]] (exact
  * O(n·cells·d) assigner) AND [[graft.operators.DedupOps.semanticDedupPruned]]
  * (two-level assigner, sublinear in cells) end-to-end at several cell
  * counts over one fixture, reporting the within-cell candidate volume
  * (Σ m_c·(m_c−1)/2 — the published SemDeDup trade) next to both
  * wall-clocks and dup counts. The r9 finding this instruments: with the
  * exact assigner the optimum sat below the classic √n rule because assign
  * cost grew linearly in cells; the pruned assigner is the named
  * prerequisite for pushing cells toward √n at 100 TB.
  *
  * Usage: runMain graft.ProbeCells [sfDir] [cells,cells,...] [sprobe]
  */
object ProbeCells {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("bench-data/sf1")
    val cellsList =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(16, 45, 141)
    val sprobe = if (args.length > 2) args(2).toInt else 2
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
    def best2(pass: () => Long): (Double, Long) = {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime()
        val d = pass()
        ((System.nanoTime() - t0) / 1e9, d)
      }
      val (t1, d1) = one(); val (t2, d2) = one()
      require(d1 == d2, s"dup count unstable across passes: $d1 vs $d2")
      (math.min(t1, t2), d1)
    }
    println(s"| cells | candidates (Σ m²/2) | max cell | exact s | dups " +
      s"| pruned s (sprobe=$sprobe) | pruned cand | pruned dups |")
    println("|---|---|---|---|---|---|---|---|")
    cellsList.foreach { cells =>
      val seeds = embs.orderBy(col("vec_id")).limit(cells)
      def volume(assigned: org.apache.spark.sql.DataFrame) = assigned
        .groupBy(col("cell")).count()
        .agg(sum(col("count") * (col("count") - 1) / 2).as("cand"),
          max(col("count")).as("mx"))
        .collect()(0)
      val sizes = volume(graft.operators.SimilarityOps
        .ivfAssign(embs, seeds, "embedding", "vec_id"))
      val sizesP = volume(graft.operators.SimilarityOps
        .ivfAssignPruned(embs, seeds, sprobe, "embedding", "vec_id"))
      val (te, de) = best2(() => graft.operators.DedupOps
        .semanticDedup(embs, cells = cells).filter(col("dup")).count())
      val (tp, dp) = best2(() => graft.operators.DedupOps
        .semanticDedupPruned(embs, cells = cells, sprobe = sprobe)
        .filter(col("dup")).count())
      println(f"| $cells | ${sizes.getDouble(0).toLong} | ${sizes.getLong(1)} " +
        f"| $te%.2f | $de | $tp%.2f | ${sizesP.getDouble(0).toLong} | $dp |")
    }
    println(s"n = $n vectors in $dir; sqrt(n) ≈ ${math.sqrt(n.toDouble).toInt}")
    spark.stop()
  }
}
